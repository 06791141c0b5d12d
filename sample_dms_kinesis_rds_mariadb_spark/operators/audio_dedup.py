"""Perceptual AUDIO dedup — Haitsma-Kalker-style binary spectral
fingerprints over the repo's REAL audio decoders, completing the
multimodal near-dup triad (text: ``operators/dedup.py``; image/video:
``operators/image_dedup.py``).

The fingerprint (Haitsma & Kalker, "A Highly Robust Audio Fingerprinting
System", ISMIR 2002): frame the mono signal (Hann window, overlapping),
take per-frame energies in log-spaced frequency bands, and emit one bit
per adjacent band pair from the SIGN of the time-and-frequency second
difference —

    bit(n, m) = [ (E(n,m) − E(n,m+1)) − (E(n−1,m) − E(n−1,m+1)) > 0 ]

33 bands → 32 bits per frame. Sign bits survive level changes, lossy
transcoding and mild filtering; a re-encoded or format-converted copy
matches frame-for-frame at small hamming distance, while unrelated audio
is ~16/32 bits away.

Decoding reuses the real paths: WAV PCM/float/G.711/IMA-ADPCM
(``operators/multimodal.py``) and FLAC (``operators/flac.py``) — a
LOSSLESS format change (WAV↔FLAC of the same samples) produces
bit-identical fingerprints, which the tests assert.

Scale shape: fingerprinting is one Arrow ``mapInPandas`` pass (the
binary column never shuffles; only (media_id, frame_no, int32-fp) rows
leave the scan); near-dup matching is the shared
``image_dedup.sequence_near_pairs`` engine — pigeonhole-banded
candidates, exact hamming verify, temporal-alignment aggregation, never
all-pairs. Time resolution is the hop size: copies shifted by hop
multiples align exactly (the alignment offset); sub-hop shifts degrade
gracefully (documented granularity, as in the published system where
robustness comes from dense overlap).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sample_dms_kinesis_rds_mariadb_spark.operators.image_dedup import (
    sequence_near_pairs,
)

N_BANDS = 33  # 33 band energies -> 32 sign bits per frame


def mono_samples(content: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, mono float64 signal) through the REAL decoders —
    the shared :func:`multimodal.decode_audio_samples` dispatch (WAV PCM
    8/16/24/32, IEEE float32, G.711 A-law/µ-law, IMA ADPCM, FLAC), with
    multi-channel audio averaged to mono (the fingerprint's standard
    front end)."""
    from sample_dms_kinesis_rds_mariadb_spark.operators.multimodal import (
        decode_audio_samples,
    )

    rate, ch, sig = decode_audio_samples(content)
    if ch > 1:
        n = (len(sig) // ch) * ch
        sig = sig[:n].reshape(-1, ch).mean(axis=1)
    return rate, sig


def _band_edges(rate: int, n_fft: int, n_bands: int = N_BANDS) -> np.ndarray:
    """Log-spaced band edges (bin indices) between 300 Hz and
    min(3000, rate/2·0.9) Hz — the published system's perceptually
    relevant range; deterministic from (rate, n_fft) alone."""
    f_lo = 300.0
    f_hi = min(3000.0, 0.45 * rate)
    if f_hi <= f_lo:
        raise ValueError(f"sample rate {rate} too low for the 300 Hz floor")
    edges_hz = np.exp(
        np.linspace(np.log(f_lo), np.log(f_hi), n_bands + 1)
    )
    bins = np.round(edges_hz * n_fft / rate).astype(np.int64)
    # strictly increasing: every band keeps at least one bin
    for i in range(1, len(bins)):
        if bins[i] <= bins[i - 1]:
            bins[i] = bins[i - 1] + 1
    return bins


def audio_fingerprint_frames(
    samples: np.ndarray,
    rate: int,
    frame: int = 2048,
    hop: int = 1024,
    n_bands: int = N_BANDS,
) -> list[int]:
    """Per-frame 32-bit sub-fingerprints of a mono signal — the pure
    function shared by the executor pass and the test reference. Frame
    ``k``'s bits compare band-energy differences against frame ``k−1``,
    so the first window emits nothing; signals shorter than two frames
    fingerprint to []."""
    sig = np.asarray(samples, dtype=np.float64)
    if len(sig) < frame + hop:
        return []
    window = np.hanning(frame)
    edges = _band_edges(rate, frame, n_bands)
    n_frames = 1 + (len(sig) - frame) // hop
    energies = np.empty((n_frames, n_bands), dtype=np.float64)
    for k in range(n_frames):
        seg = sig[k * hop : k * hop + frame] * window
        mag2 = np.abs(np.fft.rfft(seg)) ** 2
        for m in range(n_bands):
            energies[k, m] = float(mag2[edges[m] : edges[m + 1]].sum())
    out: list[int] = []
    for k in range(1, n_frames):
        d_now = energies[k, :-1] - energies[k, 1:]
        d_prev = energies[k - 1, :-1] - energies[k - 1, 1:]
        bits = d_now - d_prev > 0
        v = 0
        for m, on in enumerate(bits):
            if on:
                v |= 1 << m
        out.append(v)
    return out


AUDIO_FP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("afp", T.LongType()),
    ]
)


def audio_fingerprints(
    df: DataFrame, frame: int = 2048, hop: int = 1024
) -> DataFrame:
    """(media_id, frame_no, afp) via one Arrow ``mapInPandas`` pass —
    real decode + spectral fingerprint per payload, partition-parallel,
    the binary column never shuffles."""

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(content) if content is not None else b""
                rate, sig = mono_samples(blob)
                for i, v in enumerate(
                    audio_fingerprint_frames(sig, rate, frame, hop)
                ):
                    rows.append(
                        {"media_id": media_id, "frame_no": i, "afp": v}
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FP_SCHEMA.fields]
            )

    return df.select("media_id", "content").mapInPandas(
        _fp, schema=AUDIO_FP_SCHEMA
    )


def audio_near_pairs(
    df: DataFrame,
    frame: int = 2048,
    hop: int = 1024,
    max_hamming: int = 6,
    bands: int | None = None,
    min_frac: float = 0.5,
    materialize: bool = True,
) -> DataFrame:
    """Near-duplicate AUDIO pairs: re-encoded / transcoded / trimmed
    copies match frame-for-frame along one temporal alignment. Same
    output contract as ``image_dedup.video_near_pairs`` — the matching
    engine is the shared :func:`image_dedup.sequence_near_pairs` over
    the 32-bit sub-fingerprints."""
    from sample_dms_kinesis_rds_mariadb_spark.operators.dedup import _pin

    fps = _pin(audio_fingerprints(df, frame=frame, hop=hop), materialize)
    return sequence_near_pairs(
        fps, "afp", fp_bits=32,
        max_hamming=max_hamming, bands=bands, min_frac=min_frac,
    )
