"""INDEPENDENT spec-derived MPEG-1 Layer III encoder — the adversarial
fixture writer for ``operators/mp3_layer3.py`` (the established
independent-writer pattern: ``flac_writer``, ``jpeg_writer``,
``binlog_writer``). No code is shared with the decoder beyond the
published constant tables it encodes AGAINST (the Huffman code tables
and the PQMF prototype parameters — the bitstream contract itself); the
analysis filterbank, MDCT, quantizer, and bit packer are written here
from the spec equations in encoder direction.

Scope: MPEG-1 Layer III, long blocks (block_type 0), short blocks
(non-mixed or mixed), mono / LR / MS / intensity ("is", "ms_is";
long- or short-block) stereo,
CBR 320 kbps, no bit reservoir (main_data_begin = 0), scalefac_scale=1
with per-band scalefactors chosen so every quantized line fits Huffman
table 10 (|ix| <= 7). That is a VALID Layer III bitstream exercising
side info, scalefactors, big-values Huffman coding, requantization,
alias butterflies, IMDCT overlap-add, and the polyphase synthesis."""

from __future__ import annotations

import numpy as np

from sample_dms_kinesis_rds_mariadb_spark.operators.mp3_layer3 import (
    HUFF_BIG,
    SFB_LONG,
    SLEN1,
    SLEN2,
    pqmf_prototype,
)

_TABLE = 10
_SCALEFAC_COMPRESS = 15  # slen1=4 (sfb 0-10), slen2=3 (sfb 11-20)


class BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def to_bytes(self, pad_to: int | None = None) -> bytes:
        bits = list(self.bits)
        while len(bits) % 8:
            bits.append(0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | bits[i + j]
            out.append(b)
        if pad_to is not None:
            if len(out) > pad_to:
                raise ValueError(f"bitstream overflow: {len(out)} > {pad_to}")
            out.extend(b"\x00" * (pad_to - len(out)))
        return bytes(out)


# --- analysis filterbank (encoder direction of the shared prototype) -------

_P = pqmf_prototype()
_N512 = np.arange(512)
_K32 = np.arange(32).reshape(-1, 1)
_TH = ((-1.0) ** _K32) * np.pi / 4
_H_ANA = 2 * _P * np.cos(np.pi / 32 * (_K32 + 0.5) * (_N512 - 255.5) + _TH)


def analyze_subbands(x: np.ndarray) -> np.ndarray:
    """(n_steps, 32) critically-sampled subband signal of PCM x."""
    x = np.concatenate([np.zeros(511), np.asarray(x, dtype=np.float64)])
    n_steps = (len(x) - 512) // 32 + 1
    S = np.empty((n_steps, 32))
    for t in range(n_steps):
        S[t] = _H_ANA @ x[32 * t : 32 * t + 512][::-1]
    return S


# --- forward MDCT (granule windowing, encoder direction) --------------------

_C36 = np.cos(
    np.pi / 72 * (2 * np.arange(36).reshape(-1, 1) + 1 + 18)
    * (2 * np.arange(18) + 1)
)
_WLONG = np.sin(np.pi / 36 * (np.arange(36) + 0.5))


def _mdct_scale() -> float:
    """Calibrate the forward-MDCT scale so decoder IMDCT + sine-window
    overlap-add reconstructs the subband stream with unit gain (the TDAC
    constant of this cosine convention, measured not assumed)."""
    rng = np.random.default_rng(7)
    z = rng.normal(size=18 * 40)
    spec = []
    prev = np.zeros(18)
    for g in range(40):
        cur = z[18 * g : 18 * g + 18]
        y = np.concatenate([prev, cur]) * _WLONG
        spec.append(_C36.T @ y)
        prev = cur
    rec = np.zeros(18 * 41)
    ov = np.zeros(18)
    for g in range(40):
        x = (_C36 @ spec[g]) * _WLONG
        rec[18 * g : 18 * g + 18] = x[:18] + ov
        ov = x[18:]
    a = z[18 * 2 : 18 * 38]
    b = rec[18 * 3 : 18 * 39]  # one-granule TDAC delay
    return float((a @ b) / (a @ a))


_MDCT_GAIN = _mdct_scale()


def _alias_encode(spec: np.ndarray, borders: int = 31) -> np.ndarray:
    """Encoder-side (inverse) anti-alias butterflies — independently
    written from the butterfly matrix inverse. ``borders=1`` for mixed
    blocks (ISO applies them to the long border only)."""
    ci = np.array([-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142,
                   -0.0037])
    cs = 1.0 / np.sqrt(1.0 + ci * ci)
    ca = ci / np.sqrt(1.0 + ci * ci)
    out = spec.copy()
    for sb in range(1, 1 + borders):
        lo = 18 * sb
        for i in range(8):
            a = out[lo - 1 - i]
            b = out[lo + i]
            out[lo - 1 - i] = a * cs[i] + b * ca[i]
            out[lo + i] = b * cs[i] - a * ca[i]
    return out


_C12 = np.cos(
    np.pi / 24 * (2 * np.arange(12).reshape(-1, 1) + 1 + 6)
    * (2 * np.arange(6) + 1)
)
_WSHORT = np.sin(np.pi / 12 * (np.arange(12) + 0.5))


def _mdct12_scale() -> float:
    """TDAC constant of the 12-point short-window chain (50%-overlap
    windows at offsets 6/12/18 within each 36-frame) — measured."""
    rng = np.random.default_rng(8)
    z = rng.normal(size=12 * 60)
    # continuous chain of 12-sample sine-windowed MDCTs every 6 samples
    spec = []
    for s in range(0, len(z) - 12, 6):
        spec.append(_C12.T @ (z[s : s + 12] * _WSHORT))
    rec = np.zeros(len(z) + 12)
    for i, X in enumerate(spec):
        rec[6 * i : 6 * i + 12] += (_C12 @ X) * _WSHORT
    a = z[60:300]
    b = rec[60:300]
    return float((a @ b) / (a @ a))


_MDCT12_GAIN = _mdct12_scale()


def _granule_zs(S: np.ndarray, g: int) -> np.ndarray:
    """(32, 36) windowed-input frame of granule g: subband steps
    [18g-18, 18g+18) (zero history at stream start), frequency inversion
    applied on odd subbands."""
    n_steps = S.shape[0]
    zs = np.zeros((32, 36))
    lo = 18 * (g - 1)
    for i in range(36):
        t = lo + i
        if 0 <= t < n_steps:
            zs[:, i] = S[t]
    zs[1::2, 1::2] *= -1.0  # odd subbands, odd samples (18 | granule)
    return zs


def _granule_spectrum(S: np.ndarray, g: int) -> np.ndarray:
    """576 LONG-block spectral lines of granule g, encoder order:
    freq-inversion → windowed MDCT per subband → inverse alias
    butterflies."""
    zs = _granule_zs(S, g)
    spec = np.empty(576)
    for sb in range(32):
        spec[18 * sb : 18 * sb + 18] = (
            _C36.T @ (zs[sb] * _WLONG)
        ) / _MDCT_GAIN
    return _alias_encode(spec)


def _granule_spectrum_short(
    S: np.ndarray, g: int, sample_rate: int
) -> np.ndarray:
    """576 SHORT-block (block_type 2, non-mixed) spectral lines of
    granule g in HUFFMAN order (sfb-major, each sfb's 3 windows
    contiguous — the order the decoder's requantize consumes before
    reorder_short). Three 12-point sine-windowed MDCTs per subband at
    offsets 6/12/18 of the 36-frame; no alias butterflies (the decoder
    skips them for short blocks)."""
    from sample_dms_kinesis_rds_mariadb_spark.operators.mp3_layer3 import (
        SFB_SHORT,
    )

    zs = _granule_zs(S, g)
    xw = np.zeros((3, 192))  # per-window spectra, line = 6*sb + k
    for sb in range(32):
        for w in range(3):
            seg = zs[sb, 6 + 6 * w : 18 + 6 * w] * _WSHORT
            xw[w, 6 * sb : 6 * sb + 6] = (_C12.T @ seg) / _MDCT12_GAIN
    sfbs = SFB_SHORT[sample_rate]
    spec = np.zeros(576)
    for sfb in range(13):  # band 12 = the unscaled tail (lines 408-575)
        lo, hi = sfbs[sfb], sfbs[sfb + 1]
        width = hi - lo
        for w in range(3):
            spec[3 * lo + w * width : 3 * lo + (w + 1) * width] = (
                xw[w, lo:hi]
            )
    return spec


def _granule_spectrum_mixed(
    S: np.ndarray, g: int, sample_rate: int
) -> np.ndarray:
    """576 MIXED-block spectral lines of granule g in Huffman order:
    subbands 0-1 carry sine-windowed 36-point MDCTs (the long region,
    lines 0-35 = long sfbs 0-7), subbands 2-31 carry three 12-point
    MDCTs each, placed sfb-major/window-contiguous from short sfb 3.
    The inverse alias butterfly applies to the long border only
    (``borders=1``) — the encoder direction of the decoder's
    mixed-block alias rule."""
    from sample_dms_kinesis_rds_mariadb_spark.operators.mp3_layer3 import (
        SFB_SHORT,
    )

    zs = _granule_zs(S, g)
    spec = np.zeros(576)
    for sb in (0, 1):
        spec[18 * sb : 18 * sb + 18] = (
            _C36.T @ (zs[sb] * _WLONG)
        ) / _MDCT_GAIN
    xw = np.zeros((3, 192))
    for sb in range(2, 32):
        for w in range(3):
            seg = zs[sb, 6 + 6 * w : 18 + 6 * w] * _WSHORT
            xw[w, 6 * sb : 6 * sb + 6] = (_C12.T @ seg) / _MDCT12_GAIN
    sfbs = SFB_SHORT[sample_rate]
    for sfb in range(3, 13):
        lo, hi = sfbs[sfb], sfbs[sfb + 1]
        width = hi - lo
        for w in range(3):
            spec[3 * lo + w * width : 3 * lo + (w + 1) * width] = xw[w, lo:hi]
    return _alias_encode(spec, borders=1)


# --- quantization + Huffman -------------------------------------------------


def _quantize(spec: np.ndarray, sample_rate: int):
    """(ix, global_gain, scalefacs): per-band scalefactors maximize
    resolution under |ix| <= 7 (table 10), scalefac_scale=1 so the band
    factor is 2^-sf."""
    sfbl = SFB_LONG[sample_rate]
    peak = float(np.max(np.abs(spec)))
    if peak == 0.0:
        return np.zeros(576, dtype=np.int64), 210, [0] * 21
    limit = 7.0 ** (4.0 / 3.0) * 0.999  # |xr|/step must stay under this
    gg = 210 + int(np.ceil(4 * np.log2(peak / limit)))
    gg = min(max(gg, 0), 255)
    g_step = 2.0 ** (0.25 * (gg - 210))
    scalefacs = []
    ix = np.zeros(576, dtype=np.int64)
    for sfb in range(21):
        lo, hi = sfbl[sfb], sfbl[sfb + 1]
        band = spec[lo:hi]
        bpeak = float(np.max(np.abs(band)))
        sf_max = 15 if sfb <= 10 else 7
        sf = 0
        # noise gate: only spend scalefactor resolution on bands within
        # 54 dB of the global peak — boosting the noise floor to the
        # quantizer's full scale would code every line nonzero and blow
        # the CBR frame budget (real encoders' rate loop, simplified)
        if bpeak > 0 and bpeak >= peak * 2.0 ** -9:
            sf = int(np.floor(np.log2(limit * g_step / bpeak)))
            sf = min(max(sf, 0), sf_max)
        scalefacs.append(sf)
        t = np.abs(band) * (2.0 ** sf) / g_step
        q = np.minimum(np.round(t ** 0.75), 7).astype(np.int64)
        ix[lo:hi] = q * np.sign(band).astype(np.int64)
    # lines beyond the last scalefactor band quantize with the global
    # step only; keep them zero (tonal fixtures put no energy there)
    ix[sfbl[21]:] = 0
    return ix, gg, scalefacs


def _quantize_short(spec: np.ndarray, sample_rate: int, first_sfb: int = 0):
    """(ix, global_gain, scalefacs[12][3]) over Huffman-order short-block
    lines — per-(sfb, window) scalefactors under |ix| <= 7. Band 12
    (the tail above the last scalefactor band) has no scalefactor and
    quantizes at the global step alone — the decoder requantizes it the
    same way. ``first_sfb=3`` restricts to the short region of a mixed
    block."""
    from sample_dms_kinesis_rds_mariadb_spark.operators.mp3_layer3 import (
        SFB_SHORT,
    )

    sfbs = SFB_SHORT[sample_rate]
    peak = float(np.max(np.abs(spec)))
    if peak == 0.0:
        return np.zeros(576, dtype=np.int64), 210, [[0] * 3 for _ in range(12)]
    limit = 7.0 ** (4.0 / 3.0) * 0.999
    gg = 210 + int(np.ceil(4 * np.log2(peak / limit)))
    gg = min(max(gg, 0), 255)
    g_step = 2.0 ** (0.25 * (gg - 210))
    ix = np.zeros(576, dtype=np.int64)
    sfs = [[0] * 3 for _ in range(12)]
    for sfb in range(first_sfb, 13):
        lo, hi = sfbs[sfb], sfbs[sfb + 1]
        width = hi - lo
        sf_max = 0 if sfb == 12 else (15 if sfb <= 5 else 7)
        for w in range(3):
            base = 3 * lo + w * width
            band = spec[base : base + width]
            bpeak = float(np.max(np.abs(band)))
            sf = 0
            if bpeak > 0 and bpeak >= peak * 2.0 ** -9:
                sf = int(np.floor(np.log2(limit * g_step / bpeak)))
                sf = min(max(sf, 0), sf_max)
            if sfb < 12:
                sfs[sfb][w] = sf
            t = np.abs(band) * (2.0 ** sf) / g_step
            q = np.minimum(np.round(t ** 0.75), 7).astype(np.int64)
            ix[base : base + width] = q * np.sign(band).astype(np.int64)
    return ix, gg, sfs


def _quantize_mixed(spec: np.ndarray, sample_rate: int):
    """(ix, global_gain, long scalefacs[8], short scalefacs[12][3]) for a
    mixed block: long sfbs 0-7 over lines 0-35, short sfbs 3-12 beyond
    (band 12 unscaled, like _quantize_short)."""
    from sample_dms_kinesis_rds_mariadb_spark.operators.mp3_layer3 import (
        SFB_SHORT,
    )

    sfbl = SFB_LONG[sample_rate]
    sfbs = SFB_SHORT[sample_rate]
    peak = float(np.max(np.abs(spec)))
    if peak == 0.0:
        return (np.zeros(576, dtype=np.int64), 210, [0] * 8,
                [[0] * 3 for _ in range(12)])
    limit = 7.0 ** (4.0 / 3.0) * 0.999
    gg = 210 + int(np.ceil(4 * np.log2(peak / limit)))
    gg = min(max(gg, 0), 255)
    g_step = 2.0 ** (0.25 * (gg - 210))
    ix = np.zeros(576, dtype=np.int64)

    def _band(lo, hi, sf_max):
        band = spec[lo:hi]
        bpeak = float(np.max(np.abs(band)))
        sf = 0
        if bpeak > 0 and bpeak >= peak * 2.0 ** -9:
            sf = int(np.floor(np.log2(limit * g_step / bpeak)))
            sf = min(max(sf, 0), sf_max)
        t = np.abs(band) * (2.0 ** sf) / g_step
        q = np.minimum(np.round(t ** 0.75), 7).astype(np.int64)
        ix[lo:hi] = q * np.sign(band).astype(np.int64)
        return sf

    sfl = [_band(sfbl[sfb], sfbl[sfb + 1], 15) for sfb in range(8)]
    sfs = [[0] * 3 for _ in range(12)]
    for sfb in range(3, 13):
        lo, hi = sfbs[sfb], sfbs[sfb + 1]
        width = hi - lo
        sf_max = 0 if sfb == 12 else (15 if sfb <= 5 else 7)
        for w in range(3):
            base = 3 * lo + w * width
            sf = _band(base, base + width, sf_max)
            if sfb < 12:
                sfs[sfb][w] = sf
    return ix, gg, sfl, sfs


def _huff_encode(bw: BitWriter, ix: np.ndarray, min_lines: int = 0) -> int:
    """Big-values pairs with table 10 for every region; returns
    big_values (pair count). count1 region unused (rzero covers the
    tail). ``min_lines`` forces big_values to cover at least that many
    lines (zero pairs are valid table-10 symbols) — the intensity modes
    use it to pin the right channel's rzero EXACTLY at the intensity
    bound, since the decoder derives the intensity region from it."""
    dim, lens, codes = HUFF_BIG[_TABLE]
    nz = np.nonzero(ix)[0]
    last = int(nz[-1]) if len(nz) else -1
    big_values = max((last + 2) // 2, (min_lines + 1) // 2)
    for p in range(big_values):
        x = int(ix[2 * p])
        y = int(ix[2 * p + 1])
        sym = abs(x) * dim + abs(y)
        bw.write(codes[sym], lens[sym])
        if x:
            bw.write(1 if x < 0 else 0, 1)
        if y:
            bw.write(1 if y < 0 else 0, 1)
    return big_values


def _encode_granule(
    S: np.ndarray, g: int, sample_rate: int, block_type: int = 0,
    mixed: bool = False,
) -> dict:
    bw = BitWriter()
    if block_type == 2 and mixed:
        spec = _granule_spectrum_mixed(S, g, sample_rate)
        ix, gg, sfl, sfs = _quantize_mixed(spec, sample_rate)
        for sfb in range(8):
            bw.write(sfl[sfb], SLEN1[_SCALEFAC_COMPRESS])
        for sfb in range(3, 6):
            for w in range(3):
                bw.write(sfs[sfb][w], SLEN1[_SCALEFAC_COMPRESS])
        for sfb in range(6, 12):
            for w in range(3):
                bw.write(sfs[sfb][w], SLEN2[_SCALEFAC_COMPRESS])
    elif block_type == 2:
        spec = _granule_spectrum_short(S, g, sample_rate)
        ix, gg, sfs = _quantize_short(spec, sample_rate)
        for sfb in range(6):
            for w in range(3):
                bw.write(sfs[sfb][w], SLEN1[_SCALEFAC_COMPRESS])
        for sfb in range(6, 12):
            for w in range(3):
                bw.write(sfs[sfb][w], SLEN2[_SCALEFAC_COMPRESS])
    else:
        spec = _granule_spectrum(S, g)
        ix, gg, sfs = _quantize(spec, sample_rate)
        for sfb in range(11):
            bw.write(sfs[sfb], SLEN1[_SCALEFAC_COMPRESS])
        for sfb in range(11, 21):
            bw.write(sfs[sfb], SLEN2[_SCALEFAC_COMPRESS])
    big_values = _huff_encode(bw, ix)
    return {
        "bits": bw.bits,
        "part2_3_length": len(bw.bits),
        "big_values": big_values,
        "global_gain": gg,
        "block_type": block_type,
        "mixed": int(mixed),
    }


def _encode_granule_is(
    SL: np.ndarray, SR: np.ndarray, g: int, sample_rate: int,
    ms_on: bool, bound_sfb: int, is_pos7_sfb: int | None = None,
) -> list[dict]:
    """Encode one granule of BOTH channels in an intensity-stereo frame
    (long blocks). Works in the ALIASED spectral domain — the alias
    butterflies are linear in the spectrum, so per-band mixing after
    ``_granule_spectrum`` is exactly what the decoder's
    requantize → intensity → alias_reduce chain inverts, and the
    transmitted right channel is EXACTLY zero above the bound (no
    butterfly smear to disturb rzero).

    Below ``bound_sfb``: MS (``ms_on``) or plain L/R. At/above: the
    left channel carries L+R, the right channel's scalefactor field
    carries is_pos = round(atan2(sum|L|, sum|R|) * 12/pi) — exact for a
    constant-panned source (L = tan(is_pos*pi/12) * R). An
    ``is_pos7_sfb`` band (ms_is only) transmits (L+R)/sqrt(2) with
    is_pos=7 — the decoder's MS fallback, faithful for mono content."""
    sfbl = SFB_LONG[sample_rate]
    bound = sfbl[bound_sfb]
    aL = _granule_spectrum(SL, g)
    aR = _granule_spectrum(SR, g)
    sq2 = np.sqrt(2.0)
    ch0 = np.empty(576)
    ch1 = np.zeros(576)
    if ms_on:
        ch0[:bound] = (aL[:bound] + aR[:bound]) / sq2
        ch1[:bound] = (aL[:bound] - aR[:bound]) / sq2
    else:
        ch0[:bound] = aL[:bound]
        ch1[:bound] = aR[:bound]
    is_pos = [7] * 21
    for sfb in range(bound_sfb, 21):
        lo, hi = sfbl[sfb], sfbl[sfb + 1]
        if sfb == is_pos7_sfb:
            if not ms_on:
                raise ValueError("is_pos==7 bands need mode='ms_is'")
            ch0[lo:hi] = (aL[lo:hi] + aR[lo:hi]) / sq2
            continue  # is_pos stays 7 -> decoder MS fallback
        sl = float(np.abs(aL[lo:hi]).sum())
        sr_ = float(np.abs(aR[lo:hi]).sum())
        if sl + sr_ == 0.0:
            is_pos[sfb] = 6  # silent band: direction irrelevant
        else:
            is_pos[sfb] = int(
                np.clip(round(np.arctan2(sl, sr_) * 12.0 / np.pi), 0, 6)
            )
        ch0[lo:hi] = aL[lo:hi] + aR[lo:hi]
    ch0[sfbl[21]:] = 0.0  # tail has no is_pos of its own (reuses sfb 20)
    encs = []
    for c, spec in enumerate((ch0, ch1)):
        ix, gg, sfs = _quantize(spec, sample_rate)
        if c == 1:
            ix[bound:] = 0  # intensity region rides ch0 only
            for sfb in range(bound_sfb, 21):
                sfs[sfb] = is_pos[sfb]
        bw = BitWriter()
        for sfb in range(11):
            bw.write(sfs[sfb], SLEN1[_SCALEFAC_COMPRESS])
        for sfb in range(11, 21):
            bw.write(sfs[sfb], SLEN2[_SCALEFAC_COMPRESS])
        big_values = _huff_encode(
            bw, ix, min_lines=bound if c == 1 else 0
        )
        encs.append({
            "bits": bw.bits,
            "part2_3_length": len(bw.bits),
            "big_values": big_values,
            "global_gain": gg,
            "block_type": 0,
        })
    return encs


def _encode_granule_is_short(
    SL: np.ndarray, SR: np.ndarray, g: int, sample_rate: int,
    ms_on: bool, bound_sfb: int,
) -> list[dict]:
    """Encode one granule of BOTH channels of a SHORT-block (block_type
    2, non-mixed) intensity-stereo frame. The decoder finds the
    intensity bound PER WINDOW from the right channel's zero pattern,
    so after quantization this writer VERIFIES that every window's
    detected bound equals ``bound_sfb`` (a SHORT sfb index — the
    fixture signal must keep band bound_sfb-1 nonzero in all three
    windows) and raises otherwise, keeping the round-trip tests honest.
    At/above the bound the left channel transmits L+R with per-(band,
    window) is_pos in the right channel's scalefactor field; below it
    MS (``ms_on``) or plain L/R. The unscaled tail band 12 carries no
    energy (it has no is_pos of its own)."""
    from sample_dms_kinesis_rds_mariadb_spark.operators.mp3_layer3 import (
        SFB_SHORT,
    )

    sfbs = SFB_SHORT[sample_rate]
    aL = _granule_spectrum_short(SL, g, sample_rate)
    aR = _granule_spectrum_short(SR, g, sample_rate)
    sq2 = np.sqrt(2.0)
    ch0 = np.zeros(576)
    ch1 = np.zeros(576)
    is_pos = [[7] * 3 for _ in range(12)]
    for sfb in range(13):
        lo, hi = sfbs[sfb], sfbs[sfb + 1]
        width = hi - lo
        for w in range(3):
            base = 3 * lo + w * width
            lv = aL[base : base + width]
            rv = aR[base : base + width]
            if sfb >= bound_sfb:
                if sfb == 12:
                    continue  # tail stays silent — no is_pos field
                sl = float(np.abs(lv).sum())
                sr_ = float(np.abs(rv).sum())
                if sl + sr_ == 0.0:
                    is_pos[sfb][w] = 6
                else:
                    is_pos[sfb][w] = int(np.clip(
                        round(np.arctan2(sl, sr_) * 12.0 / np.pi), 0, 6
                    ))
                ch0[base : base + width] = lv + rv
            elif ms_on:
                ch0[base : base + width] = (lv + rv) / sq2
                ch1[base : base + width] = (lv - rv) / sq2
            else:
                ch0[base : base + width] = lv
                ch1[base : base + width] = rv
    encs = []
    ix0 = None
    for c, spec in enumerate((ch0, ch1)):
        ix, gg, sfs = _quantize_short(spec, sample_rate)
        if c == 0:
            ix0 = ix
        else:
            for w in range(3):
                det = 0
                for sfb in range(12, -1, -1):
                    width = sfbs[sfb + 1] - sfbs[sfb]
                    base = 3 * sfbs[sfb] + w * width
                    if np.any(ix[base : base + width] != 0):
                        det = sfb + 1
                        break
                if det == bound_sfb:
                    continue
                # a lower detected bound is harmless iff ch0 is also
                # zero across the gap bands [det, bound): the decoder
                # intensity-decodes zeros to zeros there (e.g. granule
                # 0's leading windows, which cover zero history)
                for sfb in range(det, bound_sfb):
                    width = sfbs[sfb + 1] - sfbs[sfb]
                    base = 3 * sfbs[sfb] + w * width
                    if np.any(ix0[base : base + width] != 0):
                        raise ValueError(
                            f"window {w}: detected intensity bound {det} "
                            f"!= {bound_sfb} with live ch0 content in band "
                            f"{sfb} — fixture signal too sparse below the "
                            "bound"
                        )
            for sfb in range(bound_sfb, 12):
                for w in range(3):
                    sfs[sfb][w] = is_pos[sfb][w]
        bw = BitWriter()
        for sfb in range(6):
            for w in range(3):
                bw.write(sfs[sfb][w], SLEN1[_SCALEFAC_COMPRESS])
        for sfb in range(6, 12):
            for w in range(3):
                bw.write(sfs[sfb][w], SLEN2[_SCALEFAC_COMPRESS])
        big_values = _huff_encode(bw, ix)
        encs.append({
            "bits": bw.bits,
            "part2_3_length": len(bw.bits),
            "big_values": big_values,
            "global_gain": gg,
            "block_type": 2,
            "mixed": 0,
        })
    return encs


# --- Layer I encoder ---------------------------------------------------------

_L1_SF = 2.0 * (2.0 ** (-np.arange(63) / 3.0))


def write_mp1(
    pcm, sample_rate: int = 44100, channels: int = 1, mode: str = "lr",
    nb: int = 12, bound_band: int = 8,
) -> bytes:
    """INDEPENDENT MPEG-1 Layer I encoder (CBR 448): per-subband 4-bit
    allocation (``nb`` sample bits where a subband carries energy, 0
    elsewhere — the noise-gate keeps tonal fixtures inside the frame
    budget), 6-bit scalefactor indices chosen as the smallest table
    level covering the band peak, midtread quantization to 2^nb − 1
    levels (all-ones code never emitted). ``mode='intensity'`` encodes
    joint stereo: above subband ``bound_band`` (4·(ext+1) — must be a
    multiple of 4) allocation and sample codes are shared (ch0's
    fraction; the direction rides the per-channel scalefactor ratio)
    while scalefactors stay per-channel. Raises if a frame's bits
    exceed the CBR budget — fixtures must stay tonal."""
    if mode == "intensity" and (channels != 2 or bound_band % 4):
        raise ValueError("intensity needs stereo and a bound multiple of 4")
    sr_idx = {44100: 0, 48000: 1, 32000: 2}[sample_rate]
    x = np.asarray(pcm, dtype=np.float64) / 32768.0
    chans = [x[0::2], x[1::2]] if channels == 2 else [x]
    subs = [analyze_subbands(c) for c in chans]
    n_frames = -(-subs[0].shape[0] // 12)
    frame_len = (12 * 448000 // sample_rate) * 4  # padding bit 0
    joint = mode == "intensity"
    bound = bound_band if joint else 32
    if channels == 1:
        mode_byte = 0xC0
    elif joint:
        mode_byte = (0b01 << 6) | ((bound_band // 4 - 1) << 4)
    else:
        mode_byte = 0x00
    hdr = bytes([0xFF, 0xFF, (14 << 4) | (sr_idx << 2), mode_byte])
    out = bytearray()
    for f in range(n_frames):
        S = np.zeros((channels, 12, 32))
        for ch in range(channels):
            seg = subs[ch][12 * f : 12 * f + 12]
            S[ch, : seg.shape[0]] = seg
        alloc = np.zeros((channels, 32), dtype=int)
        sfi = np.zeros((channels, 32), dtype=int)
        # budget-aware allocation (the fixture stand-in for a real
        # psychoacoustic bit allocator): activate bands greedily by peak
        # until the CBR frame is full — any allocation is a valid stream
        budget = (frame_len - 4) * 8 - (bound * 4 * channels
                                        + (32 - bound) * 4)
        units = []  # (-peak, members, cost)
        for sb in range(32):
            if joint and sb >= bound:
                p = float(np.max(np.abs(S[:, :, sb])))
                if p > 0.0:
                    units.append((-p, [(ch, sb) for ch in range(channels)],
                                  6 * channels + 12 * nb))
            else:
                for ch in range(channels):
                    p = float(np.max(np.abs(S[ch][:, sb])))
                    if p > 0.0:
                        units.append((-p, [(ch, sb)], 6 + 12 * nb))
        units.sort(key=lambda u: u[0])
        for _p, members, cost in units:
            if budget < cost:
                continue
            budget -= cost
            for ch, sb in members:
                alloc[ch][sb] = nb - 1
                own = float(np.max(np.abs(S[ch][:, sb])))
                idx = int(np.floor(-3.0 * np.log2(max(own, 1e-12) / 2.0)))
                sfi[ch][sb] = min(max(idx, 0), 62)
        bw = BitWriter()
        for sb in range(bound):
            for ch in range(channels):
                bw.write(alloc[ch][sb], 4)
        for sb in range(bound, 32):
            bw.write(alloc[0][sb], 4)
        for sb in range(32):
            for ch in range(channels):
                if alloc[ch][sb]:
                    bw.write(sfi[ch][sb], 6)

        def _q(v, sf, bits):
            c = (1 << bits) / ((1 << bits) - 1.0)
            d = 2.0 ** (1 - bits)
            raw = int(round((v / (sf * c) - d + 1.0) * (1 << (bits - 1))))
            return min(max(raw, 0), (1 << bits) - 2)

        for s in range(12):
            for sb in range(32):
                if sb < bound:
                    for ch in range(channels):
                        if alloc[ch][sb]:
                            bits = alloc[ch][sb] + 1
                            bw.write(
                                _q(S[ch, s, sb], _L1_SF[sfi[ch][sb]], bits),
                                bits,
                            )
                elif alloc[0][sb]:
                    bits = alloc[0][sb] + 1
                    # shared code: ch0's fraction against ch0's
                    # scalefactor — the decoder rebuilds each channel as
                    # frac·sf[ch], so the DIRECTION rides the per-channel
                    # scalefactor ratio (intensity semantics)
                    bw.write(_q(S[0, s, sb], _L1_SF[sfi[0][sb]], bits), bits)
        out += hdr + bw.to_bytes(frame_len - 4)
    return bytes(out)


# --- frame packing ----------------------------------------------------------

_BR_IDX = {320: 14}


def write_mp3(
    pcm, sample_rate: int = 44100, channels: int = 1, mode: str = "lr",
    reservoir_shift: int = 0, block_type: int = 0, mixed: bool = False,
    is_bound_sfb: int = 13, is_pos7_sfb: int | None = None,
) -> bytes:
    """Encode PCM (list/array of samples; interleaved when stereo) as an
    MPEG-1 Layer III CBR-320 stream (long blocks). ``mode='ms'`` encodes
    mid/side (joint stereo, mode_extension MS); ``mode='is'`` /
    ``mode='ms_is'`` encode long-block intensity stereo above scalefactor
    band ``is_bound_sfb`` (mode_extension IS / MS+IS), with an optional
    ``is_pos7_sfb`` band transmitted as the decoder's is_pos==7 MS
    fallback. ``reservoir_shift=k`` exercises the bit reservoir: every
    frame after the first donates its first k main-data bytes into the
    previous frame's padding and sets main_data_begin=k — byte-identical
    main data through the reservoir path. ``block_type=2`` with
    ``mixed=True`` emits mixed blocks; intensity modes with
    ``block_type=2`` emit SHORT-block intensity stereo (``is_bound_sfb``
    is then a SHORT sfb index; ``is_pos7_sfb`` is long-block only)."""
    sr_idx = {44100: 0, 48000: 1, 32000: 2}[sample_rate]
    intensity = mode in ("is", "ms_is")
    if intensity and channels != 2:
        raise ValueError("intensity modes need stereo")
    if intensity and block_type == 2 and (mixed or is_pos7_sfb is not None):
        raise ValueError(
            "short-block intensity supports neither mixed blocks nor "
            "is_pos7_sfb"
        )
    if mixed and block_type != 2:
        raise ValueError("mixed needs block_type=2")
    x = np.asarray(pcm, dtype=np.float64)
    if channels == 2:
        left, right = x[0::2], x[1::2]
        if mode == "ms":
            chans = [(left + right) / np.sqrt(2.0),
                     (left - right) / np.sqrt(2.0)]
        else:
            chans = [left, right]  # is/ms_is mix per band, spectrally
    else:
        chans = [x]
    subs = [analyze_subbands(c) for c in chans]
    n_gran = max(1, -(-subs[0].shape[0] // 18))
    if n_gran % 2:
        n_gran += 1
    frame_len = 144 * 320000 // sample_rate  # padding bit 0
    frames = []
    for f in range(n_gran // 2):
        if intensity and block_type == 2:
            grs = [
                _encode_granule_is_short(
                    subs[0], subs[1], 2 * f + g, sample_rate,
                    mode == "ms_is", is_bound_sfb,
                )
                for g in range(2)
            ]
        elif intensity:
            grs = [
                _encode_granule_is(
                    subs[0], subs[1], 2 * f + g, sample_rate,
                    mode == "ms_is", is_bound_sfb, is_pos7_sfb,
                )
                for g in range(2)
            ]
        else:
            grs = [
                [_encode_granule(subs[c], 2 * f + g, sample_rate,
                                 block_type=block_type, mixed=mixed)
                 for c in range(channels)]
                for g in range(2)
            ]
        if channels == 1:
            mode_byte = 0xC0                       # single channel
        elif mode == "ms":
            mode_byte = (0b01 << 6) | (0b10 << 4)  # joint stereo, MS on
        elif mode == "is":
            mode_byte = (0b01 << 6) | (0b01 << 4)  # joint stereo, IS on
        elif mode == "ms_is":
            mode_byte = (0b01 << 6) | (0b11 << 4)  # joint, MS+IS on
        else:
            mode_byte = 0x00                       # LR stereo
        hdr = bytes([
            0xFF,
            0xFB,  # MPEG-1, Layer III, no CRC
            (_BR_IDX[320] << 4) | (sr_idx << 2),
            mode_byte,
        ])
        si = BitWriter()
        si.write(reservoir_shift if f > 0 else 0, 9)  # main_data_begin
        si.write(0, 5 if channels == 1 else 3)
        for _c in range(channels):
            si.write(0, 4)                   # scfsi
        for g in range(2):
            for c in range(channels):
                e = grs[g][c]
                si.write(e["part2_3_length"], 12)
                si.write(e["big_values"], 9)
                si.write(e["global_gain"], 8)
                si.write(_SCALEFAC_COMPRESS, 4)
                if e["block_type"] == 2:
                    si.write(1, 1)           # window switching
                    si.write(2, 2)           # block_type = short
                    si.write(e.get("mixed", 0), 1)
                    for _r in range(2):
                        si.write(_TABLE, 5)
                    for _w in range(3):
                        si.write(0, 3)       # subblock_gain
                else:
                    si.write(0, 1)           # no window switching
                    for _r in range(3):
                        si.write(_TABLE, 5)
                    si.write(7, 4)           # region0_count
                    si.write(7, 3)           # region1_count
                si.write(0, 1)               # preflag
                si.write(1, 1)               # scalefac_scale
                si.write(0, 1)               # count1table_select
        side = si.to_bytes(17 if channels == 1 else 32)
        main = BitWriter()
        for g in range(2):
            for c in range(channels):
                main.bits.extend(grs[g][c]["bits"])
        used = (len(main.bits) + 7) // 8
        body = main.to_bytes(frame_len - 4 - len(side))
        frames.append([hdr, side, body, used])
    if reservoir_shift:
        k = reservoir_shift
        for f in range(1, len(frames)):
            prev, cur = frames[f - 1], frames[f]
            if prev[3] > len(prev[2]) - k:
                raise ValueError("no padding room for reservoir donation")
            prev[2] = prev[2][: len(prev[2]) - k] + cur[2][:k]
            cur[2] = cur[2][k:] + b"\x00" * k
    return b"".join(h + s + b for h, s, b, _u in frames)


# --- LSF (MPEG-2 / 2.5) Layer III write direction --------------------------

_LSF_SR_IDX = {
    22050: ("2", 0), 24000: ("2", 1), 16000: ("2", 2),
    11025: ("2.5", 0), 12000: ("2.5", 1), 8000: ("2.5", 2),
}
# 9-bit LSF scalefac_compress 399: slens (4,4,3,3) over the (6,5,5,5)
# long / (9,9,9,9) short partitions — bit-identical scalefactor packing
# to the MPEG-1 _SCALEFAC_COMPRESS=15 layout (4 bits through sfb 10 /
# pair 17, 3 bits after), so the granule encoders above are reused
# verbatim; only the frame assembly differs.
_LSF_SFC = 399


def write_mp3_lsf(
    pcm, sample_rate: int = 22050, channels: int = 1, mode: str = "lr",
    block_type: int = 0, reservoir_shift: int = 0,
) -> bytes:
    """Encode PCM as an MPEG-2 / MPEG-2.5 (LSF) Layer III CBR-160
    stream: ONE granule per frame, 9-byte mono / 17-byte stereo side
    info with 8-bit main_data_begin and 9-bit scalefac_compress, no
    scfsi, no preflag bit. ``mode='ms'`` emits mid/side joint stereo;
    ``block_type=2`` emits short blocks; ``reservoir_shift`` exercises
    the LSF bit reservoir exactly like :func:`write_mp3`."""
    version, sr_idx = _LSF_SR_IDX[sample_rate]
    x = np.asarray(pcm, dtype=np.float64)
    if channels == 2:
        left, right = x[0::2], x[1::2]
        if mode == "ms":
            chans = [(left + right) / np.sqrt(2.0),
                     (left - right) / np.sqrt(2.0)]
        else:
            chans = [left, right]
    else:
        chans = [x]
    subs = [analyze_subbands(c) for c in chans]
    n_gran = max(1, -(-subs[0].shape[0] // 18))
    frame_len = 72 * 160000 // sample_rate  # CBR-160, padding bit 0
    hdr2 = 0xE0 | ({"2": 0b10, "2.5": 0b00}[version] << 3) | (0b01 << 1) | 1
    frames = []
    for f in range(n_gran):
        grs = [
            _encode_granule(subs[c], f, sample_rate, block_type=block_type)
            for c in range(channels)
        ]
        if channels == 1:
            mode_byte = 0xC0
        elif mode == "ms":
            mode_byte = (0b01 << 6) | (0b10 << 4)
        else:
            mode_byte = 0x00
        hdr = bytes([0xFF, hdr2, (14 << 4) | (sr_idx << 2), mode_byte])
        si = BitWriter()
        si.write(reservoir_shift if f > 0 else 0, 8)  # main_data_begin
        si.write(0, 1 if channels == 1 else 2)        # private_bits
        for c in range(channels):
            e = grs[c]
            si.write(e["part2_3_length"], 12)
            si.write(e["big_values"], 9)
            si.write(e["global_gain"], 8)
            si.write(_LSF_SFC, 9)
            if e["block_type"] == 2:
                si.write(1, 1)            # window switching
                si.write(2, 2)            # block_type = short
                si.write(0, 1)            # not mixed
                for _r in range(2):
                    si.write(_TABLE, 5)
                for _w in range(3):
                    si.write(0, 3)        # subblock_gain
            else:
                si.write(0, 1)
                for _r in range(3):
                    si.write(_TABLE, 5)
                si.write(7, 4)            # region0_count
                si.write(7, 3)            # region1_count
            # NO preflag bit in LSF side info
            si.write(1, 1)                # scalefac_scale
            si.write(0, 1)                # count1table_select
        side = si.to_bytes(9 if channels == 1 else 17)
        main = BitWriter()
        for c in range(channels):
            main.bits.extend(grs[c]["bits"])
        used = (len(main.bits) + 7) // 8
        body = main.to_bytes(frame_len - 4 - len(side))
        frames.append([hdr, side, body, used])
    if reservoir_shift:
        k = reservoir_shift
        for f in range(1, len(frames)):
            prev, cur = frames[f - 1], frames[f]
            if prev[3] > len(prev[2]) - k:
                raise ValueError("no padding room for reservoir donation")
            prev[2] = prev[2][: len(prev[2]) - k] + cur[2][:k]
            cur[2] = cur[2][k:] + b"\x00" * k
    return b"".join(h + s + b for h, s, b, _u in frames)


# --- Layer II write direction (ISO 11172-3 §2.4.2.4, Tables B.2a-d) --------
# The allocation tables are restated here in WRITE direction (the
# bitstream contract itself, like the Huffman tables above); all
# packing/quantization code is this writer's own.

_W2_A0 = (3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191,
          16383, 32767, 65535)
_W2_A1 = (3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095,
          8191, 65535)
_W2_A2 = (3, 5, 7, 9, 15, 31, 65535)
_W2_A3 = (3, 5, 65535)
_W2_C0 = (5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191,
          16383, 32767)
_W2_C1 = (5, 7, 9, 15, 31, 63, 127)
# LSF (ISO 13818-3 Table B.1), write direction — one table, all rates
_W2_D0 = (3, 5, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191,
          16383, 32767)
_W2_D1 = (3, 5, 9, 15, 31, 63, 127)
_W2_D2 = (3, 5, 9)
_W2_GROUP_BITS = {3: 5, 5: 7, 9: 10}
_W2_NB = {3: 2, 5: 3, 9: 4}
_BR_IDX_L2 = {32: 1, 48: 2, 56: 3, 64: 4, 80: 5, 96: 6, 112: 7,
              128: 8, 160: 9, 192: 10, 224: 11, 256: 12, 320: 13,
              384: 14}
_BR_IDX_L2_LSF = {8: 1, 16: 2, 24: 3, 32: 4, 40: 5, 48: 6, 56: 7,
                  64: 8, 80: 9, 96: 10, 112: 11, 128: 12, 144: 13,
                  160: 14}


def _w2_layout(sample_rate: int, bitrate: int, channels: int,
               lsf: bool = False):
    if lsf:
        per_sb = ([(4, _W2_D0)] * 4 + [(3, _W2_D1)] * 7
                  + [(2, _W2_D2)] * 19)
        return len(per_sb), per_sb
    bpc = bitrate / channels
    if bpc <= 48:
        if sample_rate == 32000:
            groups = [(4, _W2_C0, 2), (3, _W2_C1, 12)]
        else:
            groups = [(4, _W2_C0, 2), (3, _W2_C1, 8)]
    elif sample_rate == 48000 or bpc <= 80:
        groups = [(4, _W2_A0, 3), (4, _W2_A1, 11), (3, _W2_A2, 23),
                  (2, _W2_A3, 27)]
    else:
        groups = [(4, _W2_A0, 3), (4, _W2_A1, 11), (3, _W2_A2, 23),
                  (2, _W2_A3, 30)]
    per_sb = []
    start = 0
    for nbal, classes, upto in groups:
        per_sb.extend([(nbal, classes)] * (upto - start))
        start = upto
    return len(per_sb), per_sb


def write_mp2(
    pcm, sample_rate: int = 44100, channels: int = 1,
    bitrate: int = 192, grouped_bands: bool = True,
) -> bytes:
    """INDEPENDENT MPEG-1 Layer II encoder: per-subband allocation from
    the Table B.2 class lists (alternating a grouped class — 9 or 5
    levels — with an ungrouped one across active subbands when
    ``grouped_bands``), scfsi cycling through all four sharing modes,
    per-part scalefactors, and grouped triplet / per-sample midtread
    codes. CBR at ``bitrate`` kbps; raises on frame overflow. LSF
    (MPEG-2 22.05/24/16 kHz, MPEG-2.5 11.025/12/8 kHz — the sample
    rate implies the version for Layer II) switches to the single
    ISO 13818-3 Table B.1 allocation layout and the LSF bitrate row;
    everything else (scfsi, scalefactors, grouped codes, 1152-sample
    frames) is version-identical."""
    version = {44100: "1", 48000: "1", 32000: "1",
               22050: "2", 24000: "2", 16000: "2",
               11025: "2.5", 12000: "2.5", 8000: "2.5"}[sample_rate]
    sr_idx = {44100: 0, 48000: 1, 32000: 2,
              22050: 0, 24000: 1, 16000: 2,
              11025: 0, 12000: 1, 8000: 2}[sample_rate]
    lsf = version != "1"
    sblimit, per_sb = _w2_layout(sample_rate, bitrate, channels, lsf=lsf)
    x = np.asarray(pcm, dtype=np.float64) / 32768.0
    chans = [x[0::2], x[1::2]] if channels == 2 else [x]
    subs = [analyze_subbands(c) for c in chans]
    n_frames = -(-subs[0].shape[0] // 36)
    frame_len = 144 * (bitrate * 1000) // sample_rate  # padding bit 0
    mode_byte = 0xC0 if channels == 1 else 0x00
    vbits = {"1": 0b11, "2": 0b10, "2.5": 0b00}[version]
    br_idx = (_BR_IDX_L2_LSF if lsf else _BR_IDX_L2)[bitrate]
    hdr = bytes([0xFF, 0xE0 | (vbits << 3) | (0b10 << 1) | 1,
                 (br_idx << 4) | (sr_idx << 2), mode_byte])
    out = bytearray()
    for f in range(n_frames):
        S = np.zeros((channels, 36, 32))
        for ch in range(channels):
            seg = subs[ch][36 * f : 36 * f + 36]
            S[ch, : seg.shape[0]] = seg
        alloc = np.zeros((channels, sblimit), dtype=int)
        levels_of = np.zeros((channels, sblimit), dtype=int)
        # noise gate (the write_mp1 precedent): only bands within 60 dB
        # of the frame peak get bits, or filterbank leakage activates
        # every band and blows the low-bitrate CBR budget
        fpeak = float(np.max(np.abs(S))) if S.size else 0.0
        # pick a class per active subband: alternate grouped/ungrouped
        for ch in range(channels):
            for sb in range(sblimit):
                bpk = float(np.max(np.abs(S[ch][:, sb])))
                if bpk <= max(1e-9, fpeak * 2.0 ** -10):
                    continue
                classes = per_sb[sb][1]
                want_group = grouped_bands and (sb % 2 == 1)
                pick = None
                if want_group:
                    for lv in (9, 5, 3):
                        if lv in classes:
                            pick = lv
                            break
                if pick is None:
                    for lv in (15, 7, 5, 3):
                        if lv in classes:
                            pick = lv
                            break
                alloc[ch][sb] = classes.index(pick) + 1
                levels_of[ch][sb] = pick
        scfsi = np.zeros((channels, sblimit), dtype=int)
        sfi = np.zeros((channels, sblimit, 3), dtype=int)
        for ch in range(channels):
            for sb in range(sblimit):
                if not alloc[ch][sb]:
                    continue
                scfsi[ch][sb] = sb % 4
                peaks = [
                    float(np.max(np.abs(S[ch][12 * p : 12 * p + 12, sb])))
                    for p in range(3)
                ]
                # sharing modes cover parts with the SHARED max so the
                # quantizer never clips: 1=(01):(a,a,b) 2:(a,a,a) 3:(a,b,b)
                m = scfsi[ch][sb]
                if m == 1:
                    peaks = [max(peaks[0], peaks[1])] * 2 + [peaks[2]]
                elif m == 2:
                    peaks = [max(peaks)] * 3
                elif m == 3:
                    peaks = [peaks[0]] + [max(peaks[1], peaks[2])] * 2
                for p in range(3):
                    idx = int(np.floor(
                        -3.0 * np.log2(max(peaks[p], 1e-12) / 2.0)
                    ))
                    sfi[ch][sb][p] = min(max(idx, 0), 62)
        bw = BitWriter()
        for sb in range(sblimit):
            for ch in range(channels):
                bw.write(alloc[ch][sb], per_sb[sb][0])
        for sb in range(sblimit):
            for ch in range(channels):
                if alloc[ch][sb]:
                    bw.write(scfsi[ch][sb], 2)
        for sb in range(sblimit):
            for ch in range(channels):
                if not alloc[ch][sb]:
                    continue
                m = scfsi[ch][sb]
                parts = {0: (0, 1, 2), 1: (0, 2), 2: (0,), 3: (0, 1)}[m]
                for p in parts:
                    bw.write(sfi[ch][sb][p], 6)

        def _q2(v: float, sf: float, levels: int) -> int:
            if levels in _W2_NB:
                nb = _W2_NB[levels]
                half = 1 << (nb - 1)
                c = (1 << nb) / levels
                raw = int(round((v / (sf * c) + 0.5) * half))
                return min(max(raw, 0), levels - 1)
            nb = levels.bit_length()
            c = (1 << nb) / ((1 << nb) - 1.0)
            d = 2.0 ** (1 - nb)
            raw = int(round((v / (sf * c) - d + 1.0) * (1 << (nb - 1))))
            return min(max(raw, 0), (1 << nb) - 2)

        for gr in range(12):
            part = gr // 4
            for sb in range(sblimit):
                for ch in range(channels):
                    a = alloc[ch][sb]
                    if not a:
                        continue
                    lv = int(levels_of[ch][sb])
                    sfv = float(_L1_SF[sfi[ch][sb][part]])
                    trip = [
                        _q2(S[ch, 3 * gr + k, sb], sfv, lv)
                        for k in range(3)
                    ]
                    if lv in _W2_GROUP_BITS:
                        code = trip[0] + trip[1] * lv + trip[2] * lv * lv
                        bw.write(code, _W2_GROUP_BITS[lv])
                    else:
                        nb = lv.bit_length()
                        for v in trip:
                            bw.write(v, nb)
        out += hdr + bw.to_bytes(frame_len - 4)
    return bytes(out)
