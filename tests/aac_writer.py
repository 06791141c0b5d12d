"""INDEPENDENT spec-derived AAC-LC encoder — the adversarial fixture
source for operators/aac.py (the mp3_writer.py precedent): all
analysis/quantization/packing code here is the writer's own; ONLY the
injected codebook set is shared, because the codebooks ARE the
bitstream contract under test (and the ISO ones are the module's
documented boundary — see tools/aac_table_restatement.py).

Shape: ADTS frames, each one raw_data_block (SCE for mono, CPE with
common_window for stereo, optional M/S), ONE global scalefactor per
frame (DPCM deltas all zero — legal and simple), per-band codebook
chosen from the band's max |q| (so real content exercises books 1-11
incl. escapes), sections as maximal same-book runs, sine or KBD
windows, and the ONLY_LONG → LONG_START → EIGHT_SHORT → LONG_STOP
sequence cycle when short blocks are requested.
"""

from __future__ import annotations

import numpy as np

from sample_dms_kinesis_rds_mariadb_spark.operators.aac import (
    SWB_LONG_1024,
    SWB_SHORT_128,
    kbd_window,
    sine_window,
)

_ADTS_SR_IDX = {96000: 0, 88200: 1, 64000: 2, 48000: 3, 44100: 4,
                32000: 5, 24000: 6, 22050: 7, 16000: 8, 12000: 9,
                11025: 10, 8000: 11}


class BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def to_bytes(self) -> bytes:
        bits = self.bits + [0] * (-len(self.bits) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _mdct(x: np.ndarray) -> np.ndarray:
    """Forward MDCT matching the spec pair: X[k] = 2·Σ x[n]·cos(2π/N
    (n+n0)(k+1/2)); the decoder's IMDCT applies 2/N (13818-7 §14)."""
    N = len(x)
    n_half = N // 2
    n0 = (n_half + 1) / 2.0
    n = np.arange(N)[:, None]
    k = np.arange(n_half)[None, :]
    return 2.0 * (
        x @ np.cos((2.0 * np.pi / N) * (n + n0) * (k + 0.5))
    )


def _window(n: int, shape: int) -> np.ndarray:
    return kbd_window(n, 4.0 if n == 2048 else 6.0) if shape \
        else sine_window(n)


def _analysis_frames(x: np.ndarray, schedule: list[int],
                     shape: int) -> list[np.ndarray]:
    """Per-frame MDCT spectra following the window-sequence schedule;
    frame f covers samples [1024f, 1024f+2048)."""
    specs = []
    for f, seq in enumerate(schedule):
        seg = x[1024 * f: 1024 * f + 2048]
        if len(seg) < 2048:
            seg = np.concatenate([seg, np.zeros(2048 - len(seg))])
        if seq == 2:  # EIGHT_SHORT: 8 MDCTs of 256, hop 128, base 448
            w = _window(256, shape)
            rows = []
            for i in range(8):
                sub = seg[448 + 128 * i: 448 + 128 * i + 256]
                rows.append(_mdct(sub * w))
            specs.append(np.stack(rows))
        else:
            win = np.empty(2048)
            long_w = _window(2048, shape)
            short_w = _window(256, shape)
            win[:1024] = long_w[:1024]
            win[1024:] = long_w[1024:]
            if seq == 1:  # LONG_START tail
                win[1024:1472] = 1.0
                win[1472:1600] = short_w[128:]
                win[1600:] = 0.0
            elif seq == 3:  # LONG_STOP head
                win[:448] = 0.0
                win[448:576] = short_w[:128]
                win[576:1024] = 1.0
            specs.append(_mdct(seg * win)[None, :])
    return specs


def _quantize(spec: np.ndarray, sf: int) -> np.ndarray:
    mag = (np.abs(spec) * 2.0 ** (-0.25 * (sf - 100))) ** 0.75
    return (np.sign(spec) * np.round(mag)).astype(np.int64)


def _pick_sf(peak: float, target_q: float = 160.0) -> int:
    if peak <= 0:
        return 100
    need = 4.0 * np.log2(peak / target_q ** (4.0 / 3.0))
    return int(np.clip(100 + np.ceil(need), 0, 255))


def _book_for(maxq: int, books: dict) -> int:
    for bid in (1, 3, 5, 7, 9):
        pair = books[bid]
        if maxq <= pair.lav:
            return bid
    return 11


def _encode_band(bw: BitWriter, vals: np.ndarray, bid: int,
                 books: dict) -> None:
    book = books[bid]
    dim, lav = book.dim, book.lav
    base = 2 * lav + 1 if book.signed else lav + 1
    for i in range(0, len(vals), dim):
        tup = vals[i:i + dim]
        digits = []
        esc: list[int] = []
        for v in tup:
            a = abs(int(v))
            if book.escape and a >= 16:
                digits.append(16)
                esc.append(a)
            else:
                digits.append(int(v) + lav if book.signed else a)
        idx = 0
        for d in digits:
            idx = idx * base + d
        bw.write(book.codes[idx], book.lens[idx])
        if not book.signed:
            for v in tup:
                if v:
                    bw.write(1 if v < 0 else 0, 1)
        for a in esc:
            n = a.bit_length() - 5  # value = 2^(n+4) + word
            bw.write(((1 << n) - 1) << 1, n + 1)  # n ones THEN the zero
            bw.write(a - (1 << (n + 4)), n + 4)


def _encode_ics(bw: BitWriter, spec: np.ndarray, seq: int, shape: int,
                sample_rate: int, books: dict, common: bool,
                tns_filter: dict | None = None) -> None:
    short = seq == 2
    swb = SWB_SHORT_128[sample_rate] if short \
        else SWB_LONG_1024[sample_rate]
    max_sfb = len(swb) - 1
    n_groups = 8 if short else 1  # every short window its own group

    # per (group=window, sfb) quantization at ONE global sf
    peak = float(np.max(np.abs(spec))) if spec.size else 0.0
    sf = _pick_sf(peak)
    quant = _quantize(spec, sf)
    band_books = []
    for g in range(n_groups):
        for sfb in range(max_sfb):
            vals = quant[g, swb[sfb]:swb[sfb + 1]]
            maxq = int(np.max(np.abs(vals))) if vals.size else 0
            band_books.append(
                0 if maxq == 0 else _book_for(maxq, books)
            )

    bw.write(sf, 8)  # global_gain
    if not common:
        bw.write(0, 1)  # ics_reserved
        bw.write(seq, 2)
        bw.write(shape, 1)
        if short:
            bw.write(max_sfb, 4)
            bw.write(0, 7)  # no grouping: 8 groups of 1
        else:
            bw.write(max_sfb, 6)
            bw.write(0, 1)  # predictor_data_present
    # section data: maximal same-book runs per group
    bits, esc = (3, 7) if short else (5, 31)
    for g in range(n_groups):
        row = band_books[g * max_sfb:(g + 1) * max_sfb]
        k = 0
        while k < max_sfb:
            j = k
            while j < max_sfb and row[j] == row[k]:
                j += 1
            bw.write(row[k], 4)
            length = j - k
            while length >= esc:
                bw.write(esc, bits)
                length -= esc
            bw.write(length, bits)
            k = j
    # scalefactors: DPCM deltas all zero → sf-book symbol 60
    sf_book = books["sf"]
    for bid in band_books:
        if bid:
            bw.write(sf_book.codes[60], sf_book.lens[60])
    bw.write(0, 1)  # pulse_data_present
    if tns_filter and not short:
        bw.write(1, 1)  # tns_data_present
        bw.write(1, 2)  # n_filt = 1 (long: 2 bits)
        bw.write(tns_filter["coef_res"], 1)
        bw.write(tns_filter["length"], 6)
        order = len(tns_filter["coefs"])
        bw.write(order, 5)
        bw.write(tns_filter["direction"], 1)
        bw.write(0, 1)  # coef_compress
        nbits = tns_filter["coef_res"] + 3
        for q in tns_filter["coefs"]:
            bw.write(q & ((1 << nbits) - 1), nbits)
    else:
        bw.write(0, 1)
    bw.write(0, 1)  # gain_control_data_present
    for g in range(n_groups):
        for sfb in range(max_sfb):
            bid = band_books[g * max_sfb + sfb]
            if bid:
                _encode_band(
                    bw, quant[g, swb[sfb]:swb[sfb + 1]], bid, books
                )


def _tns_fir(spec: np.ndarray, tns_filter: dict, sample_rate: int,
             max_sfb: int) -> np.ndarray:
    """The encoder-side TNS analysis filter (FIR with the SAME direct-
    form coefficients the decoder derives): own lattice conversion."""
    bits = tns_filter["coef_res"] + 3
    half = 1 << (bits - 1)
    iqfac = (half - 0.5) / (np.pi / 2.0)
    iqfac_m = (half + 0.5) / (np.pi / 2.0)
    refl = []
    for q in tns_filter["coefs"]:
        v = q - (1 << bits) if q >= half else q
        refl.append(np.sin(v / (iqfac if v >= 0 else iqfac_m)))
    a = np.zeros(len(refl) + 1)
    a[0] = 1.0
    for m in range(1, len(refl) + 1):
        k = refl[m - 1]
        b = a[:m].copy()
        for i in range(1, m):
            b[i] += k * a[m - i]
        a[:m] = b
        a[m] = k
    swb = SWB_LONG_1024[sample_rate]
    top = len(swb) - 1
    bottom = max(top - tns_filter["length"], 0)
    start, end = swb[bottom], swb[min(top, max_sfb)]
    seg = spec[0, start:end].copy()
    out = seg.copy()
    rng = range(len(seg)) if not tns_filter["direction"] else \
        range(len(seg) - 1, -1, -1)
    step = 1 if not tns_filter["direction"] else -1
    for n in rng:
        acc = seg[n]
        for k in range(1, len(a)):
            j = n - step * k
            if 0 <= j < len(seg):
                acc += a[k] * seg[j]
        out[n] = acc
    res = spec.copy()
    res[0, start:end] = out
    return res


def write_aac(
    pcm, sample_rate: int = 44100, channels: int = 1, mode: str = "lr",
    block_type: int = 0, window_shape: int = 0, codebooks: dict = None,
    tns: bool = False,
) -> bytes:
    """Encode PCM (±32768 float, interleaved if stereo) as ADTS AAC-LC.
    ``block_type=2`` cycles ONLY_LONG → LONG_START → EIGHT_SHORT →
    LONG_STOP so every window sequence is on the path; ``mode='ms'``
    encodes mid/side with ms_mask_present=2."""
    if codebooks is None:
        raise ValueError("write_aac needs the injected codebook set")
    x = np.asarray(pcm, dtype=np.float64)
    chans = [x[0::2], x[1::2]] if channels == 2 else [x]
    if channels == 2 and mode == "ms":
        l, r = chans
        chans = [(l + r) / 2.0, (l - r) / 2.0]
    n_frames = max(1, -(-len(chans[0]) // 1024))
    if block_type == 2:
        schedule = [(1, 2, 3, 0)[f % 4] for f in range(n_frames)]
        schedule[0] = 0 if n_frames == 1 else schedule[0]
    else:
        schedule = [0] * n_frames
    specs = [_analysis_frames(c, schedule, window_shape) for c in chans]

    tns_filter = None
    if tns:
        tns_filter = {"coef_res": 1, "length": 20, "direction": 0,
                      "coefs": [3, 14, 2]}  # order 3, 4-bit two's compl.

    out = bytearray()
    for f in range(n_frames):
        bw = BitWriter()
        seq = schedule[f]
        if channels == 1:
            bw.write(0, 3)  # SCE
            bw.write(0, 4)
            spec = specs[0][f]
            if tns_filter and seq != 2:
                spec = _tns_fir(spec, tns_filter, sample_rate,
                                len(SWB_LONG_1024[sample_rate]) - 1)
            _encode_ics(bw, spec, seq, window_shape, sample_rate,
                        codebooks, common=False,
                        tns_filter=tns_filter if seq != 2 else None)
        else:
            bw.write(1, 3)  # CPE
            bw.write(0, 4)
            bw.write(1, 1)  # common_window
            short = seq == 2
            swb = SWB_SHORT_128[sample_rate] if short \
                else SWB_LONG_1024[sample_rate]
            bw.write(0, 1)
            bw.write(seq, 2)
            bw.write(window_shape, 1)
            if short:
                bw.write(len(swb) - 1, 4)
                bw.write(0, 7)
            else:
                bw.write(len(swb) - 1, 6)
                bw.write(0, 1)
            bw.write(2 if mode == "ms" else 0, 2)  # ms_mask_present
            for ch in range(2):
                _encode_ics(bw, specs[ch][f], seq, window_shape,
                            sample_rate, codebooks, common=True)
        bw.write(7, 3)  # END
        payload = bw.to_bytes()
        frame_len = 7 + len(payload)
        sr_idx = _ADTS_SR_IDX[sample_rate]
        hdr = bytearray(7)
        hdr[0] = 0xFF
        hdr[1] = 0xF1  # MPEG-4, layer 00, no CRC
        hdr[2] = (1 << 6) | (sr_idx << 2) | ((channels >> 2) & 1)
        hdr[3] = ((channels & 3) << 6) | ((frame_len >> 11) & 3)
        hdr[4] = (frame_len >> 3) & 0xFF
        hdr[5] = ((frame_len & 7) << 5) | 0x1F
        hdr[6] = 0xFC  # buffer fullness all-ones tail + 1 rdb
        out += hdr + payload
    return bytes(out)
