"""INDEPENDENT spec-derived Ogg Vorbis encoder — the adversarial
fixture source for operators/vorbis.py. Everything here is the
writer's own: LSB bit packing, its own canonical codeword assignment,
its own float32 packing, its own forward MDCT/windows, floor1 Y-value
encoding through the prediction scheme's inverse, residue type-2
classword+VQ packing (two-pass cascade), square-polar coupling in the
forward direction, and Ogg page framing with the real (non-reflected,
0x04C11DB7) page CRC. Nothing is imported from the decoder module —
the bitstream itself is the only shared contract, which is the point:
Vorbis carries its codebooks in-stream, so encoder and decoder can be
genuinely independent implementations of the published spec.
"""

from __future__ import annotations

import heapq

import numpy as np


class LsbWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def write_bytes(self, data: bytes) -> None:
        for b in data:
            self.write(b, 8)

    def to_bytes(self) -> bytes:
        bits = self.bits + [0] * (-len(self.bits) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for j, bit in enumerate(bits[i:i + 8]):
                b |= bit << j
            out.append(b)
        return bytes(out)


def _ilog(x: int) -> int:
    n = 0
    while x > 0:
        n += 1
        x >>= 1
    return n


def _float32_pack(v: float) -> int:
    """Inverse of the spec's float32_unpack for dyadic rationals."""
    sign = 0x80000000 if v < 0 else 0
    v = abs(v)
    if v == 0:
        return 788 << 21
    e = 788
    while v != int(v):
        v *= 2
        e -= 1
    m = int(v)
    while m > 0x1FFFFF:
        if m & 1:
            raise ValueError("not representable")
        m >>= 1
        e += 1
    return sign | (e << 21) | m


def _canonical_codes(lengths: list[int]) -> list[tuple[int, int]]:
    """(len, code) per entry — the writer's OWN implementation of the
    'lowest valued unused codeword' rule."""
    free = [(0.0, 0, 0)]  # (sort key, depth, prefix)
    out = []
    for ln in lengths:
        pick = None
        for i, (_k, d, c) in enumerate(free):
            if d <= ln:
                pick = i
                break
        if pick is None:
            raise ValueError("over-specified codebook")
        _k, d, c = free.pop(pick)
        code = c << (ln - d)
        for j in range(d + 1, ln + 1):
            sib = (c << (j - d)) | 1
            free.append((sib / (1 << j), j, sib))
        free.sort()
        out.append((ln, code))
    return out


def _huffman_lengths(weights: list[float]) -> list[int]:
    n = len(weights)
    heap = [(w, i, None) for i, w in enumerate(weights)]
    heapq.heapify(heap)
    nodes = []
    cnt = n
    while len(heap) > 1:
        a = heapq.heappop(heap)
        b = heapq.heappop(heap)
        nodes.append((a, b))
        heapq.heappush(heap, (a[0] + b[0], cnt, len(nodes) - 1))
        cnt += 1
    depths = [0] * n
    stack = [(heap[0], 0)]
    while stack:
        (w, idx, node), d = stack.pop()
        if node is None:
            depths[idx] = max(d, 1)
        else:
            a, b = nodes[node]
            stack.append((a, d + 1))
            stack.append((b, d + 1))
    return depths


class _Book:
    """Writer-side codebook: setup-header serialization + encoding."""

    def __init__(self, dims: int, lengths: list[int],
                 lookup: dict | None = None) -> None:
        self.dims = dims
        self.lengths = lengths
        self.codes = _canonical_codes(lengths)
        self.lookup = lookup  # {"min","delta","bits","values": grid}

    def write(self, bw: LsbWriter) -> None:
        bw.write(0x564342, 24)
        bw.write(self.dims, 16)
        bw.write(len(self.lengths), 24)
        bw.write(0, 1)  # unordered
        bw.write(0, 1)  # not sparse
        for ln in self.lengths:
            bw.write(ln - 1, 5)
        if self.lookup is None:
            bw.write(0, 4)
            return
        bw.write(2, 4)  # explicit lookup
        bw.write(_float32_pack(self.lookup["min"]), 32)
        bw.write(_float32_pack(self.lookup["delta"]), 32)
        bw.write(self.lookup["bits"] - 1, 4)
        bw.write(0, 1)  # sequence_p
        for m in self.lookup["mults"]:
            bw.write(m, self.lookup["bits"])

    def put(self, bw: LsbWriter, entry: int) -> None:
        ln, code = self.codes[entry]
        for i in range(ln - 1, -1, -1):  # MSB of codeword first
            bw.write((code >> i) & 1, 1)


def _vq_book(dims: int, levels: int, minimum: float,
             delta: float) -> _Book:
    """Fixed-length VQ book over a levels^dims explicit grid."""
    entries = levels ** dims
    ln = _ilog(entries - 1)
    mults = []
    for e in range(entries):
        idx = []
        t = e
        for _ in range(dims):
            idx.append(t % levels)
            t //= levels
        idx.reverse()  # row-major: first dim most significant
        mults.extend(idx)
    book = _Book(dims, [ln] * entries,
                 {"min": minimum, "delta": delta,
                  "bits": _ilog(levels - 1), "mults": mults})
    book._levels = levels
    book._min = minimum
    book._delta = delta
    return book


def _vq_encode(book: _Book, vec: np.ndarray) -> int:
    levels, mn, dl = book._levels, book._min, book._delta
    e = 0
    for v in vec:
        i = int(np.clip(round((v - mn) / dl), 0, levels - 1))
        e = e * levels + i
    return e


# --------------------------------------------------------------------------
# floor / residue / coupling encode
# --------------------------------------------------------------------------

_DB = 7.0 / 256.0  # log10 units per dB-table step


def _floor_y(amp: float, multiplier: int, rng: int) -> int:
    """y index whose table amplitude is >= amp (headroom rounding)."""
    if amp <= 1e-7:
        return 0
    y = int(np.ceil((np.log10(amp) / _DB + 255.0) / multiplier))
    return int(np.clip(y, 0, rng - 1))


def _render_point(x0, y0, x1, y1, x):
    dy = y1 - y0
    adx = x1 - x0
    err = abs(dy) * (x - x0)
    off = err // adx
    return y0 - off if dy < 0 else y0 + off


def _floor_vals(final: list[int], xs: list[int], rng: int) -> list[int]:
    """Encode final Y values into the decode-order val list (the
    prediction scheme's inverse)."""
    vals = [final[0], final[1]]
    for v in range(2, len(xs)):
        low = high = -1
        for i in range(v):
            if xs[i] < xs[v] and (low < 0 or xs[i] > xs[low]):
                low = i
            if xs[i] > xs[v] and (high < 0 or xs[i] < xs[high]):
                high = i
        pred = _render_point(xs[low], final[low], xs[high], final[high],
                             xs[v])
        highroom = rng - pred
        lowroom = pred
        room = 2 * min(highroom, lowroom)
        d = final[v] - pred
        if d == 0:
            vals.append(0)
            continue
        small = 2 * d if d > 0 else -2 * d - 1
        if small < room:
            vals.append(small)
        elif d > 0:
            vals.append(d + lowroom)      # val - lowroom + pred = final
        else:
            vals.append(pred - final[v] - 1 + highroom)
        if not 0 <= vals[-1] < rng:
            raise ValueError("floor val out of range")
    return vals


def _couple_forward(l: np.ndarray, r: np.ndarray):
    """Square polar forward: (m, a) whose spec inverse returns (l, r).
    Derived per inverse branch: l>0,r<l → (l, l−r); r>0,l≤r →
    (r, l−r); l≤0,r>l → (l, r−l); r≤0,l≥r → (r, r−l)."""
    m = np.where((l > 0) & (r < l), l,
        np.where((r > 0) & (l <= r), r,
        np.where((l <= 0) & (r > l), l, r)))
    a = np.where((l > 0) & (r < l), l - r,
        np.where((r > 0) & (l <= r), l - r,
        np.where((l <= 0) & (r > l), r - l, r - l)))
    return m, a


# --------------------------------------------------------------------------
# Ogg framing
# --------------------------------------------------------------------------

_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) if _r & 0x80000000 else (_r << 1)
        _r &= 0xFFFFFFFF
    _CRC_TABLE.append(_r)


def _ogg_crc(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((crc >> 24) ^ b)
                                                     & 0xFF]
    return crc


def _ogg_page(packets: list[bytes], serial: int, seqno: int,
              granule: int, bos: bool = False, eos: bool = False) -> bytes:
    lacing = bytearray()
    body = bytearray()
    for pkt in packets:
        n = len(pkt)
        while n >= 255:
            lacing.append(255)
            n -= 255
        lacing.append(n)
        body += pkt
    hdr = bytearray(b"OggS")
    hdr.append(0)
    hdr.append((0x02 if bos else 0) | (0x04 if eos else 0))
    hdr += int(granule).to_bytes(8, "little", signed=True)
    hdr += serial.to_bytes(4, "little")
    hdr += seqno.to_bytes(4, "little")
    hdr += b"\x00\x00\x00\x00"  # CRC placeholder
    hdr.append(len(lacing))
    hdr += lacing
    page = bytes(hdr) + bytes(body)
    crc = _ogg_crc(page)
    return page[:22] + crc.to_bytes(4, "little") + page[26:]


# --------------------------------------------------------------------------
# the encoder
# --------------------------------------------------------------------------

_BS0, _BS1 = 256, 2048
_MULT = 2           # floor multiplier → range 128
_FLOOR_RANGE = 128
_XS_LONG = [0, 1024, 4, 8, 16, 24, 32, 48, 64, 96, 128, 160, 192, 224,
            256, 320, 384, 448, 512, 640, 768, 896]
_XS_SHORT = [0, 128, 4, 8, 16, 24, 40, 56, 80, 104]


def _window(n: int) -> np.ndarray:
    i = np.arange(n)
    return np.sin(0.5 * np.pi * np.sin(np.pi / n * (i + 0.5)) ** 2)


def _mdct(x: np.ndarray) -> np.ndarray:
    """Forward transform paired with the spec's normalization-free
    IMDCT: X[k] = (4/n)·Σ x[j] cos(π/2n (2j+1+n/2)(2k+1)) — the 4/n
    makes the windowed OLA pair perfectly reconstructing."""
    n = len(x)
    n_half = n // 2
    j = np.arange(n)[:, None]
    k = np.arange(n_half)[None, :]
    return (4.0 / n) * (
        x @ np.cos(np.pi / (2.0 * n) * (2 * j + 1 + n_half) * (2 * k + 1))
    )


def _books() -> dict:
    floor_book = _Book(1, [7] * 128)            # floor vals 0..127
    # classbook: 2 classifications, 4 partitions per word, non-uniform
    # lengths (exercises the decoder's variable-length tree walk)
    weights = []
    for e in range(16):
        ones = bin(e).count("1")
        weights.append(8.0 ** (4 - ones))
    class_book = _Book(4, _huffman_lengths(weights))
    coarse = _vq_book(2, 8, -7.0, 2.0)
    fine = _vq_book(2, 8, -0.875, 0.25)
    fine2 = _vq_book(2, 8, -0.109375, 0.03125)
    return {"floor": floor_book, "class": class_book,
            "coarse": coarse, "fine": fine, "fine2": fine2}


def _setup_packet(books: dict, channels: int,
                  couple: bool = True) -> bytes:
    bw = LsbWriter()
    bw.write_bytes(b"\x05vorbis")
    order = [books["floor"], books["class"], books["coarse"],
             books["fine"], books["fine2"]]
    bw.write(len(order) - 1, 8)
    for b in order:
        b.write(bw)
    bw.write(0, 6)   # one time transform
    bw.write(0, 16)
    # floors: 0 = short, 1 = long
    bw.write(1, 6)   # count-1 = 1 → 2 floors
    for xs, rangebits in ((_XS_SHORT, 7), (_XS_LONG, 10)):
        bw.write(1, 16)                   # floor type 1
        n_part = (len(xs) - 2) // 4
        bw.write(n_part, 5)
        for _ in range(n_part):
            bw.write(0, 4)                # class 0
        bw.write(3, 3)                    # class dim 4 (−1)
        bw.write(0, 2)                    # subclasses = 0
        bw.write(0 + 1, 8)                # subclass book = floor (+1)
        bw.write(_MULT - 1, 2)
        bw.write(rangebits, 4)
        for x in xs[2:]:
            bw.write(x, rangebits)
    # residues: 0 = short, 1 = long (type 2)
    bw.write(1, 6)
    for n_half in (_BS0 // 2, _BS1 // 2):
        bw.write(2, 16)
        bw.write(0, 24)                       # begin
        bw.write(n_half * channels, 24)       # end
        bw.write(32 - 1, 24)                  # partition size
        bw.write(2 - 1, 6)                    # classifications
        bw.write(1, 8)                        # classbook index
        bw.write(0, 3)                        # class 0 cascade: none
        bw.write(0, 1)
        bw.write(0b111, 3)                    # class 1: passes 0+1+2
        bw.write(0, 1)
        bw.write(2, 8)                        # pass 0 → coarse
        bw.write(3, 8)                        # pass 1 → fine
        bw.write(4, 8)                        # pass 2 → fine2
    # mappings: 0 = short, 1 = long
    bw.write(1, 6)
    for fl, rs in ((0, 0), (1, 1)):
        bw.write(0, 16)
        bw.write(0, 1)                        # one submap
        if channels == 2 and couple:
            bw.write(1, 1)                    # coupling present
            bw.write(0, 8)                    # one step
            bw.write(0, _ilog(channels - 1))  # magnitude ch 0
            bw.write(1, _ilog(channels - 1))  # angle ch 1
        else:
            bw.write(0, 1)
        bw.write(0, 2)                        # reserved
        bw.write(0, 8)                        # time (unused)
        bw.write(fl, 8)
        bw.write(rs, 8)
    # modes: 0 = short, 1 = long
    bw.write(1, 6)
    for blockflag, mapping in ((0, 0), (1, 1)):
        bw.write(blockflag, 1)
        bw.write(0, 16)
        bw.write(0, 16)
        bw.write(mapping, 8)
    bw.write(1, 1)  # framing
    return bw.to_bytes()


def _encode_floor(bw: LsbWriter, spec: np.ndarray, xs: list,
                  books: dict) -> np.ndarray:
    """Write the floor Y values for one channel; return the rendered
    curve THE WRITER believes in (independent of the decoder)."""
    n_half = len(spec)
    rng = _FLOOR_RANGE
    amps = np.abs(spec)
    # each point's envelope window spans halfway to its X neighbors,
    # so every bin is covered by some point's peak measurement
    order = sorted(range(len(xs)), key=lambda k: xs[k])
    sx = [xs[k] for k in order]
    final = [0] * len(xs)
    for rank, k in enumerate(order):
        lo = 0 if rank == 0 else (sx[rank - 1] + sx[rank]) // 2
        hi = n_half if rank == len(order) - 1 else \
            (sx[rank] + sx[rank + 1]) // 2 + 1
        lo, hi = max(0, min(lo, n_half)), max(0, min(hi, n_half))
        peak = float(amps[lo:hi].max()) if hi > lo else 0.0
        final[k] = _floor_y(peak * 1.2, _MULT, rng)

    def _curve(fin):
        cdb = np.zeros(n_half, dtype=np.int64)
        lx, ly = 0, fin[order[0]] * _MULT
        for kk in order[1:]:
            hx2, hy2 = xs[kk], fin[kk] * _MULT
            if hx2 > lx:
                xr = np.arange(lx, min(hx2, n_half))
                dy = hy2 - ly
                cdb[lx:min(hx2, n_half)] = ly + (
                    (np.abs(dy) * (xr - lx)) // (hx2 - lx)
                ) * (1 if dy >= 0 else -1)
            lx, ly = hx2, hy2
        if lx < n_half:
            cdb[lx:] = ly
        np.clip(cdb, 0, 255, out=cdb)
        return 10.0 ** ((cdb - 255) * _DB)

    # between sparse X points the dB-linear interpolation can dip far
    # below steep leakage skirts; raise bounding points until the
    # curve covers the spectrum within the residue grid's reach (±7)
    for _pass in range(3):
        cv = _curve(final)
        ratio = amps / np.maximum(cv, 1e-12)
        bad = np.where(ratio > 6.0)[0]
        if not len(bad):
            break
        for b in bad:
            lift = int(np.ceil(np.log10(ratio[b] / 6.0)
                               / (_DB * _MULT))) + 1
            for rank in range(len(order)):
                if rank + 1 < len(order) and                         sx[rank] <= b < sx[rank + 1]:
                    for kk in (order[rank], order[rank + 1]):
                        final[kk] = min(final[kk] + lift, rng - 1)
                    break
    vals = _floor_vals(final, xs, rng)
    bw.write(1, 1)  # nonzero
    bits = _ilog(rng - 1)
    bw.write(vals[0], bits)
    bw.write(vals[1], bits)
    n_part = (len(xs) - 2) // 4
    floor_book = books["floor"]
    i = 2
    for _p in range(n_part):
        for _d in range(4):
            floor_book.put(bw, vals[i])
            i += 1
    # writer-side curve render (integer math mirror of the spec)
    curve_db = np.zeros(n_half, dtype=np.int64)
    lx, ly = 0, final[order[0]] * _MULT
    for k in order[1:]:
        hx, hy = xs[k], final[k] * _MULT
        if hx > lx:
            xr = np.arange(lx, min(hx, n_half))
            dy = hy - ly
            adx = hx - lx
            base = dy // adx if dy >= 0 else -((-dy) // adx)
            # exact integer render (matches Bresenham's accumulated err)
            curve_db[lx:min(hx, n_half)] = ly + (
                (np.abs(dy) * (xr - lx)) // adx
            ) * (1 if dy >= 0 else -1)
        lx, ly = hx, hy
    if lx < n_half:
        curve_db[lx:] = ly
    np.clip(curve_db, 0, 255, out=curve_db)
    return 10.0 ** ((curve_db - 255) * _DB)


def _encode_residue(bw: LsbWriter, res: np.ndarray, books: dict,
                    end: int) -> None:
    """Type-2 residue: res is the interleaved vector (1, end)."""
    class_book = books["class"]
    pass_books = [books["coarse"], books["fine"], books["fine2"]]
    psize = 32
    parts = end // psize
    classes = []
    for p in range(parts):
        seg = res[p * psize:(p + 1) * psize]
        # drop residue > 40 dB under the floor (class 0: silence)
        classes.append(1 if np.any(np.abs(seg) > 0.02) else 0)
    # quantization plan: successive refinement over class-1 partitions
    stage_vals = []
    rem = res.copy()
    for book in pass_books:
        q = np.zeros(end)
        for p in range(parts):
            if classes[p]:
                seg = rem[p * psize:(p + 1) * psize]
                qi = np.clip(np.round((seg - book._min) / book._delta),
                             0, book._levels - 1)
                q[p * psize:(p + 1) * psize] = book._min + qi * book._delta
        stage_vals.append(q)
        rem = rem - q
    cw = class_book.dims
    for pass_n in range(len(pass_books)):
        pc = 0
        while pc < parts:
            if pass_n == 0:
                word = 0
                for i in range(cw):
                    c = classes[pc + i] if pc + i < parts else 0
                    word = word * 2 + c
                class_book.put(bw, word)
            for _i in range(cw):
                if pc >= parts:
                    break
                if classes[pc]:
                    book = pass_books[pass_n]
                    vec = stage_vals[pass_n][
                        pc * psize:(pc + 1) * psize
                    ]
                    for j in range(0, psize, 2):
                        book.put(bw, _vq_encode(book, vec[j:j + 2]))
                pc += 1


def write_vorbis(
    pcm, sample_rate: int = 44100, channels: int = 1,
    block: str = "long", couple: bool = True,
) -> bytes:
    """Encode PCM (±32768 float, interleaved if stereo) as a complete
    Ogg Vorbis stream. ``block='long'`` → all 2048 blocks;
    ``'short'`` → all 256 blocks. Stereo uses square-polar coupling
    when ``couple`` (the common real-encoder shape)."""
    x = np.asarray(pcm, dtype=np.float64) / 32768.0
    chans = [x[i::channels] for i in range(channels)]
    if channels > 2:
        couple = False  # coupling steps pair exactly two channels here
    books = _books()

    idw = LsbWriter()
    idw.write_bytes(b"\x01vorbis")
    idw.write(0, 32)
    idw.write(channels, 8)
    idw.write(sample_rate, 32)
    idw.write(0, 32)
    idw.write(0, 32)
    idw.write(0, 32)
    idw.write(8, 4)    # blocksize_0 = 256
    idw.write(11, 4)   # blocksize_1 = 2048
    idw.write(1, 1)
    id_pkt = idw.to_bytes()

    cw = LsbWriter()
    cw.write_bytes(b"\x03vorbis")
    vendor = b"spark-graft vorbis fixture writer"
    cw.write(len(vendor), 32)
    cw.write_bytes(vendor)
    cw.write(0, 32)
    cw.write(1, 1)
    comment_pkt = cw.to_bytes()

    setup_pkt = _setup_packet(books, channels, couple=couple)

    if block == "mixed":
        # repeating L S S L covers every transition pair (L→S, S→S,
        # S→L, L→L) — the hybrid window slopes and variable-lap OLA
        def _size_at(f: int) -> int:
            return (_BS1, _BS0, _BS0, _BS1)[f % 4]
    else:
        _fixed = _BS1 if block == "long" else _BS0

        def _size_at(f: int) -> int:
            return _fixed

    # block start positions: s_{k+1} = s_k + 3n_k/4 − n_{k+1}/4 (the
    # right slope of block k coincides with the left slope of k+1);
    # s_0 = −n_0/2 primes the decoder's first junction at sample 0
    total = len(chans[0])
    sizes: list[int] = []
    starts: list[int] = []
    s = -(_size_at(0) // 2)
    f = 0
    while True:
        nk = _size_at(f)
        sizes.append(nk)
        starts.append(s)
        if s >= total:
            break
        s = s + 3 * nk // 4 - _size_at(f + 1) // 4
        f += 1
    pad = sizes[0] // 2
    chans = [
        np.concatenate([np.zeros(pad), c, np.zeros(_BS1)]) for c in chans
    ]

    def _hybrid(nk: int, prev_n: int, next_n: int) -> np.ndarray:
        w = np.ones(nk)
        ln = min(nk, prev_n) // 2
        rn = min(nk, next_n) // 2
        ls = _window(2 * ln)[:ln]
        rs = _window(2 * rn)[:rn]
        lstart = nk // 4 - ln // 2
        w[:lstart] = 0.0
        w[lstart:lstart + ln] = ls
        rstart = 3 * nk // 4 - rn // 2
        w[rstart:rstart + rn] = rs[::-1]
        w[rstart + rn:] = 0.0
        return w

    packets = []
    for f, (nk, sk) in enumerate(zip(sizes, starts)):
        n = nk
        n_half = n // 2
        mode = 1 if n == _BS1 else 0
        xs = _XS_LONG if mode else _XS_SHORT
        prev_n = sizes[f - 1] if f > 0 else n
        next_n = sizes[f + 1] if f + 1 < len(sizes) else n
        win = _hybrid(n, prev_n, next_n)
        specs = []
        for c in chans:
            seg = c[pad + sk: pad + sk + n]
            if len(seg) < n:
                seg = np.concatenate([seg, np.zeros(n - len(seg))])
            specs.append(_mdct(seg * win))
        bw = LsbWriter()
        bw.write(0, 1)           # audio packet
        bw.write(mode, 1)        # ilog(2-1) = 1 bit
        if mode == 1:
            bw.write(1 if prev_n == _BS1 else 0, 1)
            bw.write(1 if next_n == _BS1 else 0, 1)
        floors = [
            _encode_floor(bw, spec, xs, books) for spec in specs
        ]
        residues = [spec / np.maximum(fl, 1e-10)
                    for spec, fl in zip(specs, floors)]
        if channels == 2 and couple:
            m, a = _couple_forward(residues[0], residues[1])
            residues = [m, a]
        inter = np.empty(n_half * channels)
        for c in range(channels):
            inter[c::channels] = residues[c]
        _encode_residue(bw, inter, books, n_half * channels)
        packets.append(bw.to_bytes())

    serial = 0x5053474B
    pages = [
        _ogg_page([id_pkt], serial, 0, 0, bos=True),
        _ogg_page([comment_pkt, setup_pkt], serial, 1, 0),
    ]
    granule = 0
    for i, pkt in enumerate(packets):
        granule += (sizes[i - 1] + sizes[i]) // 4 if i else sizes[0] // 4
        pages.append(_ogg_page(
            [pkt], serial, 2 + i, granule, eos=i == len(packets) - 1
        ))
    return b"".join(pages)
