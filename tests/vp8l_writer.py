"""Independent spec-derived VP8L (WebP lossless) ENCODER — parity
fixture generator for operators/webp_lossless.py, written from the
public bitstream spec (RFC 9649), not from the decoder: the decoder
reads what this writer emits only because both restate the spec.

Supports the full feature surface the decoder claims: normal and
simple prefix codes, the code-length code with 17/18 zero runs and
the optional max_symbol cap, color cache, LZ77 backrefs through both
the 2D neighbor map and linear distances, meta-Huffman groups, and
all four transforms (predictor per-block modes, cross-color,
subtract-green, color-indexing with pixel bundling)."""

from __future__ import annotations

import heapq
import struct

import numpy as np

from sample_dms_kinesis_rds_mariadb_spark.operators.webp_lossless import (
    vp8l_distance_map,
)

_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14,
             15)


class BitWriter:
    """LSB-first bit writer."""

    def __init__(self) -> None:
        self.bits: list[int] = []

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits):
            self.bits.append((value >> i) & 1)

    def write_code(self, code: int, length: int) -> None:
        """Prefix-code bits go out MSB-first."""
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


def huffman_lengths(freqs: dict[int, int], maxlen: int = 15) -> dict[int, int]:
    """Code lengths for the nonzero-frequency symbols."""
    syms = sorted(freqs)
    if not syms:
        raise ValueError("empty alphabet")
    if len(syms) == 1:
        return {syms[0]: 1}
    heap = [(f, i, ("leaf", s)) for i, (s, f) in
            enumerate(sorted(freqs.items()))]
    heapq.heapify(heap)
    nodes = []
    tick = len(syms)
    while len(heap) > 1:
        a = heapq.heappop(heap)
        b = heapq.heappop(heap)
        nodes.append((a, b))
        heapq.heappush(heap, (a[0] + b[0], tick, ("node", len(nodes) - 1)))
        tick += 1
    depths: dict[int, int] = {}
    stack = [(heap[0], 0)]
    while stack:
        (_f, _i, (kind, v)), d = stack.pop()
        if kind == "leaf":
            depths[v] = max(d, 1)
        else:
            a, b = nodes[v]
            stack.append((a, d + 1))
            stack.append((b, d + 1))
    if max(depths.values()) > maxlen:
        raise ValueError("huffman code exceeds the spec length limit "
                         "for this fixture — flatten the distribution")
    return depths


def canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical RFC-1951 assignment."""
    order = sorted((l, s) for s, l in lengths.items())
    codes = {}
    code = 0
    prev = order[0][0]
    for ln, sym in order:
        code <<= ln - prev
        prev = ln
        codes[sym] = (code, ln)
        code += 1
    return codes


def write_prefix_code(
    bw: BitWriter, lengths: dict[int, int], alphabet_size: int,
    use_max_symbol: bool = False, force_normal: bool = False,
) -> dict[int, tuple[int, int]]:
    """Serialize one prefix code; returns the symbol->(code,len) map."""
    used = sorted(lengths)
    if not force_normal and 1 <= len(used) <= 2 and max(used) < 256:
        bw.write(1, 1)                     # simple
        bw.write(len(used) - 1, 1)         # num_symbols - 1
        sym0 = used[0]
        if sym0 <= 1:
            bw.write(0, 1)
            bw.write(sym0, 1)
        else:
            bw.write(1, 1)
            bw.write(sym0, 8)
        if len(used) == 2:
            bw.write(used[1], 8)
            return {used[0]: (0, 1), used[1]: (1, 1)}
        return {used[0]: (0, 0)}
    bw.write(0, 1)                         # normal
    # token stream over the code-length alphabet: literals + zero runs.
    # Without the max_symbol cap the reader consumes tokens until the
    # WHOLE alphabet is covered, so trailing zeros must be emitted as
    # runs; with the cap, stopping at the last nonzero exercises it.
    seq = [lengths.get(s, 0) for s in range(alphabet_size)]
    last = len(seq) - 1
    if use_max_symbol:
        while last > 0 and seq[last] == 0:
            last -= 1
    tokens: list[tuple[int, int, int]] = []  # (cl_symbol, extra, nbits)
    i = 0
    while i <= last:
        if seq[i] == 0:
            run = 1
            while i + run <= last and seq[i + run] == 0:
                run += 1
            while run >= 11:
                take = min(run, 11 + 127)
                tokens.append((18, take - 11, 7))
                run -= take
                i += take
            while run >= 3:
                take = min(run, 3 + 7)
                tokens.append((17, take - 3, 3))
                run -= take
                i += take
            for _ in range(run):
                tokens.append((0, 0, 0))
                i += 1
        else:
            tokens.append((seq[i], 0, 0))
            i += 1
    if use_max_symbol and len(tokens) < 2:
        # max_symbol is serialized as (value - 2): pad with an explicit
        # zero literal so the cap is always encodable
        tokens.append((0, 0, 0))
    cl_freq: dict[int, int] = {}
    for s, _e, _n in tokens:
        cl_freq[s] = cl_freq.get(s, 0) + 1
    cl_lengths = huffman_lengths(cl_freq, maxlen=7)
    num_codes = 4
    for j, s in enumerate(_CL_ORDER):
        if cl_lengths.get(s, 0):
            num_codes = max(num_codes, j + 1)
    bw.write(num_codes - 4, 4)
    for j in range(num_codes):
        bw.write(cl_lengths.get(_CL_ORDER[j], 0), 3)
    cl_codes = canonical_codes(cl_lengths)
    if len(cl_codes) == 1:
        # zero-bit single-symbol CL code: emit no bits per token
        (only_sym,) = cl_codes
        cl_codes[only_sym] = (0, 0)
    if use_max_symbol:
        max_symbol = len(tokens)
        nbits = max((max_symbol - 2).bit_length(), 2)
        nbits = nbits + (nbits & 1)  # 2 + 2*k form
        bw.write(1, 1)
        bw.write((nbits - 2) // 2, 3)
        bw.write(max_symbol - 2, nbits)
    else:
        bw.write(0, 1)
    for s, extra, nbits in tokens:
        c, ln = cl_codes[s]
        bw.write_code(c, ln)
        if nbits:
            bw.write(extra, nbits)
    codes = canonical_codes(lengths)
    if len(codes) == 1:
        # a single-symbol code is zero-bit however it was serialized
        (only,) = codes
        codes[only] = (0, 0)
    return codes


def prefix_encode(v: int) -> tuple[int, int, int]:
    """value (>=1) -> (prefix code, extra value, extra bits)."""
    if v <= 4:
        return v - 1, 0, 0
    u = v - 1
    extra = u.bit_length() - 2
    rem = u - (2 << extra)
    if rem < (1 << extra):
        return 2 * extra + 2, rem, extra
    return 2 * extra + 3, rem - (1 << extra), extra


_DIST_MAP = vp8l_distance_map()


def _dist_to_code(dist: int, width: int) -> int:
    for i, (dx, dy) in enumerate(_DIST_MAP):
        if max(dy * width + dx, 1) == dist:
            return i + 1
    return dist + 120


def _tokenize(
    argb: list[int], w: int, h: int, cache_bits: int, backrefs: bool,
) -> list[tuple]:
    """Pixel stream -> tokens: ('lit', px) | ('cache', idx) |
    ('copy', length, dist). Simulates the decoder's cache exactly."""
    n = len(argb)
    cache = [0] * (1 << cache_bits) if cache_bits else None
    shift = 32 - cache_bits if cache_bits else 0
    tokens = []
    pos = 0
    cand_dists = []
    if backrefs:
        cand_dists = [1, 2, 3, w, w - 1, w + 1, 2 * w]
        cand_dists = sorted({d for d in cand_dists if d >= 1})

    def _insert(px: int) -> None:
        if cache is not None:
            cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> shift] = px

    while pos < n:
        best_len = 0
        best_dist = 0
        if backrefs:
            for d in cand_dists:
                if d > pos:
                    continue
                ln = 0
                while (pos + ln < n and ln < 512
                       and argb[pos + ln - d] == argb[pos + ln]):
                    ln += 1
                if ln > best_len:
                    best_len, best_dist = ln, d
        if best_len >= 3:
            tokens.append(("copy", best_len, best_dist))
            for k in range(best_len):
                _insert(argb[pos + k])
            pos += best_len
            continue
        px = argb[pos]
        if cache is not None:
            idx = ((0x1E35A7BD * px) & 0xFFFFFFFF) >> shift
            if cache[idx] == px:
                tokens.append(("cache", idx))
                pos += 1
                continue
        tokens.append(("lit", px))
        _insert(px)
        pos += 1
    return tokens


def encode_entropy_image(
    bw: BitWriter, argb: list[int], w: int, h: int, level0: bool,
    cache_bits: int = 0, backrefs: bool = False, meta_bits: int | None = None,
    use_max_symbol: bool = False, force_normal: bool = False,
) -> None:
    """One entropy-coded image stream (§3.6)."""
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    n_groups = 1
    meta_w = 0
    group_of_block: list[int] = []
    if level0:
        if meta_bits is not None:
            bw.write(1, 1)
            bw.write(meta_bits - 2, 3)
            meta_w = -(-w // (1 << meta_bits))
            meta_h = -(-h // (1 << meta_bits))
            n_groups = 2 if meta_w * meta_h > 1 else 1
            group_of_block = [i % n_groups for i in range(meta_w * meta_h)]
            meta_px = [
                0xFF000000 | ((g >> 8) << 16) | ((g & 0xFF) << 8)
                for g in group_of_block
            ]
            encode_entropy_image(bw, meta_px, meta_w, meta_h, False)
        else:
            bw.write(0, 1)
    tokens = _tokenize(argb, w, h, cache_bits, backrefs)

    def group_at(pos: int) -> int:
        if meta_bits is None or not level0:
            return 0
        x, y = pos % w, pos // w
        return group_of_block[(y >> meta_bits) * meta_w + (x >> meta_bits)]

    green_alpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    freqs = [
        [dict() for _ in range(5)] for _ in range(n_groups)
    ]  # green,red,blue,alpha,dist

    def bump(g: int, which: int, sym: int) -> None:
        d = freqs[g][which]
        d[sym] = d.get(sym, 0) + 1

    pos = 0
    for tok in tokens:
        g = group_at(pos)
        if tok[0] == "lit":
            px = tok[1]
            bump(g, 0, (px >> 8) & 0xFF)
            bump(g, 1, (px >> 16) & 0xFF)
            bump(g, 2, px & 0xFF)
            bump(g, 3, (px >> 24) & 0xFF)
            pos += 1
        elif tok[0] == "cache":
            bump(g, 0, 280 + tok[1])
            pos += 1
        else:
            _verb, ln, dist = tok
            lcode, _e, _n = prefix_encode(ln)
            bump(g, 0, 256 + lcode)
            dcode, _e2, _n2 = prefix_encode(_dist_to_code(dist, w))
            bump(g, 4, dcode)
            pos += ln
    # every alphabet needs at least one symbol even if unused
    codes = []
    for g in range(n_groups):
        per = []
        for which, size in ((0, green_alpha), (1, 256), (2, 256), (3, 256),
                            (4, 40)):
            f = freqs[g][which] or {0: 1}
            per.append(write_prefix_code(
                bw, huffman_lengths(f), size,
                use_max_symbol=use_max_symbol, force_normal=force_normal,
            ))
        codes.append(per)
    pos = 0
    for tok in tokens:
        g = group_at(pos)
        green, red, blue, alpha, dcodes = codes[g]
        if tok[0] == "lit":
            px = tok[1]
            c, ln = green[(px >> 8) & 0xFF]
            bw.write_code(c, ln)
            c, ln = red[(px >> 16) & 0xFF]
            bw.write_code(c, ln)
            c, ln = blue[px & 0xFF]
            bw.write_code(c, ln)
            c, ln = alpha[(px >> 24) & 0xFF]
            bw.write_code(c, ln)
            pos += 1
        elif tok[0] == "cache":
            c, ln = green[280 + tok[1]]
            bw.write_code(c, ln)
            pos += 1
        else:
            _verb, length, dist = tok
            lcode, extra, nbits = prefix_encode(length)
            c, ln = green[256 + lcode]
            bw.write_code(c, ln)
            if nbits:
                bw.write(extra, nbits)
            dcode, dextra, dnbits = prefix_encode(_dist_to_code(dist, w))
            c, ln = dcodes[dcode]
            bw.write_code(c, ln)
            if dnbits:
                bw.write(dextra, dnbits)
            pos += length


# --------------------------------------------------------------------------
# forward transforms
# --------------------------------------------------------------------------

def _sub_px(p: int, q: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        out |= ((((p >> sh) & 0xFF) - ((q >> sh) & 0xFF)) & 0xFF) << sh
    return out


def _apply_subtract_green(argb: list[int]) -> list[int]:
    out = []
    for px in argb:
        g = (px >> 8) & 0xFF
        r = (((px >> 16) & 0xFF) - g) & 0xFF
        b = ((px & 0xFF) - g) & 0xFF
        out.append((px & 0xFF00FF00) | (r << 16) | b)
    return out


def _apply_predictor(
    argb: list[int], w: int, h: int, size_bits: int, modes: list[int],
    modes_w: int,
) -> list[int]:
    from sample_dms_kinesis_rds_mariadb_spark.operators import (
        webp_lossless as D,
    )

    out = []
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if y == 0 and x == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = argb[i - 1]
            elif x == 0:
                pred = argb[i - w]
            else:
                mode = modes[(y >> size_bits) * modes_w + (x >> size_bits)]
                left, top, tl = argb[i - 1], argb[i - w], argb[i - w - 1]
                tr = argb[i - w + 1]
                pred = {
                    0: 0xFF000000, 1: left, 2: top, 3: tr, 4: tl,
                    5: D._avg2(D._avg2(left, tr), top),
                    6: D._avg2(left, tl), 7: D._avg2(left, top),
                    8: D._avg2(tl, top), 9: D._avg2(top, tr),
                    10: D._avg2(D._avg2(left, tl), D._avg2(top, tr)),
                    11: D._select(left, top, tl),
                    12: D._clamp_add_full(left, top, tl),
                    13: D._clamp_add_half(D._avg2(left, top), tl),
                }[mode]
            out.append(_sub_px(argb[i], pred))
    return out


def _apply_color_transform(
    argb: list[int], w: int, h: int, size_bits: int, elems: list[int],
    elems_w: int,
) -> list[int]:
    from sample_dms_kinesis_rds_mariadb_spark.operators.webp_lossless import (
        _ct_delta,
    )

    out = []
    for y in range(h):
        for x in range(w):
            e = elems[(y >> size_bits) * elems_w + (x >> size_bits)]
            g2r, g2b, r2b = e & 0xFF, (e >> 8) & 0xFF, (e >> 16) & 0xFF
            px = argb[y * w + x]
            a = (px >> 24) & 0xFF
            r = (px >> 16) & 0xFF
            g = (px >> 8) & 0xFF
            b = px & 0xFF
            nr = (r - _ct_delta(g2r, g)) & 0xFF
            nb = (b - _ct_delta(g2b, g) - _ct_delta(r2b, r)) & 0xFF
            out.append((a << 24) | (nr << 16) | (g << 8) | nb)
    return out


def write_vp8l(
    rgba: np.ndarray,
    subtract_green: bool = False,
    predictor: tuple[int, list[int]] | None = None,   # (size_bits, modes)
    color_transform: tuple[int, list[int]] | None = None,
    palette: bool = False,
    cache_bits: int = 0,
    backrefs: bool = False,
    meta_bits: int | None = None,
    use_max_symbol: bool = False,
    force_normal: bool = False,
    container: bool = True,
) -> bytes:
    """Encode an (h, w, 4) uint8 RGBA array. Transform stream order:
    predictor, color, subtract-green, palette (each optional)."""
    h, w = rgba.shape[:2]
    argb = [
        (int(px[3]) << 24) | (int(px[0]) << 16) | (int(px[1]) << 8)
        | int(px[2])
        for row in rgba for px in row
    ]
    alpha_used = any(((px >> 24) & 0xFF) != 0xFF for px in argb)
    bw = BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if alpha_used else 0, 1)
    bw.write(0, 3)  # version
    cur_w = w
    if predictor is not None:
        size_bits, modes = predictor
        bw.write(1, 1)
        bw.write(0, 2)
        bw.write(size_bits - 2, 3)
        mw = -(-cur_w // (1 << size_bits))
        mh = -(-h // (1 << size_bits))
        assert len(modes) == mw * mh
        argb = _apply_predictor(argb, cur_w, h, size_bits, modes, mw)
        mode_px = [0xFF000000 | (m << 8) for m in modes]
        encode_entropy_image(bw, mode_px, mw, mh, False)
    if color_transform is not None:
        size_bits, elems = color_transform
        bw.write(1, 1)
        bw.write(1, 2)
        bw.write(size_bits - 2, 3)
        mw = -(-cur_w // (1 << size_bits))
        mh = -(-h // (1 << size_bits))
        assert len(elems) == mw * mh
        argb = _apply_color_transform(argb, cur_w, h, size_bits, elems, mw)
        elem_px = [0xFF000000 | e for e in elems]
        encode_entropy_image(bw, elem_px, mw, mh, False)
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
        argb = _apply_subtract_green(argb)
    if palette:
        colors = []
        index_of = {}
        for px in argb:
            if px not in index_of:
                index_of[px] = len(colors)
                colors.append(px)
        if len(colors) > 256:
            raise ValueError("palette fixture needs <=256 colors")
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(len(colors) - 1, 8)
        deltas = [colors[0]] + [
            _sub_px(colors[i], colors[i - 1]) for i in range(1, len(colors))
        ]
        encode_entropy_image(bw, deltas, len(colors), 1, False)
        width_bits = (3 if len(colors) <= 2 else 2 if len(colors) <= 4
                      else 1 if len(colors) <= 16 else 0)
        bits_per = 8 >> width_bits
        packed_w = -(-cur_w // (1 << width_bits))
        packed = [0] * (packed_w * h)
        for y in range(h):
            for x in range(cur_w):
                idx = index_of[argb[y * cur_w + x]]
                packed[y * packed_w + (x >> width_bits)] |= (
                    idx << ((x & ((1 << width_bits) - 1)) * bits_per)
                )
        argb = [0xFF000000 | (p << 8) for p in packed]
        cur_w = packed_w
    bw.write(0, 1)  # no more transforms
    encode_entropy_image(
        bw, argb, cur_w, h, True, cache_bits=cache_bits, backrefs=backrefs,
        meta_bits=meta_bits, use_max_symbol=use_max_symbol,
        force_normal=force_normal,
    )
    payload = b"\x2f" + bw.bytes()
    if not container:
        return payload
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
