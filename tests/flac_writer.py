"""Test-side FLAC ENCODER — an INDEPENDENT implementation of the FLAC
format (written from RFC 9639 / the format spec, not from the decoder
under test): STREAMINFO with the decoded-audio MD5, frame headers with
UTF-8-coded frame numbers and CRC-8, CONSTANT / VERBATIM / FIXED / LPC
subframes, Rice-coded residuals with partition orders and escape
partitions, wasted-bits, stereo decorrelation modes, frame CRC-16.
FLAC is lossless, so any conforming decoder must reproduce the input
samples BIT-FOR-BIT — the same independent-writer oracle pattern as
tests/gif_writer.py and tests/tiff_writer.py."""

from __future__ import annotations

import hashlib


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, v: int, n: int) -> None:
        if n and not 0 <= v < (1 << n):
            raise ValueError(f"value {v} does not fit in {n} bits")
        self._acc = (self._acc << n) | v
        self._n += n
        while self._n >= 8:
            self._n -= 8
            self.buf.append((self._acc >> self._n) & 0xFF)
        self._acc &= (1 << self._n) - 1

    def write_signed(self, v: int, n: int) -> None:
        self.write(v & ((1 << n) - 1), n)

    def unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a 1

    def align(self) -> None:
        if self._n:
            self.write(0, 8 - self._n)

    def bytes(self) -> bytes:
        if self._n:
            raise ValueError("unaligned")
        return bytes(self.buf)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07 if crc & 0x80 else crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005 if crc & 0x8000 else crc << 1) & 0xFFFF
    return crc


def _utf8_encode(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (6 * (nbytes - 1) + (7 - nbytes))):
        nbytes += 1
    head = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(head | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


_SS_CODES = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else (-(v << 1) - 1)


def _best_rice_param(res: list[int], plen: int) -> int:
    best, best_cost = 0, None
    for p in range((1 << plen) - 1):
        cost = sum((_zigzag(r) >> p) + 1 + p for r in res)
        if best_cost is None or cost < best_cost:
            best, best_cost = p, cost
    return best


def _write_residual(
    bw: _BitWriter,
    res: list[int],
    block_size: int,
    pred_order: int,
    partition_order: int = 0,
    method: int = 0,
    escape_bits: int | None = None,
) -> None:
    plen = 4 if method == 0 else 5
    bw.write(method, 2)
    bw.write(partition_order, 4)
    nparts = 1 << partition_order
    taken = 0
    for part in range(nparts):
        n = (block_size >> partition_order) - (pred_order if part == 0 else 0)
        chunk = res[taken : taken + n]
        taken += n
        if escape_bits is not None:
            bw.write((1 << plen) - 1, plen)  # escape code
            bw.write(escape_bits, 5)
            for r in chunk:
                if escape_bits:
                    bw.write_signed(r, escape_bits)
        else:
            p = _best_rice_param(chunk, plen)
            bw.write(p, plen)
            for r in chunk:
                u = _zigzag(r)
                bw.unary(u >> p)
                if p:
                    bw.write(u & ((1 << p) - 1), p)
    assert taken == len(res)


def _write_subframe(
    bw: _BitWriter,
    samples: list[int],
    bps: int,
    kind: str,
    order: int = 2,
    wasted: int = 0,
    partition_order: int = 0,
    method: int = 0,
    escape_bits: int | None = None,
    lpc_coefs: list[int] | None = None,
    lpc_shift: int = 0,
) -> None:
    bw.write(0, 1)  # padding bit
    if kind == "constant":
        bw.write(0, 6)
    elif kind == "verbatim":
        bw.write(1, 6)
    elif kind == "fixed":
        bw.write(8 + order, 6)
    elif kind == "lpc":
        bw.write(32 | (order - 1), 6)
    else:
        raise ValueError(kind)
    if wasted:
        bw.write(1, 1)
        bw.unary(wasted - 1)
        if any(s & ((1 << wasted) - 1) for s in samples):
            raise ValueError("samples lack the declared wasted zero bits")
        samples = [s >> wasted for s in samples]
    else:
        bw.write(0, 1)
    eff = bps - wasted
    if kind == "constant":
        if any(s != samples[0] for s in samples):
            raise ValueError("constant subframe with non-constant samples")
        bw.write_signed(samples[0], eff)
        return
    if kind == "verbatim":
        for s in samples:
            bw.write_signed(s, eff)
        return
    coefs = _FIXED_COEFS[order] if kind == "fixed" else list(lpc_coefs)
    shift = 0 if kind == "fixed" else lpc_shift
    for s in samples[:order]:
        bw.write_signed(s, eff)
    if kind == "lpc":
        prec = max(
            (abs(c) + (1 if c >= 0 else 0)).bit_length() + 1 for c in coefs
        )
        prec = max(prec, 2)
        bw.write(prec - 1, 4)
        bw.write(shift, 5)  # non-negative: plain 5 bits
        for c in coefs:
            bw.write_signed(c, prec)
    res = []
    for i in range(order, len(samples)):
        pred = sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
        res.append(samples[i] - (pred >> shift))
    _write_residual(
        bw, res, len(samples), order, partition_order, method, escape_bits
    )


def write_flac(
    channels: list[list[int]],
    sample_rate: int = 8000,
    bps: int = 16,
    block_size: int = 192,
    stereo: str = "independent",
    subframe: str = "fixed",
    order: int = 2,
    wasted: int = 0,
    partition_order: int = 0,
    method: int = 0,
    escape_bits: int | None = None,
    lpc_coefs: list[int] | None = None,
    lpc_shift: int = 0,
) -> bytes:
    """Encode per-channel sample lists to a complete FLAC stream.

    ``stereo``: independent | left_side | right_side | mid_side (the
    decorrelated channel gets bps+1 bits, per the spec)."""
    n_ch = len(channels)
    total = len(channels[0])
    if any(len(c) != total for c in channels):
        raise ValueError("channels must be equal length")
    # STREAMINFO
    md5_raw = bytearray()
    width = bps // 8 if bps % 8 == 0 else None
    for i in range(total):
        for c in range(n_ch):
            if width:
                md5_raw += int(channels[c][i]).to_bytes(
                    width, "little", signed=True
                )
    md5 = hashlib.md5(bytes(md5_raw)).digest() if width else b"\x00" * 16
    info = _BitWriter()
    info.write(block_size, 16)  # min block size
    info.write(block_size, 16)  # max block size
    info.write(0, 24)  # min frame size (unknown)
    info.write(0, 24)  # max frame size (unknown)
    info.write(sample_rate, 20)
    info.write(n_ch - 1, 3)
    info.write(bps - 1, 5)
    info.write(total, 36)
    body = info.bytes() + md5
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body  # last block
    # frames
    frame_no = 0
    for start in range(0, total, block_size):
        bs = min(block_size, total - start)
        chunk = [c[start : start + bs] for c in channels]
        bw = _BitWriter()
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocking strategy
        bw.write(7, 4)  # block size: 16-bit at end of header
        bw.write(0, 4)  # sample rate: from STREAMINFO
        if stereo == "independent" or n_ch != 2:
            chan_code = n_ch - 1
            subs = chunk
            sizes = [bps] * n_ch
        elif stereo == "left_side":
            chan_code = 8
            subs = [chunk[0], [l - r for l, r in zip(chunk[0], chunk[1])]]
            sizes = [bps, bps + 1]
        elif stereo == "right_side":
            chan_code = 9
            subs = [[l - r for l, r in zip(chunk[0], chunk[1])], chunk[1]]
            sizes = [bps + 1, bps]
        elif stereo == "mid_side":
            chan_code = 10
            mid = [(l + r) >> 1 for l, r in zip(chunk[0], chunk[1])]
            side = [l - r for l, r in zip(chunk[0], chunk[1])]
            subs = [mid, side]
            sizes = [bps, bps + 1]
        else:
            raise ValueError(stereo)
        bw.write(chan_code, 4)
        bw.write(_SS_CODES[bps], 3)
        bw.write(0, 1)  # reserved
        for b in _utf8_encode(frame_no):
            bw.write(b, 8)
        bw.write(bs - 1, 16)
        hdr = bw.bytes()
        bw2 = _BitWriter()
        for b in hdr:
            bw2.write(b, 8)
        bw2.write(_crc8(hdr), 8)
        for i, sub in enumerate(subs):
            _write_subframe(
                bw2, sub, sizes[i], subframe, order=order, wasted=wasted,
                partition_order=partition_order, method=method,
                escape_bits=escape_bits, lpc_coefs=lpc_coefs,
                lpc_shift=lpc_shift,
            )
        bw2.align()
        frame = bw2.bytes()
        out += frame + _crc16(frame).to_bytes(2, "big")
        frame_no += 1
    return bytes(out)
