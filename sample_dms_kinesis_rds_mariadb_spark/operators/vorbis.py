"""Ogg Vorbis sample decode — spec-derived (Vorbis I specification,
Xiph.Org), pure numpy, no codec library.

Why this decoder CAN be complete where AAC cannot (see operators/aac.py
and tools/aac_table_restatement.py): Vorbis carries its Huffman
codebooks, floor configurations, and residue configurations IN THE
STREAM (the setup header). There are no printed code tables to
restate — the only numeric constant is the floor1 inverse-dB lookup,
which is geometric (table[i] = 10^((i−255)·7/256), ratio 10^(7/256) ≈
1.06498 per step ≈ 0.5469 dB); any deviation from the spec's printed
floats is < 1e-4 relative, orders below codec quantization noise.

What is implemented, end to end (Vorbis I spec §3-§4):
- Ogg packet reassembly (lacing values, continued packets/pages);
- the LSB-first bit reader (Vorbis packs bits little-endian — the
  opposite of the MPEG readers elsewhere in this repo);
- codebook parse: ordered and unordered/sparse length lists, the
  canonical codeword assignment algorithm, scalar and VQ decode with
  lookup types 1 (multiplicative) and 2 (explicit), float32_unpack;
- floor type 1: class/partition config, Y-list decode through the
  low_neighbor/high_neighbor/render_point prediction, step2 flags,
  render_line amplitude synthesis, the inverse-dB curve. Floor type 0
  (LSP, long-deprecated; encoders stopped emitting it before 2002)
  raises a precise boundary;
- residue types 0, 1 and 2 (classword digit decode through the
  classbook, multi-pass cascades, interleaved type-2 deinterleave);
- channel coupling (square polar: magnitude/angle inverse);
- mapping type 0 (mux, submaps), mode select, blockflag;
- the spec window sin(π/2·sin²(...)) incl. the hybrid left/right
  slopes on long↔short transitions, the normalization-free IMDCT of
  §4.3.6, and half-block overlap-add with correct lapping offsets.

At scale: one payload per row inside the same Arrow ``mapInPandas``
media pass as MP3/AAC/FLAC/WAV; per-packet math vectorized in numpy.
"""

from __future__ import annotations

import numpy as np


class VorbisError(ValueError):
    """Malformed or unsupported Vorbis stream."""


# --------------------------------------------------------------------------
# LSB-first bit reader (Vorbis I §2)
# --------------------------------------------------------------------------


class LsbReader:
    """Bit cursor over an unpacked little-endian bit array (numpy
    ``unpackbits(bitorder='little')``): per-symbol costs one slice, not
    one Python iteration per bit — the residue decode hot path."""

    __slots__ = ("bits", "nbits", "pos")

    def __init__(self, data: bytes) -> None:
        # bytes of 0/1: plain-int indexing beats numpy scalar access
        # on the per-symbol hot path
        self.bits = np.unpackbits(
            np.frombuffer(data, dtype=np.uint8), bitorder="little"
        ).tobytes()
        self.nbits = len(self.bits)
        self.pos = 0

    def read(self, n: int) -> int:
        pos = self.pos
        if pos + n > self.nbits:
            raise VorbisError("bit reader ran past the packet end")
        out = 0
        bits = self.bits
        for i in range(n):
            out |= bits[pos + i] << i
        self.pos = pos + n
        return out

    def read1(self) -> int:
        pos = self.pos
        if pos >= self.nbits:
            raise VorbisError("bit reader ran past the packet end")
        self.pos = pos + 1
        return self.bits[pos]

    def peek_msb(self, n: int) -> int:
        """The next n bits packed FIRST-BIT-AS-MSB (codeword
        orientation), zero-padded past the packet end."""
        pos = self.pos
        end = min(pos + n, self.nbits)
        out = 0
        bits = self.bits
        for i in range(end - pos):
            out = (out << 1) | bits[pos + i]
        out <<= n - (end - pos)
        return out

    def eof(self) -> bool:
        return self.pos >= self.nbits


def ilog(x: int) -> int:
    """Vorbis ilog: position of the highest set bit (ilog(0) = 0)."""
    n = 0
    while x > 0:
        n += 1
        x >>= 1
    return n


def float32_unpack(x: int) -> float:
    mantissa = x & 0x1FFFFF
    exponent = (x & 0x7FE00000) >> 21
    if x & 0x80000000:
        mantissa = -mantissa
    return float(mantissa) * 2.0 ** (exponent - 788)


# --------------------------------------------------------------------------
# codebooks (§3)
# --------------------------------------------------------------------------


def _assign_codewords(lengths: list[int]) -> dict:
    """The spec's canonical assignment (§3.2.1): entries in order each
    take the LOWEST VALUED unused codeword of their length. Implemented
    from first principles with a sorted free-subtree list: a free
    subtree (depth d, prefix c) hosts a length-ln codeword iff d ≤ ln;
    claiming the leftmost leaf frees the 1-branch siblings along the
    descent. Returns {(len, code): entry}, code MSB-first (decode reads
    the stream bit-by-bit MSB-of-codeword-first). Raises on
    over-specified trees; the single-used-entry codebook gets the
    spec's special 1-bit codeword."""
    used = [i for i, ln in enumerate(lengths) if ln > 0]
    if len(used) == 1:
        return {(1, 0): used[0], "single": True}
    if not used:
        raise VorbisError("codebook with no used entries")
    # sorted by tree position: key = leftmost leaf value at depth 33
    free: list[tuple[int, int, int]] = [(0, 0, 0)]  # (key, depth, code)
    tree: dict = {}
    import bisect

    for entry, ln in enumerate(lengths):
        if ln <= 0:
            continue
        if ln > 32:
            raise VorbisError("codeword length exceeds 32")
        pick = None
        for i, (_key, d, c) in enumerate(free):
            if d <= ln:
                pick = i
                break
        if pick is None:
            raise VorbisError("over-specified codebook")
        _key, d, c = free.pop(pick)
        code = c << (ln - d)
        for j in range(d + 1, ln + 1):
            sib = (c << (j - d)) | 1
            item = (sib << (33 - j), j, sib)
            bisect.insort(free, item)
        tree[(ln, code)] = entry
    return tree


class Codebook:
    def __init__(self, br: LsbReader) -> None:
        if br.read(24) != 0x564342:
            raise VorbisError("codebook sync pattern absent")
        self.dims = br.read(16)
        self.entries = br.read(24)
        # hostile-input bombs: a 3-byte field can declare 16M entries;
        # real books are a few thousand. Cost stays O(declared size)
        # with a precise raise, never an OOM (the repo's crawl policy).
        if self.dims < 1 or self.entries < 1:
            raise VorbisError("degenerate codebook dims/entries")
        if self.entries > (1 << 20) or self.entries * self.dims > (1 << 22):
            raise VorbisError("codebook size exceeds the sanity cap")
        lengths: list[int] = []
        if br.read1():  # ordered
            cur_len = br.read(5) + 1
            cur_entry = 0
            while cur_entry < self.entries:
                num = br.read(ilog(self.entries - cur_entry))
                lengths.extend([cur_len] * num)
                cur_entry += num
                cur_len += 1
                if cur_len > 32:
                    raise VorbisError("ordered codebook length overflow")
            if cur_entry != self.entries:
                raise VorbisError("ordered codebook entry overflow")
        else:
            sparse = br.read1()
            for _ in range(self.entries):
                if sparse:
                    lengths.append(br.read(5) + 1 if br.read1() else 0)
                else:
                    lengths.append(br.read(5) + 1)
        self.lengths = lengths
        self._tree = _assign_codewords(lengths)
        self._single = bool(self._tree.pop("single", False))
        self._maxlen = max((ln for ln in lengths if ln > 0), default=0)
        # one-peek decode table: peek K bits MSB-first, index directly
        # to (entry, length); codewords longer than K (rare) fall back
        # to the bitwise walk
        K = min(self._maxlen, 10)
        self._peek_k = K
        fast = [None] * (1 << K)
        for (ln, code), ent in self._tree.items():
            if ln <= K:
                base = code << (K - ln)
                for suffix in range(1 << (K - ln)):
                    fast[base | suffix] = (ent, ln)
        self._fast = fast

        self.lookup_type = br.read(4)
        self.vq: np.ndarray | None = None
        if self.lookup_type in (1, 2):
            minimum = float32_unpack(br.read(32))
            delta = float32_unpack(br.read(32))
            value_bits = br.read(4) + 1
            sequence_p = br.read1()
            if self.lookup_type == 1:
                lookup_values = _lookup1_values(self.entries, self.dims)
            else:
                lookup_values = self.entries * self.dims
            mults = [br.read(value_bits) for _ in range(lookup_values)]
            vq = np.empty((self.entries, self.dims))
            if self.lookup_type == 1:
                for e in range(self.entries):
                    last = 0.0
                    idx_div = 1
                    for d in range(self.dims):
                        off = (e // idx_div) % lookup_values
                        v = minimum + delta * mults[off] + last
                        if sequence_p:
                            last = v
                        vq[e, d] = v
                        idx_div *= lookup_values
            else:
                for e in range(self.entries):
                    last = 0.0
                    for d in range(self.dims):
                        v = minimum + delta * mults[e * self.dims + d] \
                            + last
                        if sequence_p:
                            last = v
                        vq[e, d] = v
            self.vq = vq
        elif self.lookup_type != 0:
            raise VorbisError(f"codebook lookup type {self.lookup_type}")

    def decode_scalar(self, br: LsbReader) -> int:
        if self._single:
            br.read1()
            return self._tree[(1, 0)]
        k = self._peek_k
        hit = self._fast[br.peek_msb(k)]
        if hit is not None:
            ent, ln = hit
            if br.pos + ln > br.nbits:
                raise VorbisError("bit reader ran past the packet end")
            br.pos += ln
            return ent
        code = 0
        for ln in range(1, self._maxlen + 1):
            code = (code << 1) | br.read1()
            ent = self._tree.get((ln, code))
            if ent is not None:
                return ent
        raise VorbisError("codeword walk fell off the Huffman tree")

    def decode_vq(self, br: LsbReader) -> np.ndarray:
        if self.vq is None:
            raise VorbisError("VQ decode from a scalar-only codebook")
        return self.vq[self.decode_scalar(br)]


def _lookup1_values(entries: int, dims: int) -> int:
    """Greatest integer v with v**dims <= entries."""
    v = int(round(entries ** (1.0 / dims)))
    while v ** dims > entries:
        v -= 1
    while (v + 1) ** dims <= entries:
        v += 1
    return v


# --------------------------------------------------------------------------
# floor type 1 (§7.2.3-7.2.4)
# --------------------------------------------------------------------------

FLOOR1_RANGES = (256, 128, 86, 64)

# geometric inverse-dB lookup (see module docstring)
FLOOR1_INVERSE_DB = 10.0 ** ((np.arange(256) - 255) * (7.0 / 256.0))


class Floor1:
    def __init__(self, br: LsbReader) -> None:
        self.partitions = br.read(5)
        self.partition_class = [br.read(4) for _ in range(self.partitions)]
        max_class = max(self.partition_class, default=-1)
        self.class_dims = []
        self.class_subclasses = []
        self.class_masterbooks = []
        self.subclass_books = []
        for _ in range(max_class + 1):
            dim = br.read(3) + 1
            sub = br.read(2)
            self.class_dims.append(dim)
            self.class_subclasses.append(sub)
            self.class_masterbooks.append(br.read(8) if sub else -1)
            self.subclass_books.append(
                [br.read(8) - 1 for _ in range(1 << sub)]
            )
        self.multiplier = br.read(2) + 1
        rangebits = br.read(4)
        xs = [0, 1 << rangebits]
        for p in range(self.partitions):
            cls = self.partition_class[p]
            for _ in range(self.class_dims[cls]):
                xs.append(br.read(rangebits))
        self.x_list = xs
        if len(set(xs)) != len(xs):
            raise VorbisError("floor1 X list carries duplicates")
        if len(xs) > 65:
            raise VorbisError("floor1 X list exceeds 65 points")

    def decode(self, br: LsbReader, books: list) -> list | None:
        """The Y list (step-1 final values) or None for unused."""
        if not br.read1():
            return None
        rng = FLOOR1_RANGES[self.multiplier - 1]
        bits = ilog(rng - 1)
        ys = [br.read(bits), br.read(bits)]
        for p in range(self.partitions):
            cls = self.partition_class[p]
            cdim = self.class_dims[cls]
            cbits = self.class_subclasses[cls]
            csub = (1 << cbits) - 1
            cval = 0
            if cbits:
                cval = books[self.class_masterbooks[cls]].decode_scalar(br)
            for _ in range(cdim):
                book = self.subclass_books[cls][cval & csub]
                cval >>= cbits
                if book >= 0:
                    ys.append(books[book].decode_scalar(br))
                else:
                    ys.append(0)
        return ys

    def synthesize(self, ys: list, n_half: int) -> np.ndarray:
        """Amplitude curve over n_half bins from the decoded Y list —
        §7.2.4 steps 1 and 2."""
        rng = FLOOR1_RANGES[self.multiplier - 1]
        xs = self.x_list
        count = len(xs)
        final = [0] * count
        flags = [False] * count
        final[0], final[1] = ys[0], ys[1]
        flags[0] = flags[1] = True
        for v in range(2, count):
            low = _low_neighbor(xs, v)
            high = _high_neighbor(xs, v)
            pred = _render_point(
                xs[low], final[low], xs[high], final[high], xs[v]
            )
            val = ys[v]
            highroom = rng - pred
            lowroom = pred
            room = 2 * min(highroom, lowroom)
            if val:
                flags[low] = True
                flags[high] = True
                flags[v] = True
                if val >= room:
                    if highroom > lowroom:
                        final[v] = val - lowroom + pred
                    else:
                        final[v] = pred - (val - highroom) - 1
                else:
                    final[v] = (
                        pred - ((val + 1) >> 1) if val & 1
                        else pred + (val >> 1)
                    )
            else:
                flags[v] = False
                final[v] = pred
        # step 2: render lines between flagged points in X order
        order = sorted(range(count), key=lambda i: xs[i])
        out = np.zeros(n_half)
        hx = 0
        lx = 0
        ly = final[order[0]] * self.multiplier
        ydb = np.zeros(n_half, dtype=np.int64)
        for i in order[1:]:
            if not flags[i]:
                continue
            hy = final[i] * self.multiplier
            hx = xs[i]
            _render_line(lx, ly, hx, hy, ydb, n_half)
            lx, ly = hx, hy
        if hx < n_half:
            ydb[hx:] = ly
        np.clip(ydb, 0, 255, out=ydb)
        out[:] = FLOOR1_INVERSE_DB[ydb]
        return out


def _low_neighbor(xs: list, v: int) -> int:
    best = -1
    for i in range(v):
        if xs[i] < xs[v] and (best < 0 or xs[i] > xs[best]):
            best = i
    return best


def _high_neighbor(xs: list, v: int) -> int:
    best = -1
    for i in range(v):
        if xs[i] > xs[v] and (best < 0 or xs[i] < xs[best]):
            best = i
    return best


def _render_point(x0: int, y0: int, x1: int, y1: int, x: int) -> int:
    dy = y1 - y0
    adx = x1 - x0
    ady = abs(dy)
    err = ady * (x - x0)
    off = err // adx
    return y0 - off if dy < 0 else y0 + off


def _render_line(x0: int, y0: int, x1: int, y1: int,
                 v: np.ndarray, n: int) -> None:
    """The spec's Bresenham render — vectorized via its exact closed
    form y(x) = y0 + sign(dy)·⌊|dy|(x−x0)/adx⌋ (equality with the
    accumulated-error loop is asserted over random lines in tests)."""
    hi = min(x1, n)
    if x0 >= hi:
        if x0 < n:
            v[x0] = min(max(y0, 0), 255)
        return
    dy = y1 - y0
    adx = x1 - x0
    xs = np.arange(x0, hi)
    yy = y0 + (1 if dy >= 0 else -1) * ((abs(dy) * (xs - x0)) // adx)
    v[x0:hi] = np.clip(yy, 0, 255)


# --------------------------------------------------------------------------
# residues (§8.6)
# --------------------------------------------------------------------------


class Residue:
    def __init__(self, rtype: int, br: LsbReader) -> None:
        if rtype not in (0, 1, 2):
            raise VorbisError(f"residue type {rtype}")
        self.rtype = rtype
        self.begin = br.read(24)
        self.end = br.read(24)
        self.partition_size = br.read(24) + 1
        self.classifications = br.read(6) + 1
        self.classbook = br.read(8)
        cascades = []
        for _ in range(self.classifications):
            low = br.read(3)
            if br.read1():
                low |= br.read(5) << 3
            cascades.append(low)
        self.cascades = cascades
        self.books = []
        for c in range(self.classifications):
            row = []
            for p in range(8):
                row.append(br.read(8) if cascades[c] & (1 << p) else -1)
            self.books.append(row)

    def decode(self, br: LsbReader, books: list, do_not_decode: list,
               n_out: int) -> np.ndarray:
        """Residue vectors for the submap's channels: (ch, n_out)."""
        ch = len(do_not_decode)
        if self.rtype == 2:
            out = np.zeros((1, n_out * ch))
            if all(do_not_decode):
                return np.zeros((ch, n_out))
            self._decode_core(br, books, [False], out, n_out * ch)
            dec = np.empty((ch, n_out))
            for j in range(ch):
                dec[j] = out[0, j::ch]
            return dec
        out = np.zeros((ch, n_out))
        self._decode_core(br, books, do_not_decode, out, n_out)
        return out

    def _decode_core(self, br: LsbReader, books: list,
                     do_not_decode: list, out: np.ndarray,
                     n: int) -> None:
        classbook = books[self.classbook]
        cw = classbook.dims
        begin = min(self.begin, n)
        end = min(self.end, n)
        n_to_read = end - begin
        if n_to_read <= 0:
            return
        if n_to_read % self.partition_size:
            raise VorbisError("residue range not partition-aligned")
        parts = n_to_read // self.partition_size
        ch = out.shape[0]
        classif = np.zeros((ch, parts + cw), dtype=np.int64)
        for pass_n in range(8):
            if not any(c & (1 << pass_n) for c in self.cascades):
                continue
            pc = 0
            while pc < parts:
                if pass_n == 0:
                    for j in range(ch):
                        if do_not_decode[j]:
                            continue
                        temp = classbook.decode_scalar(br)
                        for i in range(cw - 1, -1, -1):
                            classif[j, pc + i] = \
                                temp % self.classifications
                            temp //= self.classifications
                for _i in range(cw):
                    if pc >= parts:
                        break
                    for j in range(ch):
                        if do_not_decode[j]:
                            continue
                        vq = self.books[classif[j, pc]][pass_n]
                        if vq < 0:
                            continue
                        self._decode_partition(
                            br, books[vq], out[j],
                            begin + pc * self.partition_size,
                        )
                    pc += 1

    def _decode_partition(self, br: LsbReader, book: Codebook,
                          vec: np.ndarray, offset: int) -> None:
        psize = self.partition_size
        vq = book.vq
        if vq is None:
            raise VorbisError("VQ decode from a scalar-only codebook")
        if self.rtype == 0:
            step = psize // book.dims
            for i in range(step):
                v = vq[book.decode_scalar(br)]
                vec[offset + i: offset + i + step * book.dims: step] += v
        else:  # types 1 and 2 share the sequential layout: decode the
            # partition's entry indices first, add in ONE numpy op
            ents = [
                book.decode_scalar(br)
                for _ in range(psize // book.dims)
            ]
            vec[offset: offset + psize] += vq[ents].reshape(-1)


# --------------------------------------------------------------------------
# mappings and modes (§4.2.4)
# --------------------------------------------------------------------------


class Mapping:
    def __init__(self, br: LsbReader, channels: int,
                 n_floors: int, n_residues: int) -> None:
        if br.read(16) != 0:
            raise VorbisError("mapping type must be 0")
        self.submaps = br.read(4) + 1 if br.read1() else 1
        self.coupling = []
        if br.read1():
            steps = br.read(8) + 1
            bits = ilog(channels - 1)
            for _ in range(steps):
                mag = br.read(bits)
                ang = br.read(bits)
                if mag == ang or mag >= channels or ang >= channels:
                    raise VorbisError("invalid coupling step")
                self.coupling.append((mag, ang))
        if br.read(2) != 0:
            raise VorbisError("mapping reserved bits set")
        if self.submaps > 1:
            self.mux = [br.read(4) for _ in range(channels)]
        else:
            self.mux = [0] * channels
        self.submap_floor = []
        self.submap_residue = []
        for _ in range(self.submaps):
            br.read(8)  # unused time config
            f = br.read(8)
            r = br.read(8)
            if f >= n_floors or r >= n_residues:
                raise VorbisError("mapping references missing config")
            self.submap_floor.append(f)
            self.submap_residue.append(r)


# --------------------------------------------------------------------------
# setup / stream state
# --------------------------------------------------------------------------


class VorbisStream:
    def __init__(self, id_packet: bytes, setup_packet: bytes) -> None:
        if id_packet[:7] != b"\x01vorbis":
            raise VorbisError("identification header absent")
        br = LsbReader(id_packet[7:])
        if br.read(32) != 0:
            raise VorbisError("unsupported Vorbis version")
        self.channels = br.read(8)
        self.sample_rate = br.read(32)
        br.read(96)  # bitrate fields
        bs = br.read(4), br.read(4)
        self.blocksizes = (1 << bs[0], 1 << bs[1])
        if not (64 <= self.blocksizes[0] <= self.blocksizes[1] <= 8192):
            raise VorbisError("invalid blocksizes")
        if self.blocksizes[1] > 4096:
            # the 8192 IMDCT basis is a 268 MB allocation per size; no
            # mainstream encoder emits it — documented boundary, keeps
            # the worst-case executor footprint bounded
            raise NotImplementedError(
                "Vorbis blocksize 8192 is a documented boundary "
                "(64..4096 decode for real)"
            )
        if not br.read1():
            raise VorbisError("id header framing bit unset")
        if self.channels == 0 or self.sample_rate == 0:
            raise VorbisError("zero channels or sample rate")

        if setup_packet[:7] != b"\x05vorbis":
            raise VorbisError("setup header absent")
        br = LsbReader(setup_packet[7:])
        self.codebooks = [
            Codebook(br) for _ in range(br.read(8) + 1)
        ]
        for _ in range(br.read(6) + 1):  # time transforms
            if br.read(16) != 0:
                raise VorbisError("time transform type must be 0")
        self.floors = []
        for _ in range(br.read(6) + 1):
            ftype = br.read(16)
            if ftype == 1:
                self.floors.append(Floor1(br))
            elif ftype == 0:
                raise NotImplementedError(
                    "Vorbis floor type 0 (LSP) is a documented "
                    "boundary — encoders stopped emitting it before "
                    "2002; floor 1 decodes for real"
                )
            else:
                raise VorbisError(f"floor type {ftype}")
        self.residues = []
        for _ in range(br.read(6) + 1):
            rtype = br.read(16)
            self.residues.append(Residue(rtype, br))
        self.mappings = []
        for _ in range(br.read(6) + 1):
            self.mappings.append(Mapping(
                br, self.channels, len(self.floors), len(self.residues)
            ))
        self.modes = []
        for _ in range(br.read(6) + 1):
            blockflag = br.read1()
            if br.read(16) != 0 or br.read(16) != 0:
                raise VorbisError("mode window/transform type must be 0")
            mapping = br.read(8)
            if mapping >= len(self.mappings):
                raise VorbisError("mode references missing mapping")
            self.modes.append((blockflag, mapping))
        if not br.read1():
            raise VorbisError("setup framing bit unset")

        self._win_cache: dict = {}
        self._imdct_cache = _IMDCT_BASES  # module-global: per-size
        # cosine bases are shared across payloads, never re-allocated
        # per row inside the Arrow pass
        self._prev_right: np.ndarray | None = None
        self._prev_n: int = 0

    # -- filterbank ----------------------------------------------------------

    def _slope(self, n: int) -> np.ndarray:
        """The spec window's rising slope of length n:
        sin(π/2 · sin²(π(i+0.5)/2n))."""
        if ("s", n) not in self._win_cache:
            i = np.arange(n)
            self._win_cache[("s", n)] = np.sin(
                0.5 * np.pi
                * np.sin(np.pi / (2.0 * n) * (i + 0.5)) ** 2
            )
        return self._win_cache[("s", n)]

    def _imdct(self, spec: np.ndarray) -> np.ndarray:
        """§4.3.6: y[j] = Σ_k X[k] cos(π/2n (2j+1+n/2)(2k+1)), j<n —
        no normalization factor (it lives encoder-side)."""
        n_half = len(spec)
        if n_half not in self._imdct_cache:
            n = 2 * n_half
            j = np.arange(n)[:, None]
            k = np.arange(n_half)[None, :]
            self._imdct_cache[n_half] = np.cos(
                np.pi / (2.0 * n)
                * (2.0 * j + 1.0 + n_half) * (2.0 * k + 1.0)
            )
        return self._imdct_cache[n_half] @ spec

    def decode_packet(self, packet: bytes) -> np.ndarray | None:
        """One audio packet → (channels, n_emitted) PCM in ±1, or None
        while priming (first packet)."""
        br = LsbReader(packet)
        if br.read1() != 0:
            raise VorbisError("non-audio packet in the audio sequence")
        mode_idx = br.read(ilog(len(self.modes) - 1))
        if mode_idx >= len(self.modes):
            raise VorbisError("mode number out of range")
        blockflag, mapping_idx = self.modes[mode_idx]
        mapping = self.mappings[mapping_idx]
        n = self.blocksizes[blockflag]
        prev_flag = next_flag = 1
        if blockflag:
            prev_flag = br.read1()
            next_flag = br.read1()
        n_half = n // 2

        # floors
        floor_curves: list = []
        nonzero = []
        for ch in range(self.channels):
            floor = self.floors[
                mapping.submap_floor[mapping.mux[ch]]
            ]
            ys = floor.decode(br, self.codebooks)
            nonzero.append(ys is not None)
            floor_curves.append((floor, ys))
        # coupling propagation
        for mag, ang in mapping.coupling:
            if nonzero[mag] or nonzero[ang]:
                nz = True
            else:
                nz = False
            if nz != nonzero[mag] or nz != nonzero[ang]:
                nonzero[mag] = nonzero[ang] = nz

        # residues per submap
        residue_vecs = np.zeros((self.channels, n_half))
        for sm in range(mapping.submaps):
            chans = [ch for ch in range(self.channels)
                     if mapping.mux[ch] == sm]
            dnd = [not nonzero[ch] for ch in chans]
            res = self.residues[mapping.submap_residue[sm]]
            dec = res.decode(br, self.codebooks, dnd, n_half)
            for i, ch in enumerate(chans):
                residue_vecs[ch] = dec[i]

        # inverse coupling (§4.3.5 square polar), reverse order:
        # M>0,A>0 → (M, M−A); M>0,A≤0 → (M+A, M);
        # M≤0,A>0 → (M+A, M)... no: M≤0,A>0 → (M, M+A)? The spec:
        #   if M>0: A>0 → new_A=M−A    else new_M=M+A, new_A=M
        #   else:   A>0 → new_A=M+A    else new_M=M−A, new_A=M
        for mag, ang in reversed(mapping.coupling):
            m = residue_vecs[mag].copy()
            a = residue_vecs[ang].copy()
            new_m = np.where(
                m > 0,
                np.where(a > 0, m, m + a),
                np.where(a > 0, m, m - a),
            )
            new_a = np.where(
                m > 0,
                np.where(a > 0, m - a, m),
                np.where(a > 0, m + a, m),
            )
            residue_vecs[mag] = new_m
            residue_vecs[ang] = new_a

        # floor curve × residue → spectrum, IMDCT, window
        frame = np.zeros((self.channels, n))
        for ch in range(self.channels):
            if not nonzero[ch]:
                continue
            floor, ys = floor_curves[ch]
            if ys is None:
                continue
            curve = floor.synthesize(ys, n_half)
            spec = curve * residue_vecs[ch]
            t = self._imdct(spec)
            frame[ch] = t
        win = self._window(n, prev_flag, next_flag)
        frame *= win

        # overlap-add (§4.3.8): emit from the center of the previous
        # window to the center of this one — prev_n/4 + n/4 samples.
        # With unequal blocksizes the clipped regions are exactly the
        # zero-padded window flanks, so the emission is lossless.
        if self._prev_right is None:
            self._prev_right = frame[:, n_half:].copy()
            self._prev_n = n
            return None
        prev_right = self._prev_right
        prev_n = self._prev_n
        left = frame[:, :n_half]
        emit = prev_n // 4 + n // 4
        buf = np.zeros((self.channels, emit))
        m = min(prev_n // 2, emit)
        buf[:, :m] += prev_right[:, :m]
        skip = max(0, n_half - emit)       # prev short, cur long
        off = max(0, emit - n_half)        # prev long, cur short
        buf[:, off:] += left[:, skip:]
        self._prev_right = frame[:, n_half:].copy()
        self._prev_n = n
        return buf

    def _window(self, n: int, prev_flag: int, next_flag: int) -> np.ndarray:
        key = (n, prev_flag, next_flag)
        if key not in self._win_cache:
            short_n = self.blocksizes[0]
            w = np.ones(n)
            left_n = n // 2 if prev_flag else short_n // 2
            right_n = n // 2 if next_flag else short_n // 2
            # left slope centered on n/4, right slope centered on 3n/4
            ls = self._slope(left_n)
            rs = self._slope(right_n)
            left_start = n // 4 - left_n // 2
            w[:left_start] = 0.0
            w[left_start: left_start + left_n] = ls
            right_start = 3 * n // 4 - right_n // 2
            w[right_start: right_start + right_n] = rs[::-1]
            w[right_start + right_n:] = 0.0
            self._win_cache[key] = w
        return self._win_cache[key]


_IMDCT_BASES: dict[int, np.ndarray] = {}


# --------------------------------------------------------------------------
# Ogg packet reassembly + the public decode
# --------------------------------------------------------------------------


def ogg_packets(content: bytes, serial: int | None = None):
    """Yield complete logical packets of one stream (the first bos
    stream when serial is None), reassembling lacing segments across
    pages (255 ⇒ continue; continued-packet pages append)."""
    pos = 0
    want: int | None = serial
    partial = b""
    while pos + 27 <= len(content):
        if content[pos: pos + 4] != b"OggS":
            raise VorbisError(f"bad Ogg capture pattern at {pos}")
        header_type = content[pos + 5]
        page_serial = int.from_bytes(content[pos + 14: pos + 18],
                                     "little")
        nsegs = content[pos + 26]
        seg_table = content[pos + 27: pos + 27 + nsegs]
        if len(seg_table) < nsegs:
            raise VorbisError("truncated Ogg segment table")
        body = pos + 27 + nsegs
        if want is None and header_type & 0x02:
            want = page_serial
        take = page_serial == want
        if take and not (header_type & 0x01):
            partial = b""
        off = body
        for lace in seg_table:
            seg = content[off: off + lace]
            if len(seg) < lace:
                raise VorbisError("truncated Ogg page payload")
            off += lace
            if take:
                partial += seg
                if lace < 255:
                    yield partial
                    partial = b""
        pos = off


def decode_vorbis_samples(
    content: bytes,
) -> tuple[int, int, np.ndarray]:
    """(sample_rate, channels, float64 PCM in ±32768, interleaved) for
    the first Vorbis stream of an Ogg payload."""
    packets = []
    stream: VorbisStream | None = None
    pcm_chunks: list[np.ndarray] = []
    for pkt in ogg_packets(content):
        if stream is None:
            packets.append(pkt)
            if len(packets) == 3:
                if packets[1][:7] != b"\x03vorbis":
                    raise VorbisError("comment header absent")
                stream = VorbisStream(packets[0], packets[2])
            continue
        if not pkt:
            continue
        out = stream.decode_packet(pkt)
        if out is not None:
            pcm_chunks.append(out)
    if stream is None:
        raise VorbisError("Ogg payload carries no full Vorbis headers")
    if not pcm_chunks:
        raise VorbisError("no audio packets decoded")
    pcm = np.concatenate(pcm_chunks, axis=1)
    ch = stream.channels
    if ch == 1:
        inter = pcm[0]
    else:
        inter = np.empty(pcm.shape[1] * ch)
        for c in range(ch):
            inter[c::ch] = pcm[c]
    return stream.sample_rate, ch, inter * 32768.0
