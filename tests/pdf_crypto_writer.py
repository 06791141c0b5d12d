"""INDEPENDENT spec-derived ENCRYPTING PDF writer — the adversarial
fixture builder for ``sources/pdf_crypto.py`` (the established
independent-writer pattern: pdf_writer, mp3_writer, flac_writer...).

Implements the WRITE direction of ISO 32000-1 §7.6.3 / ISO 32000-2
§7.6.4: Algorithm 3 (/O), Algorithms 4/5 (/U), Algorithm 2 (file key)
for RC4-40/128 and AES-128 (/AESV2), and the R5/R6 AES-256 layouts
(/U /UE /O /OE). The AES core here is a from-scratch INT-based
implementation (byte lists, extended-Euclid inverse for the S-box) —
deliberately a different construction from the reader's numpy
table-vectorized cipher, so the two can only agree by both matching
FIPS-197. No code is shared with the reader.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

# -- independent AES (FIPS-197, int/list based) ----------------------------


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _mul(a: int, b: int) -> int:
    out = 0
    while b:
        if b & 1:
            out ^= a
        a = _xtime(a)
        b >>= 1
    return out


def _poly_inverse(a: int) -> int:
    """Multiplicative inverse in GF(2^8) by brute scan (writer-side
    one-time table build; 256*256 products)."""
    if a == 0:
        return 0
    for b in range(1, 256):
        if _mul(a, b) == 1:
            return b
    raise AssertionError


_SBOX = []
for _a in range(256):
    _q = _poly_inverse(_a)
    _b = 0
    for _i in range(8):
        _bit = (
            (_q >> _i) ^ (_q >> ((_i + 4) % 8)) ^ (_q >> ((_i + 5) % 8))
            ^ (_q >> ((_i + 6) % 8)) ^ (_q >> ((_i + 7) % 8))
            ^ (0x63 >> _i)
        ) & 1
        _b |= _bit << _i
    _SBOX.append(_b)

_RCON = [1]
while len(_RCON) < 14:
    _RCON.append(_xtime(_RCON[-1]))


def _expand_key(key: bytes) -> list[list[int]]:
    nk = len(key) // 4
    nr = nk + 6
    w = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = [_SBOX[t[1]] ^ _RCON[i // nk - 1], _SBOX[t[2]],
                 _SBOX[t[3]], _SBOX[t[0]]]
        elif nk == 8 and i % nk == 4:
            t = [_SBOX[x] for x in t]
        w.append([x ^ y for x, y in zip(w[i - nk], t)])
    return [sum(w[4 * r : 4 * r + 4], []) for r in range(nr + 1)]


_MUL2 = [_xtime(a) for a in range(256)]
_MUL3 = [a ^ _xtime(a) for a in range(256)]
# ShiftRows on column-major flat state: new[4c+r] = old[4((c+r)%4)+r]
_SHIFT = [4 * ((c + r) % 4) + r for c in range(4) for r in range(4)]


def _encrypt_block(rks: list[list[int]], block: bytes) -> bytes:
    st = [b ^ k for b, k in zip(block, rks[0])]
    nr = len(rks) - 1
    for rnd in range(1, nr + 1):
        st = [_SBOX[st[i]] for i in _SHIFT]
        if rnd < nr:
            out = []
            for c in range(4):
                a0, a1, a2, a3 = st[4 * c : 4 * c + 4]
                out += [
                    _MUL2[a0] ^ _MUL3[a1] ^ a2 ^ a3,
                    a0 ^ _MUL2[a1] ^ _MUL3[a2] ^ a3,
                    a0 ^ a1 ^ _MUL2[a2] ^ _MUL3[a3],
                    _MUL3[a0] ^ a1 ^ a2 ^ _MUL2[a3],
                ]
            st = out
        st = [x ^ k for x, k in zip(st, rks[rnd])]
    return bytes(st)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes,
                    pad: bool = True) -> bytes:
    if pad:
        n = 16 - len(data) % 16
        data += bytes([n]) * n
    rks = _expand_key(key)
    prev = iv
    out = bytearray()
    for i in range(0, len(data), 16):
        prev = _encrypt_block(
            rks, bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        )
        out += prev
    return bytes(out)


def rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    i = j = 0
    out = bytearray()
    for c in data:
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out.append(c ^ s[(s[i] + s[j]) & 0xFF])
    return bytes(out)


# -- standard security handler, write direction ----------------------------

PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E,
    0x56, 0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68,
    0x3E, 0x80, 0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


def _pad_pw(pw: bytes) -> bytes:
    return (pw + PAD)[:32]


def _alg3_owner(owner_pw: bytes, user_pw: bytes, n: int, r: int) -> bytes:
    h = hashlib.md5(_pad_pw(owner_pw)).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    key = h[:n]
    o = rc4(key, _pad_pw(user_pw))
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def _alg2_filekey(user_pw: bytes, o: bytes, p: int, id0: bytes,
                  n: int, r: int) -> bytes:
    md = hashlib.md5()
    md.update(_pad_pw(user_pw))
    md.update(o[:32])
    md.update(struct.pack("<I", p & 0xFFFFFFFF))
    md.update(id0)
    key = md.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    return key[:n]


def _alg45_u(key: bytes, id0: bytes, r: int) -> bytes:
    if r == 2:
        return rc4(key, PAD)
    x = hashlib.md5(PAD + id0).digest()
    x = rc4(key, x)
    for i in range(1, 20):
        x = rc4(bytes(b ^ i for b in key), x)
    return x + b"\x00" * 16  # 32-byte /U; trailing half arbitrary (R>=3)


def _hash_2b(pw: bytes, salt: bytes, udata: bytes) -> bytes:
    k = hashlib.sha256(pw + salt + udata).digest()
    i = 0
    while True:
        k1 = (pw + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1, pad=False)
        k = {0: hashlib.sha256, 1: hashlib.sha384,
             2: hashlib.sha512}[sum(e[:16]) % 3](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def _rand(seed: int, label: bytes, n: int) -> bytes:
    out = b""
    c = 0
    while len(out) < n:
        out += hashlib.sha256(b"%d:%b:%d" % (seed, label, c)).digest()
        c += 1
    return out[:n]


def write_encrypted_pdf(
    lines: list[str],
    variant: str = "rc4-128",      # rc4-40 | rc4-128 | rc4-128-v4 |
                                   # aes-128 | aes-256 | aes-256-r5
    user_pw: bytes = b"",
    owner_pw: bytes = b"fixture-owner",
    seed: int = 7,
    info_title: str | None = None,
    strf_identity: bool = False,
    declared_length_bits: int | None = None,
) -> bytes:
    """A single-page encrypted PDF: Flate content stream + optional
    /Info /Title string, classic xref, /Encrypt as an indirect object
    (its /O //U strings must NOT be decrypted by readers)."""
    p = -4 & 0xFFFFFFFF  # all permission bits of interest granted
    id0 = _rand(seed, b"id", 16)

    if variant == "rc4-40":
        v, r, n, length = 1, 2, 5, 40
    elif variant == "rc4-128":
        v, r, n, length = 2, 3, 16, 128
    elif variant == "rc4-128-v4":
        v, r, n, length = 4, 4, 16, 128  # V4 crypt filter, /CFM /V2
    elif variant == "aes-128":
        v, r, n, length = 4, 4, 16, 128
    elif variant == "aes-256":
        v, r, n, length = 5, 6, 32, 256
    elif variant == "aes-256-r5":
        v, r, n, length = 5, 5, 32, 256
    else:
        raise ValueError(variant)

    extra = b""
    if v < 5:
        o = _alg3_owner(owner_pw, user_pw, n, r)
        fkey = _alg2_filekey(user_pw, o, p, id0, n, r)
        u = _alg45_u(fkey, id0, r)
    else:
        fkey = _rand(seed, b"filekey", 32)
        vs, ks = _rand(seed, b"vs", 8), _rand(seed, b"ks", 8)
        ovs, oks = _rand(seed, b"ovs", 8), _rand(seed, b"oks", 8)
        hsh = _hash_2b if r == 6 else (
            lambda pw, salt, ud: hashlib.sha256(pw + salt).digest()
        )
        u = hsh(user_pw, vs, b"") + vs + ks
        ue = aes_cbc_encrypt(hsh(user_pw, ks, b""), b"\x00" * 16,
                             fkey, pad=False)
        o = hsh(owner_pw, ovs, u) + ovs + oks
        oe = aes_cbc_encrypt(hsh(owner_pw, oks, u), b"\x00" * 16,
                             fkey, pad=False)
        extra = (
            b"/UE <" + ue.hex().encode() + b"> /OE <" + oe.hex().encode()
            + b"> "
        )

    aes = variant.startswith("aes")

    def objkey(num: int) -> bytes:
        if v == 5:
            return fkey
        md = hashlib.md5()
        md.update(fkey + struct.pack("<I", num)[:3] + b"\x00\x00")
        if aes:
            md.update(b"sAlT")
        return md.digest()[: min(n + 5, 16)]

    def enc_bytes(num: int, data: bytes) -> bytes:
        if aes:
            iv = _rand(seed, b"iv%d" % num, 16)
            return iv + aes_cbc_encrypt(objkey(num), iv, data)
        return rc4(objkey(num), data)

    def enc_str(num: int, s: bytes) -> bytes:
        if strf_identity and v in (4, 5):
            return b"<" + s.hex().encode() + b">"  # /StrF /Identity
        return b"<" + enc_bytes(num, s).hex().encode() + b">"

    content = b"BT /F1 12 Tf 72 720 Td " + b" 0 -14 Td ".join(
        b"(" + ln.encode("latin-1").replace(b"\\", b"\\\\")
        .replace(b"(", b"\\(").replace(b")", b"\\)") + b") Tj"
        for ln in lines
    ) + b" ET"
    body = enc_bytes(4, zlib.compress(content))

    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
        4: (b"<< /Filter /FlateDecode /Length %d >>\nstream\n" % len(body)
            + body + b"\nendstream"),
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    if v < 5:
        # declared_length_bits lets a test write a V4 file whose real key
        # size lives ONLY in the crypt filter's /Length (a shape real
        # producers emit); derivation above still uses the true n.
        decl = declared_length_bits if declared_length_bits else length
        encd = (b"<< /Filter /Standard /V %d /R %d /Length %d "
                b"/P %d " % (v, r, decl, p - (1 << 32)))
        if v == 4:
            strf = b"/Identity" if strf_identity else b"/StdCF"
            encd += (b"/CF << /StdCF << /CFM /%s /Length %d >> >> "
                     b"/StmF /StdCF /StrF " % (b"AESV2" if aes else b"V2", n)
                     + strf + b" ")
    else:
        strf = b"/Identity" if strf_identity else b"/StdCF"
        encd = (b"<< /Filter /Standard /V 5 /R %d /Length 256 /P %d "
                b"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
                b"/StmF /StdCF /StrF " % (r, p - (1 << 32)) + strf + b" ")
    encd += (b"/O <" + o.hex().encode() + b"> /U <" + u.hex().encode()
             + b"> " + extra + b">>")
    objects[6] = encd
    if info_title is not None:
        objects[7] = (b"<< /Title "
                      + enc_str(7, info_title.encode("latin-1")) + b" >>")

    out = bytearray(b"%PDF-1.6\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objects[num] + b"\nendobj\n"
    size = max(objects) + 1
    xref_pos = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % size
    for num in range(1, size):
        out += b"%010d 00000 n \n" % offsets.get(num, 0)
    trailer = (b"<< /Size %d /Root 1 0 R /Encrypt 6 0 R /ID [<%s> <%s>]"
               % (size, id0.hex().encode(), id0.hex().encode()))
    if info_title is not None:
        trailer += b" /Info 7 0 R"
    trailer += b" >>"
    out += (b"trailer\n" + trailer + b"\nstartxref\n%d\n%%%%EOF\n"
            % xref_pos)
    return bytes(out)
