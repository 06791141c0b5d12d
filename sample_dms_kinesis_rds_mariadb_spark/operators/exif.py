"""EXIF orientation + ICC-profile presence for JPEG and TIFF — the two
metadata fields multimodal curation filters on without a pixel decode
(rotated images need transposing before training; CMYK/wide-gamut ICC
images need color conversion). Both containers already parse in-repo
(``operators/jpeg.py`` walks APP markers, ``operators/tiff.py`` walks
IFDs); this module reads ONLY the metadata:

- JPEG: EXIF rides APP1 (``Exif\\0\\0`` + an embedded TIFF block whose
  IFD0 tag 274 is orientation); ICC rides APP2 (``ICC_PROFILE\\0``,
  possibly split across several APP2 segments).
- TIFF: orientation is tag 274 of IFD0; an embedded ICC profile is tag
  34675.

Orientation values are the TIFF/EXIF standard 1..8 (1 = upright,
3 = 180°, 6/8 = 90° rotations, 2/4/5/7 mirrored); ``None`` = not
recorded. The IFD walker here is deliberately independent of
``tiff.py``'s (:func:`tiff._read_ifd` skips tags whose TYPE it does not
decode — fine for pixel decode, wrong for "is tag 34675 PRESENT", which
must see type-7 UNDEFINED entries)."""

from __future__ import annotations

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def _ifd0_tags(block: bytes) -> dict[int, tuple[int, int, bytes]]:
    """IFD0 of a TIFF block → {tag: (type, count, value_or_offset_bytes)}.
    Presence-preserving: every well-formed entry is recorded whatever its
    type. Raises ValueError on a malformed block."""
    if len(block) < 8:
        raise ValueError("EXIF/TIFF: truncated header")
    if block[:2] == b"II":
        bo = "little"
    elif block[:2] == b"MM":
        bo = "big"
    else:
        raise ValueError("EXIF/TIFF: bad byte-order mark")
    if int.from_bytes(block[2:4], bo) != 42:
        raise ValueError("EXIF/TIFF: bad magic")
    pos = int.from_bytes(block[4:8], bo)
    if pos + 2 > len(block):
        raise ValueError("EXIF/TIFF: IFD offset out of bounds")
    n = int.from_bytes(block[pos : pos + 2], bo)
    if pos + 2 + 12 * n > len(block):
        raise ValueError("EXIF/TIFF: truncated IFD")
    tags: dict[int, tuple[int, int, bytes]] = {}
    for k in range(n):
        ep = pos + 2 + 12 * k
        tag = int.from_bytes(block[ep : ep + 2], bo)
        typ = int.from_bytes(block[ep + 2 : ep + 4], bo)
        cnt = int.from_bytes(block[ep + 4 : ep + 8], bo)
        tags[tag] = (typ, cnt, block[ep + 8 : ep + 12])
    tags["__bo__"] = bo  # type: ignore[index]
    return tags


def _short_value(tags: dict, tag: int) -> int | None:
    """First SHORT/LONG value of ``tag`` (inline values only — orientation
    always fits inline), else None."""
    ent = tags.get(tag)
    if ent is None:
        return None
    typ, cnt, val = ent
    bo = tags["__bo__"]
    if typ == 3 and cnt >= 1:
        return int.from_bytes(val[:2], bo)
    if typ == 4 and cnt >= 1:
        return int.from_bytes(val[:4], bo)
    return None


def tiff_orientation_icc(content: bytes) -> tuple[int | None, bool]:
    """(orientation, has_icc_profile) from a TIFF file's IFD0."""
    tags = _ifd0_tags(bytes(content))
    ori = _short_value(tags, 274)
    if ori is not None and not 1 <= ori <= 8:
        ori = None  # out-of-spec value: treat as unrecorded
    return ori, 34675 in tags


def jpeg_orientation_icc(content: bytes) -> tuple[int | None, bool]:
    """(orientation, has_icc_profile) from a JPEG's APP1/APP2 markers —
    a pure marker walk, no entropy decode. Stops at SOS (metadata
    precedes scan data by spec)."""
    content = bytes(content)
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    ori: int | None = None
    has_icc = False
    i = 2
    n = len(content)
    while i + 4 <= n:
        if content[i] != 0xFF:
            raise ValueError(f"JPEG: expected marker at offset {i}")
        marker = content[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker in (0xD9, 0xDA):  # EOI / SOS: no metadata past here
            break
        seg_len = int.from_bytes(content[i + 2 : i + 4], "big")
        payload = content[i + 4 : i + 2 + seg_len]
        if marker == 0xE1 and payload[:6] == b"Exif\x00\x00" and ori is None:
            try:
                tags = _ifd0_tags(payload[6:])
                v = _short_value(tags, 274)
                if v is not None and 1 <= v <= 8:
                    ori = v
            except ValueError:
                pass  # malformed EXIF: fall through, image still usable
        elif marker == 0xE2 and payload[:12] == b"ICC_PROFILE\x00":
            has_icc = True
        i += 2 + seg_len
    return ori, has_icc


def image_orientation_icc(content: bytes) -> tuple[int | None, bool]:
    """Container dispatch: JPEG and TIFF carry the metadata; every other
    format (PNM/BMP/PNG/GIF here) has no EXIF notion → (None, False).
    Malformed metadata inside a decodable image degrades to (None, False)
    rather than failing the feature row."""
    content = bytes(content) if content else b""
    try:
        if content[:2] == b"\xff\xd8":
            return jpeg_orientation_icc(content)
        if content[:2] in (b"II", b"MM"):
            return tiff_orientation_icc(content)
    except ValueError:
        pass
    return None, False
