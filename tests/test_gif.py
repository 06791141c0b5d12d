"""GIF decode (operators/gif.py) vs the INDEPENDENT spec-derived writer
in tests/gif_writer.py — GIF is lossless, so every check is EXACT pixel
bytes: LZW round trips across dictionary-width boundaries, interlacing,
local palettes, transparency (RGBA), animation compositing with all
three disposal methods, and the decode_image / resize_image dispatch."""

import random

import numpy as np
import pytest

from sample_dms_kinesis_rds_mariadb_spark.operators.gif import (
    decode_gif,
    gif_frame_count,
    gif_header,
    parse_gif,
)
from sample_dms_kinesis_rds_mariadb_spark.operators.multimodal import (
    decode_image,
    extract_image_features,
    resize_image,
)
from tests.gif_writer import write_gif


def _palette(n, seed=0):
    rng = random.Random(seed)
    return bytes(rng.randrange(256) for _ in range(n * 3))


def _indices(w, h, n, seed=1):
    rng = random.Random(seed)
    return bytes(rng.randrange(n) for _ in range(w * h))


def _rgb(indices, palette, w, h):
    pal = np.frombuffer(palette, np.uint8).reshape(-1, 3)
    idx = np.frombuffer(indices, np.uint8).reshape(h, w)
    return pal[idx].tobytes()


def test_gif_basic_roundtrip_exact():
    w, h, n = 37, 23, 16
    pal = _palette(n)
    idx = _indices(w, h, n)
    blob = write_gif([{"indices": idx}], w, h, pal)
    gw, gh, gc, px = decode_gif(blob)
    assert (gw, gh, gc) == (w, h, 3)
    assert px == _rgb(idx, pal, w, h)
    assert gif_header(blob) == (w, h, 3)
    assert decode_image(blob) == (w, h, 3, "gif")


def test_gif_wide_image_crosses_code_widths():
    # enough pixels to push the LZW dictionary past 512/1024/2048/4096
    w, h, n = 200, 150, 256
    pal = _palette(n, seed=2)
    idx = _indices(w, h, n, seed=3)
    blob = write_gif([{"indices": idx}], w, h, pal)
    assert decode_gif(blob)[3] == _rgb(idx, pal, w, h)


def test_gif_interlaced_matches_sequential():
    w, h, n = 29, 19, 8
    pal = _palette(n, seed=4)
    idx = _indices(w, h, n, seed=5)
    plain = write_gif([{"indices": idx}], w, h, pal)
    inter = write_gif([{"indices": idx, "interlace": True}], w, h, pal)
    assert plain != inter
    assert decode_gif(inter)[3] == decode_gif(plain)[3]


def test_gif_transparency_yields_rgba():
    w, h, n = 10, 6, 4
    pal = _palette(n, seed=6)
    idx = _indices(w, h, n, seed=7)
    blob = write_gif([{"indices": idx, "transparent": 2}], w, h, pal)
    gw, gh, gc, px = decode_gif(blob)
    assert gc == 4
    assert gif_header(blob) == (w, h, 4)
    arr = np.frombuffer(px, np.uint8).reshape(h, w, 4)
    ia = np.frombuffer(idx, np.uint8).reshape(h, w)
    assert (arr[..., 3] == np.where(ia == 2, 0, 255)).all()
    # opaque pixels carry palette colors; transparent ones are cleared
    pal_arr = np.frombuffer(pal, np.uint8).reshape(-1, 3)
    assert (arr[ia != 2][:, :3] == pal_arr[ia[ia != 2]]).all()
    assert (arr[ia == 2] == 0).all()


def test_gif_local_palette_overrides_global():
    w, h, n = 8, 8, 4
    gpal = _palette(n, seed=8)
    lpal = _palette(n, seed=9)
    idx = _indices(w, h, n, seed=10)
    blob = write_gif(
        [{"indices": idx, "local_palette": lpal}], w, h, gpal
    )
    assert decode_gif(blob)[3] == _rgb(idx, lpal, w, h)


def test_gif_animation_compositing_and_disposal():
    w, h, n = 12, 10, 8
    pal = _palette(n, seed=11)
    base = _indices(w, h, n, seed=12)
    patch = _indices(4, 3, n, seed=13)
    frames = [
        {"indices": base, "disposal": 1},  # keep
        {  # partial frame over the kept canvas
            "indices": patch,
            "left": 5,
            "top": 4,
            "width": 4,
            "height": 3,
            "disposal": 2,  # then restore background (transparent)
            "transparent": None,
        },
        {"indices": patch, "left": 0, "top": 0, "width": 4, "height": 3},
    ]
    blob = write_gif(frames, w, h, pal)
    assert gif_frame_count(blob) == 3
    pal_arr = np.frombuffer(pal, np.uint8).reshape(-1, 3)
    base_arr = pal_arr[np.frombuffer(base, np.uint8).reshape(h, w)]
    # frame 0: just the base
    assert decode_gif(blob, frame=0)[3] == base_arr.tobytes()
    # frame 1: base with the patch composited at (5,4)
    want1 = base_arr.copy()
    want1[4:7, 5:9] = pal_arr[np.frombuffer(patch, np.uint8).reshape(3, 4)]
    assert decode_gif(blob, frame=1)[3] == want1.tobytes()
    # frame 2: frame 1's rect was disposed to background (cleared), the
    # rest of the base survives, new patch lands at (0,0)
    want2 = base_arr.copy()
    want2[4:7, 5:9] = 0
    want2[0:3, 0:4] = pal_arr[np.frombuffer(patch, np.uint8).reshape(3, 4)]
    assert decode_gif(blob, frame=2)[3] == want2.tobytes()
    with pytest.raises(ValueError, match="out of range"):
        decode_gif(blob, frame=3)


def test_gif_malformed_raise():
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTAGIF" + b"\x00" * 20)
    blob = write_gif(
        [{"indices": _indices(8, 8, 4)}], 8, 8, _palette(4)
    )
    with pytest.raises(ValueError):
        decode_gif(blob[: len(blob) // 2])
    # palette index out of range: 2-color palette, index 3 in the data
    bad = write_gif([{"indices": bytes([3]) * 4}], 2, 2, _palette(4))
    mangled = bytearray(bad)
    # shrink the GCT size field from 4 to 2 colors and drop 2 entries
    mangled[10] = (mangled[10] & ~0x07) | 0x00
    mangled = mangled[:13 + 6] + mangled[13 + 12:]
    with pytest.raises(ValueError):
        decode_gif(bytes(mangled))


def test_gif_resize_and_features_e2e(spark):
    w, h, n = 16, 12, 16
    pal = _palette(n, seed=20)
    idx = _indices(w, h, n, seed=21)
    blob = write_gif([{"indices": idx}], w, h, pal)
    out = resize_image(blob, 8, 6)
    assert out.startswith(b"P6\n8 6\n255\n")
    df = spark.createDataFrame(
        [(1, bytearray(blob), "image", "s://1")],
        "media_id long, content binary, media_type string, source_uri string",
    )
    r = extract_image_features(df).collect()[0]
    assert (r["width"], r["height"], r["channels"], r["format"]) == (
        w, h, 3, "gif",
    )


def test_gif_restore_previous_disposal():
    """Disposal 3 (restore-to-previous): the frame's pixels show for its
    own frame index, then the canvas reverts to the pre-frame state for
    subsequent frames."""
    w, h, n = 10, 8, 8
    pal = _palette(n, seed=30)
    base = _indices(w, h, n, seed=31)
    overlay = _indices(4, 4, n, seed=32)
    final = _indices(3, 2, n, seed=33)
    frames = [
        {"indices": base, "disposal": 1},
        {  # temporary overlay: disposal 3 restores what was underneath
            "indices": overlay, "left": 2, "top": 2,
            "width": 4, "height": 4, "disposal": 3,
        },
        {"indices": final, "left": 0, "top": 0, "width": 3, "height": 2},
    ]
    blob = write_gif(frames, w, h, pal)
    pal_arr = np.frombuffer(pal, np.uint8).reshape(-1, 3)
    base_arr = pal_arr[np.frombuffer(base, np.uint8).reshape(h, w)]
    # frame 1 shows the overlay
    want1 = base_arr.copy()
    want1[2:6, 2:6] = pal_arr[np.frombuffer(overlay, np.uint8).reshape(4, 4)]
    assert decode_gif(blob, frame=1)[3] == want1.tobytes()
    # frame 2: overlay reverted to BASE pixels, new patch at origin
    want2 = base_arr.copy()
    want2[0:2, 0:3] = pal_arr[np.frombuffer(final, np.uint8).reshape(2, 3)]
    assert decode_gif(blob, frame=2)[3] == want2.tobytes()
