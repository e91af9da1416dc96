"""PNG codec (stdlib zlib + numpy unfilter): lossless round-trips per
filter type and color type, hand-filtered scanline twins, palette
resolution, alpha drop, and the loud boundaries. No Spark fixture —
bytes -> numpy, same contract as the other decoders."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from xenoeye_spark.datapipe.codecs import decode_image, sniff_format
from xenoeye_spark.datapipe.codecs_png import (
    _SIG, _chunk, decode_png, encode_png,
)


def test_roundtrip_rgb_every_filter_type_exact():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(21, 17, 3), dtype=np.uint8)
    for ft in range(5):
        out = decode_png(encode_png(img, ctype=2, filter_type=ft))
        assert (out == img).all(), f"filter {ft}"


def test_hand_filtered_sub_scanline_twin():
    """One scanline filtered by hand (Sub): the decoder must invert the
    exact recurrence out[x] = f[x] + out[x-spp], not merely round-trip
    its own encoder."""
    px = np.array([[10, 20, 30], [250, 10, 0], [7, 8, 9]],
                  dtype=np.uint8).reshape(1, 3, 3)
    flat = px.reshape(3 * 3).astype(int)
    f = [0] * 9
    for x in range(9):
        a = flat[x - 3] if x >= 3 else 0
        f[x] = (flat[x] - a) & 0xFF
    raw = bytes([1]) + bytes(f)
    data = _SIG
    data += _chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 1, 8, 2, 0, 0, 0))
    data += _chunk(b"IDAT", zlib.compress(raw))
    data += _chunk(b"IEND", b"")
    assert (decode_png(data) == px).all()


def test_gray_palette_rgba_paths():
    rng = np.random.RandomState(1)
    gray = rng.randint(0, 256, size=(9, 33), dtype=np.uint8)
    out = decode_png(encode_png(gray, ctype=0, filter_type=4))
    assert (out[:, :, 0] == gray).all() and (out[:, :, 2] == gray).all()

    pal = rng.randint(0, 256, size=(5, 3), dtype=np.uint8)
    idx = rng.randint(0, 5, size=(7, 11)).astype(np.uint8)
    out = decode_png(encode_png(idx, ctype=3, filter_type=2, palette=pal))
    assert (out == pal[idx]).all()

    rgba = rng.randint(0, 256, size=(8, 8, 4), dtype=np.uint8)
    out = decode_png(encode_png(rgba, ctype=6, filter_type=3))
    assert (out == rgba[:, :, :3]).all()

    ga = rng.randint(0, 256, size=(4, 5, 2), dtype=np.uint8)
    out = decode_png(encode_png(ga, ctype=4, filter_type=1))
    assert (out[:, :, 0] == ga[:, :, 0]).all()


def test_boundaries_raise_loudly():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    data = bytearray(encode_png(img))
    # 16-bit depth
    d = bytearray(data)
    d[24] = 16
    with pytest.raises(NotImplementedError, match="16-bit"):
        decode_png(bytes(d))
    # flipping the interlace flag on a NON-interlaced stream (r11:
    # Adam7 decodes now) leaves a byte layout no pass walk can
    # consume exactly — loud mismatch, not garbage pixels
    d = bytearray(data)
    d[28] = 1
    with pytest.raises(ValueError, match="IDAT size mismatch"):
        decode_png(bytes(d))
    d = bytearray(data)
    d[28] = 2                           # undefined interlace method
    with pytest.raises(ValueError, match="bad interlace"):
        decode_png(bytes(d))
    with pytest.raises(ValueError):
        decode_png(b"NOTAPNG" + bytes(10))
    with pytest.raises(Exception):
        decode_png(bytes(data[:40]))    # truncated IDAT


def test_adam7_interlace_roundtrip():
    """r11: Adam7 decode — every (size, filter) cell round-trips
    bit-exactly and equals the non-interlaced decode of the same
    pixels; sizes below 8 exercise EMPTY passes (zero bytes), and
    gray/palette/RGBA cover the sample layouts."""
    rng = np.random.RandomState(11)
    for (h, w) in [(1, 1), (2, 3), (7, 7), (8, 8), (9, 13), (1, 9)]:
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        for ft in range(5):
            adam = decode_png(encode_png(img, 2, ft, interlace=True))
            assert (adam == img).all(), (h, w, ft)
    g = rng.randint(0, 256, size=(5, 11), dtype=np.uint8)
    assert (decode_png(encode_png(g, 0, 4, interlace=True))[:, :, 0]
            == g).all()
    pal = rng.randint(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.randint(0, 4, size=(6, 7), dtype=np.uint8)
    assert (decode_png(encode_png(idx, 3, 1, palette=pal, interlace=True))
            == pal[idx]).all()
    rgba = rng.randint(0, 256, size=(9, 4, 4), dtype=np.uint8)
    assert (decode_png(encode_png(rgba, 6, 3, interlace=True))
            == rgba[:, :, :3]).all()


def test_dispatch_sniffs_png():
    img = np.full((6, 6, 3), 77, dtype=np.uint8)
    d = encode_png(img)
    assert sniff_format(d) == "png"
    assert (decode_image(d) == 77).all()
