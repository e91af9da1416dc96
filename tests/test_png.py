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
    # relabeling an 8-bit stream as 16-bit (r12: 16-bit decodes now)
    # leaves a byte layout no row walk can consume exactly
    d = bytearray(data)
    d[24] = 16
    with pytest.raises(ValueError, match="IDAT size mismatch"):
        decode_png(bytes(d))
    # an ILLEGAL (depth, color type) combo refuses up front
    d = bytearray(data)
    d[24] = 2                           # 2-bit RGB: not in §11.2.2
    with pytest.raises(ValueError, match="illegal depth"):
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


# --------------------------------------------- bit depths 1/2/4/16 (r12)

def test_16bit_roundtrips_all_ctypes_filters_interlace():
    """Depth 16 (big-endian samples, filter delta spp*2 bytes):
    v*257-coded values strip to exactly v through the high-byte
    down-conversion, across every non-palette color type, all five
    filters, both interlace methods."""
    rng = np.random.RandomState(3)
    for ctype, shape in ((0, (13, 9)), (2, (13, 9, 3)),
                         (4, (13, 9, 2)), (6, (13, 9, 4))):
        v8 = rng.randint(0, 256, size=shape)
        img16 = (v8 * 257).astype(np.uint16)
        want = v8.reshape(13, 9, -1)
        for ft in (0, 1, 2, 3, 4):
            for il in (False, True):
                out = decode_png(encode_png(
                    img16, ctype=ctype, filter_type=ft,
                    interlace=il, depth=16))
                if ctype in (0, 4):
                    assert (out[:, :, 0] == want[:, :, 0]).all(), (
                        ctype, ft, il)
                else:
                    assert (out == want[:, :, :3]).all(), (ctype, ft, il)


def test_16bit_high_byte_strip_is_exact_rule():
    """The down-conversion is the HIGH byte (libpng strip-16): 0x1234
    -> 0x12, independent of the low byte."""
    img = np.array([[0x1234, 0x12FF], [0x0001, 0xFFFE]], np.uint16)
    out = decode_png(encode_png(img, ctype=0, depth=16))
    assert (out[:, :, 0] == [[0x12, 0x12], [0x00, 0xFF]]).all()


def test_sub8_gray_and_palette_roundtrip():
    """Depths 1/2/4: MSB-first packed samples with partial trailing
    bytes (widths not multiples of the per-byte sample count), every
    filter, both interlace methods; gray scales exactly to 0..255,
    palette indices resolve through PLTE."""
    rng = np.random.RandomState(9)
    for d in (1, 2, 4):
        mx = (1 << d) - 1
        g = rng.randint(0, mx + 1, size=(11, 23))
        for ft in (0, 1, 2, 3, 4):
            for il in (False, True):
                out = decode_png(encode_png(
                    g, ctype=0, filter_type=ft, interlace=il, depth=d))
                assert (out[:, :, 0] == g * (255 // mx)).all(), (d, ft, il)
        pal = rng.randint(0, 256, size=(mx + 1, 3)).astype(np.uint8)
        idx = rng.randint(0, mx + 1, size=(7, 15))
        out = decode_png(encode_png(idx, ctype=3, filter_type=2,
                                    palette=pal, depth=d))
        assert (out == pal[idx]).all(), d
    # 1-bit 1-pixel-wide edge: one sample in one padded byte per row
    one = np.array([[1], [0], [1]], np.uint8)
    out = decode_png(encode_png(one, ctype=0, depth=1))
    assert (out[:, 0, 0] == [255, 0, 255]).all()


def test_illegal_depth_combos_refuse():
    for ctype, d, shape in ((2, 4, (4, 4, 3)), (3, 16, (4, 4)),
                            (6, 1, (4, 4, 4)), (4, 2, (4, 4, 2))):
        with pytest.raises(ValueError, match="illegal depth"):
            encode_png(np.zeros(shape, np.uint8), ctype=ctype, depth=d)
