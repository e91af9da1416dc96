"""Uncompressed-TIFF decoder: both byte orders, multi-strip layouts,
photometric inversion, alpha drop, loud boundaries. No Spark."""

from __future__ import annotations

import numpy as np
import pytest

from xenoeye_spark.datapipe.codecs import decode_image, sniff_format
from xenoeye_spark.datapipe.codecs_tiff import decode_tiff, encode_tiff


def test_roundtrip_both_endians_and_strips():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(21, 17, 3), dtype=np.uint8)
    for endian in ("<", ">"):
        for rps in (None, 1, 4, 21):
            out = decode_tiff(encode_tiff(img, endian=endian,
                                          rows_per_strip=rps))
            assert (out == img).all(), (endian, rps)


def test_gray_and_white_is_zero():
    rng = np.random.RandomState(1)
    gray = rng.randint(0, 256, size=(9, 13), dtype=np.uint8)
    data = bytearray(encode_tiff(gray, endian="<"))
    out = decode_tiff(bytes(data))
    assert (out[:, :, 0] == gray).all()
    # flip PhotometricInterpretation to 0 (WhiteIsZero): inverted
    import struct
    n = struct.unpack_from("<H", data, 8)[0]
    for i in range(n):
        base = 10 + 12 * i
        if struct.unpack_from("<H", data, base)[0] == 262:
            struct.pack_into("<H", data, base + 8, 0)
    inv = decode_tiff(bytes(data))
    assert (inv[:, :, 0] == 255 - gray).all()


def test_boundaries_raise_loudly():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    data = bytearray(encode_tiff(img))
    import struct
    n = struct.unpack_from("<H", data, 8)[0]
    for i in range(n):
        base = 10 + 12 * i
        if struct.unpack_from("<H", data, base)[0] == 259:
            struct.pack_into("<H", data, base + 8, 5)   # LZW
    with pytest.raises(NotImplementedError, match="compressed TIFF"):
        decode_tiff(bytes(data))
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"XX" + bytes(20))
    with pytest.raises(Exception):
        decode_tiff(encode_tiff(img)[:30])


def test_dispatch_sniffs_tiff():
    img = np.full((5, 5, 3), 33, dtype=np.uint8)
    for endian in ("<", ">"):
        d = encode_tiff(img, endian=endian)
        assert sniff_format(d) == "tiff"
        assert (decode_image(d) == 33).all()
