"""Uncompressed-TIFF decoder: both byte orders, multi-strip layouts,
photometric inversion, alpha drop, loud boundaries. No Spark."""

from __future__ import annotations

import struct

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
            struct.pack_into("<H", data, base + 8, 9)   # JBIG (T.85)
    with pytest.raises(NotImplementedError, match="compressed TIFF"):
        decode_tiff(bytes(data))
    for i in range(n):
        base = 10 + 12 * i
        if struct.unpack_from("<H", data, base)[0] == 259:
            struct.pack_into("<H", data, base + 8, 6)   # old-style JPEG
    with pytest.raises(NotImplementedError, match="old-style"):
        decode_tiff(bytes(data))
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"XX" + bytes(20))
    with pytest.raises(Exception):
        decode_tiff(encode_tiff(img)[:30])


def test_planar_configuration_roundtrip():
    """r11: PlanarConfiguration=2 decodes — plane-major strips equal
    the chunky decode of the same pixels across byte orders and
    strip heights; a gray planar file degrades to the single-plane
    chunky layout; an undefined planar value raises."""
    import struct

    rng = np.random.RandomState(5)
    for (h, w) in [(1, 1), (5, 7), (16, 9)]:
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        for endian in "<>":
            for rps in (None, 2):
                got = decode_tiff(encode_tiff(img, endian, rps, planar=2))
                assert (got == img).all(), (h, w, endian, rps)
    g = rng.randint(0, 256, size=(4, 6), dtype=np.uint8)
    assert (decode_tiff(encode_tiff(g, planar=2))[:, :, 0] == g).all()
    with pytest.raises(ValueError, match="planar must be"):
        encode_tiff(g, planar=3)
    # a corrupt PlanarConfiguration value raises at decode
    data = bytearray(encode_tiff(
        rng.randint(0, 256, size=(2, 2, 3), dtype=np.uint8), planar=2))
    n = struct.unpack_from("<H", data, 8)[0]
    for i in range(n):
        base = 10 + 12 * i
        if struct.unpack_from("<H", data, base)[0] == 284:
            struct.pack_into("<H", data, base + 8, 3)
    with pytest.raises(ValueError, match="bad PlanarConfiguration"):
        decode_tiff(bytes(data))


def test_dispatch_sniffs_tiff():
    img = np.full((5, 5, 3), 33, dtype=np.uint8)
    for endian in ("<", ">"):
        d = encode_tiff(img, endian=endian)
        assert sniff_format(d) == "tiff"
        assert (decode_image(d) == 33).all()


def test_packbits_lzw_predictor_roundtrips():
    """r11: PackBits (§9) and LZW (§13, MSB-first with the mandated
    early width change) decompress strip-by-strip, with the
    horizontal-differencing predictor (tag 317=2) undone as a per-row
    cumulative sum — every (compression x predictor x planar x strip
    height) cell round-trips, incl. a 64x64 noise image that forces
    LZW through all code widths and a mid-stream Clear."""
    rng = np.random.RandomState(21)
    imgs = [
        rng.randint(0, 256, size=(16, 23, 3), dtype=np.uint8),
        np.full((9, 30, 3), 77, np.uint8),
        rng.randint(0, 256, size=(64, 64, 3), dtype=np.uint8),
    ]
    for img in imgs:
        for comp in (5, 32773):
            for pred in (1, 2):
                for pl in (1, 2):
                    got = decode_tiff(encode_tiff(
                        img, "<", 5, planar=pl,
                        compression=comp, predictor=pred))
                    assert (got == img).all(), (img.shape, comp, pred, pl)
    g = rng.randint(0, 256, size=(13, 7), dtype=np.uint8)
    got = decode_tiff(encode_tiff(g, ">", 3, compression=5, predictor=2))
    assert (got[:, :, 0] == g).all()
    # undefined predictor raises at decode
    import struct
    data = bytearray(encode_tiff(g, compression=5, predictor=2))
    n = struct.unpack_from("<H", data, 8)[0]
    for i in range(n):
        base = 10 + 12 * i
        if struct.unpack_from("<H", data, base)[0] == 317:
            struct.pack_into("<H", data, base + 8, 3)
    with pytest.raises(NotImplementedError, match="predictor"):
        decode_tiff(bytes(data))


def test_corrupt_strip_count_raises_not_empty():
    """r12 advice: more strips than RowsPerStrip implies (corrupt
    StripOffsets / RowsPerStrip mismatch) must raise the corrupt-file
    ValueError instead of silently decompressing empty pieces."""
    img = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(6, 4, 3)
    data = bytearray(encode_tiff(img, "<", rows_per_strip=2,
                                 compression=32773))
    # patch the inline RowsPerStrip (tag 278) value from 2 to 6: the
    # file still carries 3 strips but now claims one strip covers all
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n,) = struct.unpack_from("<H", data, ifd_off)
    patched = False
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        (tag,) = struct.unpack_from("<H", data, base)
        if tag == 278:
            struct.pack_into("<I", data, base + 8, 6)
            patched = True
    assert patched
    with pytest.raises(ValueError, match="corrupt TIFF"):
        decode_tiff(bytes(data))


# ------------------------------------------------ tiles + JPEG (r12)

def test_tiled_roundtrips_all_compressions():
    """Tile layout (TIFF 6.0 §15): every (compression x planar x
    predictor x tile-dims) cell round-trips bit-exactly, including
    non-multiple-of-tile image dims (right/bottom padding cropped)."""
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(21, 37, 3), dtype=np.uint8)
    for comp in (1, 5, 32773):
        for planar in (1, 2):
            for pred in (1, 2):
                for tdims in ((16, 16), (8, 16), (32, 16)):
                    d = encode_tiff(img, "<", planar=planar,
                                    compression=comp, predictor=pred,
                                    tile=tdims)
                    assert (decode_tiff(d) == img).all(), (
                        comp, planar, pred, tdims)
    g = rng.randint(0, 256, size=(19, 10), dtype=np.uint8)
    out = decode_tiff(encode_tiff(g, ">", compression=5, predictor=2,
                                  tile=(16, 16)))
    assert (out[:, :, 0] == g).all()


def test_tiled_corrupt_tile_count_raises():
    img = np.zeros((20, 20, 3), dtype=np.uint8)
    data = bytearray(encode_tiff(img, "<", tile=(16, 16)))
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n,) = struct.unpack_from("<H", data, ifd_off)
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        if struct.unpack_from("<H", data, base)[0] == 322:  # TileWidth
            struct.pack_into("<I", data, base + 8, 32)
    with pytest.raises(ValueError, match="corrupt TIFF"):
        decode_tiff(bytes(data))


def test_jpeg_in_tiff_assembly_equals_per_segment_decode():
    """Compression=7: the assembled canvas must equal the per-segment
    decode_jpeg outputs region-by-region — the TIFF layer adds
    placement, not pixels. Both strip and tile layouts, with and
    without the JPEGTables abbreviation."""
    from xenoeye_spark.datapipe.codecs_jpeg import decode_jpeg
    from xenoeye_spark.datapipe.codecs_tiff import (
        _TAG_JPEG_TABLES, _TAG_STRIP_COUNTS, _TAG_STRIP_OFFSETS,
        _TAG_TILE_COUNTS, _TAG_TILE_OFFSETS, _merge_jpeg_tables,
        _read_ifd,
    )

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(24, 40, 3), dtype=np.uint8)
    for jt in (False, True):
        # strips of 8 rows
        d = encode_tiff(img, "<", rows_per_strip=8, compression=7,
                        jpeg_tables=jt)
        tags = _read_ifd(d, "<")
        assert (_TAG_JPEG_TABLES in tags) == jt
        tables = bytes(tags[_TAG_JPEG_TABLES]) if jt else None
        out = decode_tiff(d)
        for si, (o, c) in enumerate(zip(tags[_TAG_STRIP_OFFSETS],
                                        tags[_TAG_STRIP_COUNTS])):
            seg = decode_jpeg(_merge_jpeg_tables(d[o:o + c], tables))
            assert (out[si * 8:(si + 1) * 8] == seg[:8]).all(), si
        # 16x16 tiles over a 24x40 image (padded 2x3 grid)
        d = encode_tiff(img, "<", tile=(16, 16), compression=7,
                        jpeg_tables=jt)
        tags = _read_ifd(d, "<")
        tables = bytes(tags[_TAG_JPEG_TABLES]) if jt else None
        out = decode_tiff(d)
        assert out.shape == (24, 40, 3)
        for ti, (o, c) in enumerate(zip(tags[_TAG_TILE_OFFSETS],
                                        tags[_TAG_TILE_COUNTS])):
            ty, tx = divmod(ti, 3)
            seg = decode_jpeg(_merge_jpeg_tables(d[o:o + c], tables))
            region = out[ty * 16:(ty + 1) * 16, tx * 16:(tx + 1) * 16]
            assert (region == seg[:region.shape[0],
                                  :region.shape[1]]).all(), ti


def test_jpeg_in_tiff_flat_exact_and_gray():
    """Flat blocks are DC-exact through the JPEG path, so these
    decode bit-exactly; gray strips go through the gray encoder and
    the 3-channel replication contract holds."""
    flat = np.full((32, 48, 3), 120, np.uint8)
    for jt in (False, True):
        out = decode_tiff(encode_tiff(flat, "<", compression=7,
                                      tile=(16, 16), jpeg_tables=jt))
        assert (out == flat).all(), jt
    g = np.full((16, 24), 200, np.uint8)
    out = decode_tiff(encode_tiff(g, "<", compression=7,
                                  rows_per_strip=8))
    assert out.shape == (16, 24, 3)
    assert (out == 200).all()


def test_jpeg_in_tiff_corrupt_tables_raise():
    from xenoeye_spark.datapipe.codecs_tiff import _merge_jpeg_tables

    with pytest.raises(ValueError, match="JPEGTables"):
        _merge_jpeg_tables(b"\xff\xd8xx", b"not a jpeg stream")
    with pytest.raises(ValueError, match="no SOI"):
        _merge_jpeg_tables(b"junk", b"\xff\xd8\xff\xd9")
    # a raw (non-JPEG) segment under Compression=7 fails loudly
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    data = bytearray(encode_tiff(img, "<"))
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n,) = struct.unpack_from("<H", data, ifd_off)
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        if struct.unpack_from("<H", data, base)[0] == 259:
            struct.pack_into("<H", data, base + 8, 7)
    with pytest.raises(ValueError):
        decode_tiff(bytes(data))


# ------------------------------------------- Deflate + 16-bit (r12)

def test_deflate_roundtrips_strips_and_tiles():
    """Adobe Deflate (Compression=8): one zlib stream per segment,
    round-trips across planar/predictor/layout; the legacy 32946 code
    decodes identically (patched in place); corrupt streams raise."""
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, size=(21, 37, 3), dtype=np.uint8)
    for planar in (1, 2):
        for pred in (1, 2):
            for tdims in (None, (16, 16)):
                kw = dict(planar=planar, compression=8, predictor=pred)
                if tdims:
                    kw["tile"] = tdims
                else:
                    kw["rows_per_strip"] = 5
                d = encode_tiff(img, "<", **kw)
                assert (decode_tiff(d) == img).all(), (planar, pred, tdims)
    # legacy ZIP code 32946 = same codec
    data = bytearray(encode_tiff(img, "<", rows_per_strip=5,
                                 compression=8))
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n,) = struct.unpack_from("<H", data, ifd_off)
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        if struct.unpack_from("<H", data, base)[0] == 259:
            struct.pack_into("<H", data, base + 8, 32946)
    assert (decode_tiff(bytes(data)) == img).all()
    # corrupt zlib stream raises the corrupt-file error
    bad = bytearray(encode_tiff(img, "<", rows_per_strip=21,
                                compression=8))
    bad[-10:] = b"\x00" * 10
    with pytest.raises(ValueError, match="Deflate"):
        decode_tiff(bytes(bad))


def test_16bit_roundtrips_high_byte_strip():
    """16-bit samples (both byte orders, every compression incl.
    Deflate, strips and tiles, planar, predictor per 16-bit SAMPLE):
    v*257-coded values strip to exactly v; the predictor math must
    run at sample width (a byte-wise undo would corrupt every row)."""
    rng = np.random.RandomState(6)
    v8 = rng.randint(0, 256, size=(21, 37, 3))
    img16 = (v8 * 257).astype(np.uint16)
    for endian in "<>":
        for comp in (1, 5, 32773, 8):
            for planar in (1, 2):
                for pred in (1, 2):
                    for tdims in (None, (16, 16)):
                        kw = dict(planar=planar, compression=comp,
                                  predictor=pred, bits=16)
                        if tdims:
                            kw["tile"] = tdims
                        else:
                            kw["rows_per_strip"] = 5
                        out = decode_tiff(encode_tiff(img16, endian, **kw))
                        assert (out == v8).all(), (
                            endian, comp, planar, pred, tdims)
    # high byte, not rounding: 0x12FF -> 0x12
    g = np.array([[0x12FF, 0x0001], [0xFFFE, 0x8000]], np.uint16)
    out = decode_tiff(encode_tiff(g, "<", bits=16))
    assert (out[:, :, 0] == [[0x12, 0x00], [0xFF, 0x80]]).all()
    # gray 16-bit through LZW + predictor
    g16 = (rng.randint(0, 256, size=(9, 14)) * 257).astype(np.uint16)
    out = decode_tiff(encode_tiff(g16, ">", compression=5, predictor=2,
                                  bits=16))
    assert (out[:, :, 0] == (g16 >> 8)).all()
    # mixed / unsupported depths still refuse
    with pytest.raises(ValueError, match="bits must be"):
        encode_tiff(g, bits=12)
    with pytest.raises(ValueError, match="8-bit only"):
        encode_tiff(np.zeros((8, 8, 3), np.uint16), compression=7,
                    bits=16)
