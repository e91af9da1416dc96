"""GIF codec (hand-rolled variable-width LZW, W3C GIF89a spec):
literal-codes anchor (an encoder with no dictionary logic — a decode
mismatch indicts the decoder), greedy-LZW round-trips across width
growth and dictionary hits, the KwKwK case, interlace, extensions,
and loud failure modes. No Spark fixture."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from xenoeye_spark.datapipe.codecs import decode_image, sniff_format
from xenoeye_spark.datapipe.codecs_gif import (
    decode_gif, encode_gif, encode_gif_uncompressed, gif_frames,
)


def _rand(seed, npal, shape):
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, size=(npal, 3), dtype=np.uint8)
    idx = rng.randint(0, npal, size=shape).astype(np.uint8)
    return pal, idx


def test_uncompressed_literal_anchor():
    pal, idx = _rand(0, 5, (13, 17))
    out = decode_gif(encode_gif_uncompressed(idx, pal))
    assert (out == pal[idx]).all()


def test_greedy_lzw_roundtrips():
    pal, idx = _rand(1, 5, (13, 17))
    assert (decode_gif(encode_gif(idx, pal)) == pal[idx]).all()
    # large palette + image: code width grows through 9/10 bits
    pal2, idx2 = _rand(2, 200, (60, 80))
    assert (decode_gif(encode_gif(idx2, pal2)) == pal2[idx2]).all()
    # repetitive content: dictionary hits + the KwKwK code path
    pal3, _ = _rand(3, 4, (1, 1))
    idx3 = np.tile(np.array([[1, 1, 2, 2], [1, 1, 2, 2]],
                            dtype=np.uint8), (16, 16))
    assert (decode_gif(encode_gif(idx3, pal3)) == pal3[idx3]).all()


def test_two_encoders_agree():
    pal, idx = _rand(4, 16, (24, 24))
    a = decode_gif(encode_gif(idx, pal))
    b = decode_gif(encode_gif_uncompressed(idx, pal))
    assert (a == b).all()


def test_interlaced_rows_deinterlace():
    """Encode the PASS-ORDERED rows with the interlace flag set by
    hand: the decoder must put every row back (spec 8/8/4/2 passes)."""
    pal, idx = _rand(5, 7, (19, 6))
    h = idx.shape[0]
    order = [y for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
             for y in range(start, h, step)]
    permuted = idx[order]
    data = bytearray(encode_gif(permuted, pal))
    # image descriptor starts after header(6)+LSD(7)+GCT(3*8); its
    # flags byte is at +9
    desc = 6 + 7 + 3 * 8
    assert data[desc] == 0x2C
    data[desc + 9] |= 0x40
    out = decode_gif(bytes(data))
    assert (out == pal[idx]).all()


def test_extensions_are_skipped_and_frames_iterate():
    pal, idx = _rand(6, 4, (5, 5))
    base = encode_gif(idx, pal)
    # splice a graphic-control extension after the color table
    desc = 6 + 7 + 3 * 4
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    with_ext = base[:desc] + gce + base[desc:]
    assert (decode_gif(with_ext) == pal[idx]).all()
    assert len(list(gif_frames(with_ext))) == 1


def test_loud_failures():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOTGIF" + bytes(20))
    pal, idx = _rand(7, 4, (6, 6))
    data = encode_gif(idx, pal)
    with pytest.raises(Exception):
        decode_gif(data[:20])               # truncated


def test_dispatch_sniffs_gif():
    pal = np.array([[9, 9, 9]], dtype=np.uint8)
    idx = np.zeros((4, 4), dtype=np.uint8)
    d = encode_gif_uncompressed(idx, pal)
    assert sniff_format(d) == "gif"
    assert (decode_image(d) == 9).all()


def test_sample_frames_animated_gif_spark(spark):
    """sample_frames treats an animated GIF as a real video source:
    planted flat frames -> exact lumas on every 2nd frame."""
    from pyspark.sql import Row

    from xenoeye_spark.datapipe.multimodal import sample_frames

    levels = [10, 40, 70, 100]
    # one multi-frame GIF: splice image blocks from per-frame encodes
    datas = []
    for v in levels:
        pal = np.array([[v, v, v]], dtype=np.uint8)
        idx = np.zeros((8, 8), dtype=np.uint8)
        datas.append(encode_gif_uncompressed(idx, pal))
    # header + LSD + GCT from the first; image blocks from each; trailer
    hdr_end = 6 + 7 + 3 * 2   # bits=1 -> size-2 table
    out = bytearray(datas[0][:hdr_end])
    for d in datas:
        body = d[hdr_end:-1]          # drop trailer 0x3B
        # the per-frame encodes carry different GLOBAL tables; give
        # each spliced image block its own LOCAL table instead: the
        # descriptor is 10 bytes (0x2C + 4x2 pos/size + flags), set
        # the LCT flag (0x80, size bits 0 = 2 entries) and append the
        # frame's own 2-entry table
        desc, rest = body[:10], body[10:]
        tbl = d[13:13 + 6]
        out += desc[:9] + bytes([desc[9] | 0x80]) + tbl + rest
    out += b"\x3b"
    df = spark.createDataFrame(
        [Row(media_id=7, content=bytearray(bytes(out)))]
    )
    got = sorted(
        (r.frame_idx, r.mean_luma)
        for r in sample_frames(df, every_n=2, n_frames=4).collect()
    )
    assert got == [(0, 10.0), (2, 70.0)]
