"""CCITT fax codecs (r12): T.4 Modified Huffman 1-D and T.6 Group 4
2-D — table integrity, hand-computed bitstream anchors, roundtrips,
and the bilevel TIFF integration (Compression=1/2/4). No Spark.
Specs: ITU-T T.4/T.6 (public)."""

from __future__ import annotations

import numpy as np
import pytest

from xenoeye_spark.datapipe.codecs_ccitt import (
    BLACK_CODES, EXT_CODES, WHITE_CODES,
    decode_g4, decode_mh, encode_g4, encode_mh,
)
from xenoeye_spark.datapipe.codecs_tiff import decode_tiff, encode_tiff


def test_code_tables_are_prefix_free_and_complete():
    """The transcribed T.4 Table 2/3/4 data must form prefix-free
    alphabets (a transcription slip that breaks decode would surface
    here before any image does) with the spec's exact coverage: 64
    terminating runs + 27 makeups per colour + 13 shared extended
    makeups."""
    for name, tabs in (("white", (WHITE_CODES, EXT_CODES)),
                       ("black", (BLACK_CODES, EXT_CODES))):
        codes = [c for t in tabs for c in t.values()]
        assert len(set(codes)) == len(codes), name
        for i, a in enumerate(codes):
            for b in codes[i + 1:]:
                assert not a.startswith(b) and not b.startswith(a), (
                    name, a, b)
    assert sorted(k for k in WHITE_CODES if k < 64) == list(range(64))
    assert sorted(k for k in BLACK_CODES if k < 64) == list(range(64))
    assert sorted(k for k in WHITE_CODES if k >= 64) == [
        64 * i for i in range(1, 28)]
    assert sorted(k for k in BLACK_CODES if k >= 64) == [
        64 * i for i in range(1, 28)]
    assert sorted(EXT_CODES) == [1792 + 64 * i for i in range(13)]


def test_mh_hand_anchors():
    """Bitstreams assembled by hand from the published tables — the
    encoder and decoder must both agree with the SPEC, not merely
    with each other."""
    # row [3w, 2b, 3w] (w=8): white3=1000 black2=11 white3=1000
    # -> 1000 11 1000 + pad = 10001110 00000000
    data = encode_mh(np.array([[0, 0, 0, 1, 1, 0, 0, 0]], np.uint8))
    assert data == bytes([0b10001110, 0b00000000])
    # all-black row of 5 (w=5): white0=00110101 black5=0011
    # -> 00110101 0011 + pad
    data = encode_mh(np.array([[1] * 5], np.uint8))
    assert data == bytes([0b00110101, 0b00110000])
    # a 70-pixel white row needs makeup 64 (11011) + term 6 (1110)
    data = encode_mh(np.zeros((1, 70), np.uint8))
    assert data == bytes([0b11011111, 0b00000000])
    # decode side from raw spec bits: white4=1011 black3=10 white1=000111
    raw = bytes([0b10111000, 0b01110000])
    out = decode_mh(raw, 8, 1)
    assert out.tolist() == [[0, 0, 0, 0, 1, 1, 1, 0]]


def test_g4_hand_anchor_vertical_modes():
    """First line against the imaginary white reference: a line that
    is all white codes as a single V0 at b1=w... exercised via the
    encoder; the DECODER anchor feeds hand-assembled mode bits."""
    # 2 rows of 6px: row0 = 001100, row1 identical.
    # Row0 vs white ref: b1=6 always. a0=-1,color=w: a1=2,b1=6 ->
    # VL (d=-4)? -4 out of range -> horizontal: H 001 + white2=0111 +
    # black2=11. a0=4, color=w: a1=6=b1?? ref all white: b1=6, a1=6,
    # V0 -> "1". a0=6 ends.
    # Row1 vs row0 (transitions 2,4): a0=-1 w: b1=2, a1=2 -> V0 "1";
    # a0=2 b: b1=4 a1=4 V0 "1"; a0=4 w: b1=6 a1=6 V0 "1".
    bits = "001" + "0111" + "11" + "1" + "1" + "1" + "1"
    pad = "0" * ((-len(bits)) % 8)
    data = bytes(int((bits + pad)[i:i + 8], 2)
                 for i in range(0, len(bits + pad), 8))
    out = decode_g4(data, 6, 2)
    assert out.tolist() == [[0, 0, 1, 1, 0, 0]] * 2
    # and the encoder produces exactly this stream
    img = np.array([[0, 0, 1, 1, 0, 0]] * 2, np.uint8)
    assert encode_g4(img) == data


def test_mh_g4_roundtrips():
    rng = np.random.RandomState(5)
    cases = [
        np.zeros((4, 17), np.uint8),
        np.ones((3, 9), np.uint8),
        (rng.rand(20, 64) < 0.5).astype(np.uint8),
        (rng.rand(16, 100) < 0.05).astype(np.uint8),
        (rng.rand(16, 100) < 0.95).astype(np.uint8),
        np.tile(np.array([[0, 1]], np.uint8), (8, 40)),  # 1px runs
    ]
    t = np.zeros((30, 200), np.uint8)
    t[5:25, 20:180] = 1
    t[8:22, 40:160] = 0
    t[10:12, 50:150] = 1
    cases.append(t)
    # a >2560 run forces chained extended makeups
    cases.append(np.zeros((2, 6000), np.uint8))
    for k, img in enumerate(cases):
        h, w = img.shape
        assert (decode_mh(encode_mh(img), w, h) == img).all(), ("mh", k)
        assert (decode_g4(encode_g4(img), w, h) == img).all(), ("g4", k)


def test_g4_compresses_structured_content():
    """The point of 2-D coding: a text-like page codes far smaller
    under G4 than MH, and both far smaller than raw bits."""
    page = np.zeros((200, 800), np.uint8)
    for r in range(10, 190, 12):
        page[r:r + 6, 30:770] = 1
        page[r + 2:r + 4, 60:740] = 0
    raw = page.size // 8
    mh = len(encode_mh(page))
    g4 = len(encode_g4(page))
    assert g4 < mh < raw
    assert g4 * 4 < raw


def test_bilevel_tiff_integration():
    """Compression 1 (packed bits), 2 (MH) and 4 (G4) through the
    TIFF container across strip heights; photometric 0 (WhiteIsZero,
    the fax default) maps value 0 -> white 255."""
    rng = np.random.RandomState(8)
    imgs = [
        (rng.rand(25, 80) < 0.3).astype(np.uint8),
        np.zeros((10, 33), np.uint8),
    ]
    t = np.zeros((40, 120), np.uint8)
    t[5:35, 10:110] = 1
    t[10:30, 20:100] = 0
    imgs.append(t)
    for k, img in enumerate(imgs):
        want = (1 - img) * 255
        for comp in (1, 2, 4):
            for rps in (None, 7):
                out = decode_tiff(encode_tiff(
                    img, "<", rows_per_strip=rps, compression=comp,
                    bits=1))
                assert (out[:, :, 0] == want).all(), (k, comp, rps)
                assert (out[:, :, 1] == want).all(), (k, comp, rps)


def test_ccitt_boundaries_raise_loudly():
    import struct

    img = (np.arange(12).reshape(3, 4) % 2).astype(np.uint8)
    # G3-with-EOLs (Compression=3) refuses
    data = bytearray(encode_tiff(img, "<", compression=4, bits=1))
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n,) = struct.unpack_from("<H", data, ifd_off)
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        if struct.unpack_from("<H", data, base)[0] == 259:
            struct.pack_into("<H", data, base + 8, 3)
    with pytest.raises(NotImplementedError, match="Group 3"):
        decode_tiff(bytes(data))
    # CCITT compression with 8-bit samples is malformed
    g8 = np.zeros((4, 4), np.uint8)
    data = bytearray(encode_tiff(g8, "<"))
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n,) = struct.unpack_from("<H", data, ifd_off)
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        if struct.unpack_from("<H", data, base)[0] == 259:
            struct.pack_into("<H", data, base + 8, 4)
    with pytest.raises(NotImplementedError, match="BitsPerSample=1"):
        decode_tiff(bytes(data))
    # corrupt G4 stream: an impossible mode prefix
    with pytest.raises(ValueError, match="G4 mode|truncated"):
        decode_g4(b"\x00\x00\x00\x00", 16, 2)
    # MH row that overruns its width
    with pytest.raises(ValueError, match="CCITT row|truncated|run code"):
        decode_mh(bytes([0b11011111, 0b00000000]), 8, 1)  # 64+6 > 8
    # encoder guards
    with pytest.raises(ValueError, match="bilevel-only"):
        encode_tiff(g8, compression=2)
    with pytest.raises(ValueError, match="bilevel writer"):
        encode_tiff(img, compression=5, bits=1)
