"""Baseline JPEG codec (pure numpy, ITU-T T.81): analytic anchors the
decoder cannot fake, encode->decode round-trips at near-lossless
quantization, sampling-factor/restart/stuffing coverage, and the loud
NotImplementedError boundary for non-baseline processes. No Spark —
the codec is plain bytes -> numpy (the Arrow stage calls it per row)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from xenoeye_spark.datapipe.codecs import decode_image, sniff_format
from xenoeye_spark.datapipe.codecs_jpeg import (
    decode_jpeg, encode_jpeg_gray, encode_jpeg_progressive,
    encode_jpeg_rgb,
)


def test_dc_only_analytic_anchor():
    """A flat 8x8 encodes to a DC-only block; the decoded level has a
    closed form independent of the decoder: IDCT of a lone DC
    coefficient c is the constant c/8, so pixel = 8*(v-128)/8 + 128 = v
    whenever DC survives quantization exactly. With v=200, Q[0]=16:
    DC = 8*72 = 576 = 36*16 — exact — decoded MUST be exactly 200."""
    data = encode_jpeg_gray(np.full((8, 8), 200.0), quant=np.full(64, 16))
    out = decode_jpeg(data)
    assert out.shape == (8, 8, 3)
    assert (out == 200).all()


def test_dc_quantization_rounding_anchor():
    """v=201 -> DC = 8*(201-128) = 584 -> 584/24 = 24.33 -> rounds to
    24 -> dequant 576 -> pixel 576/8 + 128 = 200: the quantization
    loss is predicted by hand arithmetic, not by running either codec
    half. (Q=24, not 16: odd v with Q=16 lands DC/Q on an exact .5
    where the verdict is 1-ulp FP noise, a useless anchor.)"""
    data = encode_jpeg_gray(np.full((8, 8), 201.0), quant=np.full(64, 24))
    assert (decode_jpeg(data)[:, :, 0] == 200).all()


def test_single_ac_coefficient_anchor():
    """Plant exactly one AC coefficient through the real entropy coder:
    an image equal to 128 + a*basis(0,1) has FDCT = a at (0,1) only, so
    the decoded image must reproduce that single cosine (q=1)."""
    a = 64.0
    from xenoeye_spark.datapipe.codecs_jpeg import _idct2

    coef = np.zeros((8, 8))
    coef[0, 1] = a
    img = _idct2(coef) + 128.0
    data = encode_jpeg_gray(img, quant=np.full(64, 1))
    out = decode_jpeg(data)[:, :, 0].astype(float)
    assert np.abs(out - np.clip(np.round(img), 0, 255)).max() <= 1.0


def test_roundtrip_gray_near_lossless():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(24, 33)).astype(float)
    out = decode_jpeg(encode_jpeg_gray(img, quant=np.full(64, 1)))
    assert out.shape == (24, 33, 3)
    assert np.abs(out[:, :, 0].astype(float) - img).max() <= 2.0
    # grayscale replicates channels
    assert (out[:, :, 0] == out[:, :, 1]).all()


def test_roundtrip_color_444_and_420():
    base = np.linspace(0, 255, 40)[:, None] * np.ones(56)[None, :]
    img = np.stack([base, base[::-1], np.full((40, 56), 90.0)], axis=2)
    out = decode_jpeg(encode_jpeg_rgb(img, subsample=False,
                                      quant=np.full(64, 1)))
    assert out.shape == (40, 56, 3)
    assert np.abs(out.astype(float) - img).max() <= 3.0
    out420 = decode_jpeg(encode_jpeg_rgb(img, subsample=True,
                                         quant=np.full(64, 1)))
    assert out420.shape == (40, 56, 3)
    # 2x2-mean chroma on a smooth gradient: small bounded loss
    assert np.abs(out420.astype(float) - img).max() <= 10.0


def test_restart_markers_reset_dc_predictors():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, size=(16, 24)).astype(float)
    plain = decode_jpeg(encode_jpeg_gray(img, quant=np.full(64, 1)))
    rst = decode_jpeg(encode_jpeg_gray(img, quant=np.full(64, 1),
                                       restart_interval=2))
    assert (plain == rst).all()


def test_byte_stuffing_survives():
    """A high-contrast image whose entropy stream contains 0xFF bytes
    (stuffed as FF 00) must round-trip; assert stuffing actually
    occurred so the test means something."""
    rng = np.random.RandomState(3)
    img = (rng.randint(0, 2, size=(16, 16)) * 255).astype(float)
    data = encode_jpeg_gray(img, quant=np.full(64, 1))
    sos = data.index(b"\xff\xda")
    assert b"\xff\x00" in data[sos:], "no stuffing exercised"
    out = decode_jpeg(data)
    assert np.abs(out[:, :, 0].astype(float) - img).max() <= 2.0


def test_non_multiple_of_8_dims_crop():
    img = np.arange(19 * 13, dtype=float).reshape(19, 13) % 256
    out = decode_jpeg(encode_jpeg_gray(img, quant=np.full(64, 1)))
    assert out.shape == (19, 13, 3)


def test_unsupported_processes_raise_loudly():
    """Arithmetic-coded and lossless streams must refuse with
    NotImplementedError, not decode garbage; a BASELINE stream
    relabeled SOF2 (r11: progressive decodes now) is structurally
    inconsistent — its single scan claims the whole 0-63 band — and
    must fail loudly too; 12-bit decodes (r12) but ONLY under
    SOF1/SOF2 — a 12-bit SOF0 violates B.2.2 and refuses."""
    data = bytearray(encode_jpeg_gray(np.full((8, 8), 100.0)))
    i = bytes(data).index(b"\xff\xc0")
    data[i + 1] = 0xC9                  # arithmetic sequential
    with pytest.raises(NotImplementedError, match="unsupported"):
        decode_jpeg(bytes(data))
    data[i + 1] = 0xC3                  # lossless sequential
    with pytest.raises(NotImplementedError, match="unsupported"):
        decode_jpeg(bytes(data))
    # 12-bit baseline SOF0: illegal combination, loud ValueError
    d2 = bytearray(encode_jpeg_gray(np.full((8, 8), 100.0)))
    j = bytes(d2).index(b"\xff\xc0")
    d2[j + 4] = 12
    with pytest.raises(ValueError, match="SOF0 must be 8-bit"):
        decode_jpeg(bytes(d2))
    # unsupported precision value
    d2[j + 1] = 0xC1
    d2[j + 4] = 10
    with pytest.raises(NotImplementedError, match="10-bit"):
        decode_jpeg(bytes(d2))
    d3 = bytearray(encode_jpeg_gray(np.full((8, 8), 100.0)))
    k = bytes(d3).index(b"\xff\xc0")
    d3[k + 1] = 0xC2
    with pytest.raises(ValueError, match="mixes DC and AC"):
        decode_jpeg(bytes(d3))


def test_12bit_extended_sequential_decodes():
    """r12: 12-bit SOF1 — flat planes are DC-exact at quant 16 (any
    v*16-coded 8-bit level), a 16x-scaled noise plane at 16x quant
    yields the BIT-IDENTICAL coefficient stream as its 8-bit twin (so
    the decode matches exactly), and restart markers work at 12-bit."""
    for v8 in (0, 7, 120, 255):
        d = encode_jpeg_gray(np.full((11, 14), v8 * 16.0),
                             precision=12, quant=np.full(64, 16))
        assert (decode_jpeg(d) == v8).all(), v8
    rng = np.random.RandomState(2)
    g8 = rng.randint(0, 256, size=(24, 17)).astype(float)
    d8 = decode_jpeg(encode_jpeg_gray(g8, quant=np.full(64, 16)))
    d12 = decode_jpeg(encode_jpeg_gray(g8 * 16, precision=12,
                                       quant=np.full(64, 256)))
    assert (d8 == d12).all()
    out = decode_jpeg(encode_jpeg_gray(g8 * 16, precision=12,
                                       restart_interval=2))
    assert np.abs(out[:, :, 0].astype(int) - g8.astype(int)).mean() < 4
    with pytest.raises(ValueError, match="precision"):
        encode_jpeg_gray(g8, precision=10)


def _prog_test_image(h, w, rng):
    y, x = np.mgrid[0:h, 0:w]
    base = 128 + 80 * np.sin(x / 7.0) * np.cos(y / 5.0)
    img = np.stack([base, 255 - base, (x * 3 + y * 2) % 256], axis=2)
    return np.clip(img + rng.randint(-20, 21, size=img.shape),
                   0, 255).astype(np.uint8)


def test_progressive_decode_matches_baseline():
    """r11: progressive decode — both scan scripts (spectral
    selection only; one bit of successive approximation with DC/AC
    refinement scans) reconstruct BIT-IDENTICALLY to the baseline
    decode of the same quantized coefficients, across pad crops,
    noise (ZRL/large magnitudes), flats (pure EOB runs) and sparse
    spikes (cross-block EOBn with correction bits)."""
    rng = np.random.RandomState(17)
    cases = [
        _prog_test_image(13, 19, rng),
        rng.randint(0, 256, size=(24, 16, 3), dtype=np.uint8),
        np.full((17, 9, 3), 200, np.uint8),
        np.where(rng.rand(40, 40, 3) < 0.002,
                 rng.randint(0, 256, size=(40, 40, 3)),
                 128).astype(np.uint8),
    ]
    for img in cases:
        base = decode_jpeg(encode_jpeg_rgb(img))
        for succ in (False, True):
            prog = decode_jpeg(
                encode_jpeg_progressive(img, successive=succ))
            assert (prog == base).all(), (img.shape, succ)
    g = rng.randint(0, 256, size=(11, 17), dtype=np.uint8)
    gb = decode_jpeg(encode_jpeg_gray(g.astype(float),
                                      quant=np.full(64, 16)))
    for succ in (False, True):
        gp = decode_jpeg(encode_jpeg_progressive(g, successive=succ))
        assert (gp == gb).all(), succ


def test_progressive_truncated_stream_decodes_coarsely():
    """The point of progressive: cutting the stream after the early
    scans still yields a viewable approximation — the DC-only prefix
    decodes to the blockwise means, and each added scan reduces the
    error vs the full decode monotonically."""
    rng = np.random.RandomState(3)
    img = _prog_test_image(24, 24, rng)
    data = encode_jpeg_progressive(img, successive=True)
    # scan boundaries = every SOS marker
    sos = []
    i = 0
    while True:
        j = data.find(b"\xff\xda", i)
        if j < 0:
            break
        sos.append(j)
        i = j + 2
    # 2 DC scans + 3 components x 2 bands x (first + refine) = 14
    assert len(sos) == 14
    full = decode_jpeg(data).astype(int)
    errs = []
    for cut in (1, 4, 7, len(sos)):
        prefix = (data[:sos[cut]] if cut < len(sos) else data[:-2])
        part = decode_jpeg(prefix + b"\xff\xd9").astype(int)
        errs.append(np.abs(part - full).mean())
    assert errs[-1] == 0
    assert errs[0] > errs[1] >= errs[2] >= errs[3]


def test_dispatch_sniffs_jpeg():
    d = encode_jpeg_gray(np.full((8, 8), 200.0))
    assert sniff_format(d) == "jpeg"
    assert (decode_image(d) == 200).all()


def test_truncated_stream_fails_not_hangs():
    d = encode_jpeg_gray(np.arange(64, dtype=float).reshape(8, 8) * 3)
    with pytest.raises((ValueError, NotImplementedError, struct.error,
                        IndexError)):
        decode_jpeg(d[:20])


def test_decode_and_featurize_jpeg_spark(spark):
    """The Arrow mapInPandas stage decodes JPEG content for real: flat
    DC-only gray images of known level -> exact mean luma and dims."""
    from pyspark.sql import Row

    from xenoeye_spark.datapipe.multimodal import decode_and_featurize

    rows = []
    for i, level in enumerate([200, 104, 48]):
        data = encode_jpeg_gray(np.full((16, 8), float(level)),
                                quant=np.full(64, 16))
        rows.append(Row(media_id=i, content=bytearray(data)))
    df = spark.createDataFrame(rows)
    got = {r.media_id: r for r in decode_and_featurize(df).collect()}
    for i, level in enumerate([200, 104, 48]):
        assert (got[i].width, got[i].height) == (8, 16), i
        assert abs(got[i].mean_luma - level) < 0.6, (i, got[i].mean_luma)


# ----------------------------------------------- r12 corrupt-input fixes

def _sos_offsets(data):
    out, i = [], 0
    while True:
        j = data.find(b"\xff\xda", i)
        if j < 0:
            return out
        out.append(j)
        i = j + 2


def test_progressive_corrupt_scan_header_raises_valueerror():
    """r12 advice: out-of-range Ss/Se/Ah/Al or a missing huffman table
    in a progressive SOS must raise the corrupt-input ValueError, not
    numpy IndexError / dict KeyError."""
    rng = np.random.RandomState(5)
    img = _prog_test_image(16, 16, rng)
    data = encode_jpeg_progressive(img, successive=True)
    sos = _sos_offsets(data)
    assert len(sos) >= 3

    def patched(off, delta):
        b = bytearray(data)
        for k, v in delta.items():
            b[off + k] = v
        return bytes(b)

    # SOS layout: FF DA LL LL ns (cs tables)*ns ss se ahal.
    # The AC-first scans have ns=1 -> ss at off+7, se at off+8,
    # ahal at off+9; locate one by its ns byte.
    ac = next(o for o in sos[2:] if data[o + 4] == 1)
    for delta in (
        {8: 200},               # se > 63
        {7: 60, 8: 10},         # ss > se
        {9: 0xEE},              # ah/al out of range
        {6: 0x0F},              # AC huffman table 15: never defined
    ):
        with pytest.raises(ValueError, match="corrupt progressive"):
            decode_jpeg(patched(ac, delta))
    # a DC-first scan referencing an undefined DC table
    dc = sos[0]
    ns = data[dc + 4]
    b = bytearray(data)
    for c in range(ns):
        b[dc + 6 + 2 * c] = 0xF0          # Td=15 for every component
    with pytest.raises(ValueError, match="corrupt progressive"):
        decode_jpeg(bytes(b))


def test_fill_bytes_between_scans_are_skipped():
    """r12 advice: runs of 0xFF fill bytes (legal pad before any
    marker, T.81 B.1.1.2) between progressive scans must not derail
    the post-scan marker resume or the outer segment walk."""
    rng = np.random.RandomState(9)
    img = _prog_test_image(16, 24, rng)
    data = encode_jpeg_progressive(img, successive=False)
    ref = decode_jpeg(data)
    sos = _sos_offsets(data)
    assert len(sos) >= 2
    # splice 1-3 fill bytes ahead of every SOS after the first, and
    # before the EOI too
    padded = bytearray(data[:sos[1]])
    prev = sos[1]
    for n, off in enumerate(sos[2:] + [len(data) - 2], start=1):
        padded += b"\xff" * (1 + n % 3) + data[prev:off]
        prev = off
    padded += b"\xff\xff" + data[-2:]
    got = decode_jpeg(bytes(padded))
    assert (got == ref).all()
    # baseline streams tolerate fill bytes between header segments too
    g = encode_jpeg_gray(np.full((8, 8), 77.0))
    k = g.find(b"\xff\xdb")
    gb = g[:k] + b"\xff\xff\xff" + g[k:]
    assert (decode_jpeg(gb) == decode_jpeg(g)).all()
