"""Property-based codec round-trips (hypothesis): arbitrary pixel/
sample arrays must survive encode->decode — lossless formats exactly,
JPEG at q=1 within its documented tolerance. No Spark fixture."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from xenoeye_spark.datapipe.codecs import (
    decode_bmp, decode_ppm, decode_wav, encode_bmp, encode_ppm,
    encode_wav,
)
from xenoeye_spark.datapipe.codecs_jpeg import decode_jpeg, encode_jpeg_gray
from xenoeye_spark.datapipe.codecs_png import decode_png, encode_png


def _img(draw, maxdim=24, channels=3):
    h = draw(st.integers(1, maxdim))
    w = draw(st.integers(1, maxdim))
    data = draw(st.binary(min_size=h * w * channels,
                          max_size=h * w * channels))
    a = np.frombuffer(data, dtype=np.uint8)
    return a.reshape((h, w, channels) if channels > 1 else (h, w)).copy()


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_ppm_roundtrip_exact(data):
    img = _img(data.draw)
    assert (decode_ppm(encode_ppm(img)) == img).all()


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_bmp_roundtrip_exact(data):
    img = _img(data.draw)
    assert (decode_bmp(encode_bmp(img)) == img).all()


@settings(max_examples=25, deadline=None)
@given(st.data(), st.sampled_from([0, 1, 2, 3, 4]))
def test_png_roundtrip_exact_any_filter(data, ft):
    img = _img(data.draw)
    assert (decode_png(encode_png(img, ctype=2, filter_type=ft))
            == img).all()


@settings(max_examples=15, deadline=None)
@given(st.data())
def test_jpeg_gray_roundtrip_q1_bounded(data):
    img = _img(data.draw, maxdim=20, channels=1).astype(float)
    out = decode_jpeg(encode_jpeg_gray(img, quant=np.full(64, 1)))
    assert out.shape == (*img.shape, 3)
    assert np.abs(out[:, :, 0].astype(float) - img).max() <= 2.0


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 400),
    st.integers(1, 2),
    st.integers(8000, 48000),
    st.binary(min_size=2, max_size=800),
)
def test_wav_roundtrip_exact(n, ch, rate, raw):
    vals = np.frombuffer(raw, dtype="<i2" if len(raw) % 2 == 0 else np.int8)
    frames = (len(vals) // ch) or 1
    samples = np.resize(vals.astype(np.int32), (frames, ch))
    samples = np.clip(samples, -32768, 32767)
    got, got_rate = decode_wav(encode_wav(samples.astype(np.int16), rate))
    assert got_rate == rate
    assert (got == samples).all()


@settings(max_examples=20, deadline=None)
@given(st.data())
def test_gif_roundtrip_exact(data):
    from xenoeye_spark.datapipe.codecs_gif import decode_gif, encode_gif

    npal = data.draw(st.integers(2, 256))
    h = data.draw(st.integers(1, 20))
    w = data.draw(st.integers(1, 20))
    raw = data.draw(st.binary(min_size=h * w, max_size=h * w))
    pal = np.arange(npal * 3, dtype=np.int64).astype(np.uint8).reshape(-1, 3)
    idx = (np.frombuffer(raw, dtype=np.uint8) % npal).reshape(h, w)
    assert (decode_gif(encode_gif(idx, pal)) == pal[idx]).all()


@settings(max_examples=20, deadline=None)
@given(st.data(), st.sampled_from(["<", ">"]), st.integers(1, 8))
def test_tiff_roundtrip_exact(data, endian, rps):
    from xenoeye_spark.datapipe.codecs_tiff import decode_tiff, encode_tiff

    img = _img(data.draw)
    out = decode_tiff(encode_tiff(img, endian=endian, rows_per_strip=rps))
    assert (out == img).all()
