"""MJPEG-in-AVI video path: RIFF walk + per-frame baseline-JPEG decode
through the real sample_frames kernel, with planted per-frame levels
the decode must reproduce exactly."""

from __future__ import annotations

import numpy as np
import pytest

from xenoeye_spark.datapipe.codecs_avi import avi_frames, encode_avi_mjpeg
from xenoeye_spark.datapipe.codecs_jpeg import decode_jpeg, encode_jpeg_gray


def _mjpeg(levels, size=16):
    frames = [
        encode_jpeg_gray(np.full((size, size), float(v)),
                         quant=np.full(64, 16))
        for v in levels
    ]
    return encode_avi_mjpeg(frames, size, size)


def test_riff_walk_yields_frames_in_order():
    levels = [40, 50, 60, 70, 80, 200]
    got = list(avi_frames(_mjpeg(levels)))
    assert len(got) == 6
    for v, f in zip(levels, got):
        assert (decode_jpeg(f) == v).all()


def test_odd_sized_frame_chunks_stay_aligned():
    """A JPEG payload of odd length forces the RIFF pad byte; the walk
    must not desynchronize on it."""
    levels = list(range(40, 200, 8))
    avi = _mjpeg(levels, size=8)
    frames = list(avi_frames(avi))
    assert len(frames) == len(levels)
    odd = [f for f in frames if len(f) & 1]
    assert odd, "fixture never exercised an odd-length chunk"
    for v, f in zip(levels, frames):
        assert (decode_jpeg(f) == v).all()


def test_not_avi_raises():
    with pytest.raises(ValueError, match="not an AVI"):
        list(avi_frames(b"RIFX" + bytes(20)))


def test_sample_frames_real_mjpeg_spark(spark):
    """The Arrow stage decodes sampled frames for real: every 2nd frame
    of 6, planted flat levels -> exact lumas; a non-AVI row raises the
    honest NotImplementedError."""
    from pyspark.sql import Row

    from xenoeye_spark.datapipe.multimodal import sample_frames

    levels = [40, 50, 60, 70, 80, 90]
    df = spark.createDataFrame(
        [Row(media_id=1, content=bytearray(_mjpeg(levels)))]
    )
    got = sorted(
        (r.frame_idx, r.mean_luma)
        for r in sample_frames(df, every_n=2, n_frames=6).collect()
    )
    assert got == [(0, 40.0), (2, 60.0), (4, 80.0)]

    bad = spark.createDataFrame(
        [Row(media_id=2, content=bytearray(b"\x00" * 64))]
    )
    with pytest.raises(Exception, match="MJPEG-in-AVI"):
        sample_frames(bad, every_n=2, n_frames=4).collect()
