"""Multimodal plumbing tests: schema/batch shapes are real, decode kernels
stubbed behind fake=True (no image/audio libs in this container)."""

from __future__ import annotations

import numpy as np
import pytest

from xenoeye_spark.datapipe.multimodal import (
    decode_and_featurize,
    make_fake_media_df,
    resize_images,
    sample_frames,
)


def test_decode_and_featurize_shapes(spark):
    media = make_fake_media_df(spark, n=12)
    out = decode_and_featurize(media, fake=True, feat_dim=8).collect()
    assert len(out) == 12
    for r in out:
        assert 16 <= r["width"] <= 64 and 16 <= r["height"] <= 64
        assert 0.0 <= r["mean_luma"] <= 255.0
        assert len(r["feature"]) == 8


def test_decode_deterministic(spark):
    media = make_fake_media_df(spark, n=4)
    a = {r["media_id"]: r["mean_luma"]
         for r in decode_and_featurize(media, fake=True).collect()}
    b = {r["media_id"]: r["mean_luma"]
         for r in decode_and_featurize(media.repartition(3), fake=True).collect()}
    assert a == b  # partitioning must not change results


def test_decode_stub_raises_without_fake(spark):
    media = make_fake_media_df(spark, n=1)
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        decode_and_featurize(media, fake=False).collect()


def test_resize_images(spark):
    media = make_fake_media_df(spark, n=3)
    out = resize_images(media, out_w=8, out_h=6, fake=True).collect()
    for r in out:
        assert r["width"] == 8 and r["height"] == 6
        px = np.frombuffer(bytes(r["pixels"]), dtype=np.uint8)
        assert px.shape[0] == 8 * 6 * 3


def test_sample_frames(spark):
    media = make_fake_media_df(spark, n=2)
    out = sample_frames(media, every_n=10, n_frames=30, fake=True).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 10, 20] for v in by_id.values())
    # different frames of the same media differ (per-frame decode)
    lumas = {(r["media_id"], r["frame_idx"]): r["mean_luma"] for r in out}
    assert lumas[(0, 0)] != lumas[(0, 10)]
