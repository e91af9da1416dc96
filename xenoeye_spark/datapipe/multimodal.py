"""Multimodal columns — image/audio/video as opaque binary + typed metadata.

Design: media lives in a ``binary`` column next to a typed metadata struct
(mime, width/height or sample_rate/duration, codec). Decode / feature
extraction / resize / frame-sample run as Arrow-batched ``mapInPandas``
stages so each partition streams batches without materializing whole files
per row on the driver.

The actual codecs (PIL/libav) are not in this container, so the decode
kernels are STUBBED: ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder (seeded by the
content hash) produces plausible shapes — keeping the Spark-side plumbing
(schemas, batching, partitioning, UDF signatures) real and testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

IMAGE_META = T.StructType([
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
])

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("content", T.BinaryType()),
    T.StructField("meta", IMAGE_META),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_luma", T.DoubleType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def _fake_decode(content: bytes) -> np.ndarray:
    """Deterministic fake image decode: content hash seeds shape + pixels."""
    h = hashlib.sha256(content).digest()
    w = 16 + h[0] % 48
    ht = 16 + h[1] % 48
    rng = np.random.RandomState(int.from_bytes(h[2:6], "big"))
    return rng.randint(0, 256, size=(ht, w, 3), dtype=np.uint8)


def decode_and_featurize(
    media: DataFrame, fake: bool = False, feat_dim: int = 8
) -> DataFrame:
    """mapInPandas stage: binary -> (dims, mean luma, tiny feature vector).

    Real decoders would slot into ``_decode`` unchanged — the batch shape,
    schema, and partitioning are production-real; only the kernel is fake.
    """

    def _decode(content: bytes) -> np.ndarray:
        if not fake:
            raise NotImplementedError(
                "image codecs not available in this environment; "
                "pass fake=True for the deterministic test decoder"
            )
        return _fake_decode(content)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                img = _decode(bytes(content))
                luma = float(
                    0.299 * img[..., 0].mean()
                    + 0.587 * img[..., 1].mean()
                    + 0.114 * img[..., 2].mean()
                )
                # fixed-dim pooled feature: mean over a feat_dim x-grid
                cols = np.array_split(img.mean(axis=(0, 2)), feat_dim)
                feat = np.array([c.mean() for c in cols], dtype=np.float32)
                rows.append(
                    (int(mid), img.shape[1], img.shape[0], luma, feat.tolist())
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "mean_luma", "feature"]
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def make_fake_media_df(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        content = bytes(rng.randint(0, 256, size=128, dtype=np.uint8))
        rows.append((i, content, ("image/fake", None, None, 3)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
