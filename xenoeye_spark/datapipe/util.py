"""Shared datapipe plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Guard a CPU-bound per-row kernel against an under-partitioned scan.

    A parquet file with one row group is unsplittable, so a small corpus
    can reach a heavy projection (winnowing grams, simhash bit-votes,
    shingle windows, media decode) as a SINGLE partition — the whole
    stage then runs on one core regardless of cluster size. When the
    input has fewer partitions than the session's default parallelism,
    repartition up to it (one narrow shuffle of ids+payload, measured 9x
    on the sf0.1 winnowing grams stage).

    At 100-TB scale the scan yields orders of magnitude more splits than
    cores, the condition is false, and this is a no-op — the guard never
    forces a shuffle onto a well-partitioned corpus.

    Call this on SCAN-LEVEL inputs only (file read + narrow projections):
    probing ``df.rdd.getNumPartitions()`` under AQE finalizes the plan,
    which for a DataFrame with upstream exchanges can execute those
    stages eagerly.
    """
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
