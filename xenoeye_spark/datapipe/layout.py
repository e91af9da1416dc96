"""Physical-layout helpers: bucketed tables for co-located joins.

At 100 TB the dominant cost of a repeated equi-join (corpus ↔ signature
table, flows ↔ per-key state snapshots, embeddings ↔ cluster assignment)
is re-shuffling both sides on every run. Spark's answer is BUCKETED
tables: write each side hash-partitioned into the same number of buckets
on the join key, and every later sort-merge join reads bucket i against
bucket i with NO Exchange on either side — the shuffle is paid once, at
write time, and amortized over every subsequent join/aggregation on that
key (tests assert the exchange-free plan).

Requirements Spark imposes (and this module encodes):
- bucketed data must be written via ``saveAsTable`` (the bucket spec
  lives in the table catalog; plain ``parquet(path)`` silently drops it);
- both sides must bucket on the same columns with compatible bucket
  counts (equal, or one a multiple of the other with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``);
- reads must go through ``spark.table`` so the catalog supplies the
  output partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Materialize ``df`` as a bucketed (optionally per-bucket sorted)
    parquet table in the session catalog. Sorting by the join key on top
    of bucketing lets sort-merge joins skip the per-task sort too."""
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    w = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket columns.
    With matching bucket specs the physical plan contains no Exchange —
    each task reads bucket i of both tables (asserted in
    tests/test_round4_ops.py::test_bucketed_join_is_shuffle_free)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
