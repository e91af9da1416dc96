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


def write_training_shards(
    df: DataFrame,
    path: str,
    order_col: str,
    rows_per_shard: int,
    id_col: str | None = None,
) -> int:
    """Materialize a curated corpus as DETERMINISTIC, evenly-sized
    parquet shards — the hand-off format a training loader consumes
    (fixed shard size for balanced data-parallel reads; a stable global
    order so shard i holds the same rows on every rerun).

    The global rank is computed the scale-correct way — NOT one
    Window.orderBy (a single-reducer global sort): range-partition on
    the order key, count per partition (a tiny collect, <=
    shuffle.partitions rows), broadcast the cumulative offsets back,
    and rank = offset + per-partition row_number. One range exchange +
    one bounded-size driver round-trip, fully parallel at any volume.
    Pass ``id_col`` whenever ``order_col`` can repeat — it totalizes
    the order, which is what makes both the rank and the range
    boundaries deterministic across reruns.
    (``datapipe.sampling.permuted_order`` of an id column is the usual
    ``order_col`` — a seeded global document shuffle.)

    Shard i = ranks [i*rows_per_shard, (i+1)*rows_per_shard); written
    ``partitionBy("_shard")`` with a per-file row cap. Returns the
    shard count. Reading ``path`` back ordered by (_shard, order
    columns) reproduces the exact writer order.
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if rows_per_shard <= 0:
        raise ValueError("rows_per_shard must be positive")
    order_cols = [order_col] + ([id_col] if id_col else [])
    ranged = (
        df.repartitionByRange(*[F.col(c).asc() for c in order_cols])
        .withColumn("_pid", F.spark_partition_id())
        # two passes (counts, then rank+write) must see ONE partition
        # layout; persist pins it
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        counts = ranged.groupBy("_pid").count().collect()
        offsets, acc = {}, 0
        for r in sorted(counts, key=lambda r: r["_pid"]):
            offsets[r["_pid"]] = acc
            acc += r["count"]
        if acc == 0:
            return 0
        spark = df.sparkSession
        off_df = F.broadcast(
            spark.createDataFrame(
                [(int(k), int(v)) for k, v in offsets.items()],
                "_pid int, _off long",
            )
        )
        w = Window.partitionBy("_pid").orderBy(
            *[F.col(c).asc() for c in order_cols]
        )
        sharded = (
            ranged.join(off_df, "_pid")
            .withColumn(
                "_shard",
                F.floor(
                    (F.col("_off") + F.row_number().over(w) - 1)
                    / rows_per_shard
                ).cast("long"),
            )
            .drop("_pid", "_off")
        )
        (
            sharded.sortWithinPartitions("_shard", *order_cols)
            .write.mode("overwrite")
            .option("maxRecordsPerFile", rows_per_shard)
            .partitionBy("_shard")
            .parquet(path)
        )
        return -(-acc // rows_per_shard)
    finally:
        ranged.unpersist()
