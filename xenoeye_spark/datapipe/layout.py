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

    The global rank is the classic distributed zipWithIndex — NOT one
    Window.orderBy (a single-reducer global sort) and NOT a second
    full-data exchange: range-partition + sort WITHIN partitions on
    the order key once, count per partition (a tiny collect, <=
    shuffle.partitions rows), then stamp rank = partition offset +
    local position in an Arrow ``mapInPandas`` pass over the SAME
    pinned partitions. One range exchange total, at any volume; rank
    arithmetic is int64 end-to-end. Pass ``id_col`` whenever
    ``order_col`` can repeat — it totalizes the order, which is what
    makes both the rank and the range boundaries deterministic across
    reruns. (``datapipe.sampling.permuted_order`` of an id column is
    the usual ``order_col`` — a seeded global document shuffle.)

    Shard i = ranks [i*rows_per_shard, (i+1)*rows_per_shard); written
    ``partitionBy("_shard")`` with a per-file row cap — rows leave the
    map already in (_shard, order) order. An EMPTY input still
    overwrites ``path`` (a previous run's shards must not survive as
    stale data). Returns the shard count. Reading ``path`` back
    ordered by (_shard, order columns) reproduces the exact writer
    order.
    """
    from pyspark import StorageLevel, TaskContext
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if rows_per_shard <= 0:
        raise ValueError("rows_per_shard must be positive")
    reserved = {"_pid", "_shard"} & set(df.columns)
    if reserved:
        raise ValueError(f"input uses reserved column names: {sorted(reserved)}")
    order_cols = [order_col] + ([id_col] if id_col else [])
    asc = [F.col(c).asc() for c in order_cols]
    ranged = (
        df.repartitionByRange(*asc)
        .sortWithinPartitions(*asc)
        .withColumn("_pid", F.spark_partition_id())
        # two passes (counts, then rank+write) must see ONE partition
        # layout; persist pins it
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        counts = ranged.groupBy("_pid").count().collect()
        offsets, acc = {}, 0
        for r in sorted(counts, key=lambda r: r["_pid"]):
            offsets[int(r["_pid"])] = acc
            acc += r["count"]
        out_schema = T.StructType(
            [f for f in ranged.schema.fields if f.name != "_pid"]
            + [T.StructField("_shard", T.LongType())]
        )
        data_cols = [f.name for f in out_schema.fields if f.name != "_shard"]

        def stamp(batches):
            ctx = TaskContext.get()
            pid = ctx.partitionId() if ctx is not None else 0
            off = offsets.get(pid, 0)
            seen = 0
            import numpy as np

            for pdf in batches:
                n = len(pdf)
                if not n:
                    continue
                if (pdf["_pid"] != pid).any():
                    raise RuntimeError(
                        "cached partition id drifted from task partition id"
                    )
                out = pdf[data_cols].copy()
                # int64 throughout — a double-division floor would lose
                # rank exactness past 2^53
                out["_shard"] = (
                    off + seen + np.arange(n, dtype=np.int64)
                ) // rows_per_shard
                seen += n
                yield out

        sharded = ranged.mapInPandas(stamp, out_schema)
        # rows arrive already in (_shard, order) order per partition
        (
            sharded.write.mode("overwrite")
            .option("maxRecordsPerFile", rows_per_shard)
            .partitionBy("_shard")
            .parquet(path)
        )
        return -(-acc // rows_per_shard)
    finally:
        ranged.unpersist()
