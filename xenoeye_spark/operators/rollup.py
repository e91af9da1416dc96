"""Hierarchical time rollup — multi-granularity aggregates from ONE
finest-grain shuffle.

The reference materializes one fixed window per fwm config
(`monit-objects-fwm.c`, time window -> flat table); downstream dashboards
then re-aggregate hour/day in the DBMS (EXTRA.md's xe_rep pattern). A
100-TB Spark engine should not re-shuffle the raw stream once per grain:
``time_rollup`` aggregates the base stream ONCE at the finest grain, then
derives every coarser grain by re-aggregating the (tiny) finest-grain
result — the additive-measure property (SUM/COUNT roll up losslessly)
that makes hypertable-style continuous aggregates cheap.

Cost shape at scale: one wide shuffle over (keys, finest bucket) at
input cardinality, then K-1 re-aggs over the aggregate table, which is
orders of magnitude smaller. The naive GROUPING SETS formulation
re-expands every input row once per grain BEFORE the shuffle — Spark's
``Expand`` node multiplies shuffle volume by the grain count, which is
exactly the bottleneck at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# grain name -> date_trunc unit, ordered finest-first. date_trunc keeps
# the bucket a TIMESTAMP at every grain so the union's schema is stable.
GRAINS = {"minute": "minute", "hour": "hour", "day": "day", "week": "week"}


def time_rollup(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    value_col: str,
    grains: list[str] = ("hour", "day"),
) -> DataFrame:
    """Roll ``value_col`` up to every grain in ``grains`` (finest first).

    Output: ``grain`` (name), ``bucket_ts`` (date_trunc'd timestamp),
    ``*keys``, ``n_rows``, ``sum_value`` — one row per (grain, bucket,
    keys) combination, all grains unioned.
    """
    unknown = [g for g in grains if g not in GRAINS]
    if unknown:
        raise ValueError(f"unknown grains {unknown}; pick from {list(GRAINS)}")
    order = [g for g in GRAINS if g in grains]
    finest = order[0]

    base = df.groupBy(
        F.date_trunc(GRAINS[finest], F.col(ts_col)).alias("bucket_ts"), *keys
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(value_col)).alias("sum_value"),
    )
    out = base.select(F.lit(finest).alias("grain"), "bucket_ts", *keys,
                      "n_rows", "sum_value")
    # coarser grains re-aggregate the FINEST result, not the raw input:
    # COUNT rolls up as SUM(n_rows), SUM as SUM(sum_value)
    for g in order[1:]:
        coarser = base.groupBy(
            F.date_trunc(GRAINS[g], F.col("bucket_ts")).alias("bucket_ts"),
            *keys,
        ).agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("sum_value").alias("sum_value"),
        )
        out = out.unionByName(
            coarser.select(F.lit(g).alias("grain"), "bucket_ts", *keys,
                           "n_rows", "sum_value")
        )
    return out
