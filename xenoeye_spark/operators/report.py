"""Report helper — the reference's recommended downstream report pattern.

The reference ships a PL/pgSQL function ``xe_rep`` (EXTRA.md:296-342) that
builds time-series reports from exported fwm tables: pick the overall
top-N keys for the whole period, then per time bucket emit those keys'
values, rolling everything else into one 'Other' series — the classic
"top talkers over time" chart feed.

Spark shape: two aggregations over the (already small) exported table —
global top-N via TakeOrdered, then a broadcast semi-join membership test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def xe_rep(
    exported: DataFrame,
    key_col: str,
    val_col: str,
    n: int,
    time_col: str = "time",
    other_label: str = "Other",
) -> DataFrame:
    """(time, key, val) -> per-bucket series for the period's overall top-N
    keys + an 'Other' rollup series.

    Output: time, series (key as string or 'Other'), ``val_col`` summed.
    Deterministic: top-N ties break on key ascending.
    """
    totals = (
        exported.groupBy(key_col)
        .agg(F.sum(val_col).alias("_tot"))
        .orderBy(F.col("_tot").desc(), F.col(key_col).asc())
        .limit(n)
        .select(F.col(key_col).alias("_top_key"))
    )
    joined = exported.join(
        F.broadcast(totals),
        exported[key_col] == totals["_top_key"],
        "left",
    )
    series = F.when(
        F.col("_top_key").isNotNull(), F.col(key_col).cast("string")
    ).otherwise(F.lit(other_label))
    return (
        joined.groupBy(F.col(time_col), series.alias("series"))
        .agg(F.sum(val_col).alias(val_col))
    )


def mfreq_batch(
    df: DataFrame,
    col1: str,
    col2: str,
) -> DataFrame:
    """Batch semantics for the reference's ``mfreq(f1,f2)`` (filter.c:711-751):
    per row, return whichever of the two values occurs more often across
    BOTH columns in the dataset; ties -> the smaller value.

    The reference updates a shared 2^16-slot frequency map per flow, so its
    result depends on arrival order; the batch definition here is the
    fixed point (frequencies over the whole dataset) — documented
    divergence, deterministic and SQL-expressible. Adds column ``mfreq``.

    Scale: the frequency table is at most 2^16 distinct port values —
    always broadcastable; two broadcast joins, no fact-table shuffle.
    """
    freq = (
        df.select(F.col(col1).alias("v"))
        .unionAll(df.select(F.col(col2).alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    f1 = freq.select(F.col("v").alias("_v1"), F.col("n").alias("_n1"))
    f2 = freq.select(F.col("v").alias("_v2"), F.col("n").alias("_n2"))
    out = (
        df.join(F.broadcast(f1), df[col1] == f1["_v1"], "left")
        .join(F.broadcast(f2), df[col2] == f2["_v2"], "left")
    )
    n1 = F.coalesce(F.col("_n1"), F.lit(0))
    n2 = F.coalesce(F.col("_n2"), F.lit(0))
    pick = (
        F.when(n1 > n2, F.col(col1))
        .when(n2 > n1, F.col(col2))
        .otherwise(F.least(F.col(col1), F.col(col2)))
    )
    return out.withColumn("mfreq", pick).drop("_v1", "_n1", "_v2", "_n2")
