"""Top-N with an "others" rollup row.

Reference: monit-objects-fwm.c:403-481 — after sorting the window's
aggregated rows, emit the first ``limit`` rows, then sum the remainder's
aggregate values into ONE row whose key columns are all NULL.

Scale design: the input is *post-aggregation* (one row per distinct key per
window — orders of magnitude smaller than the flow stream), so a
window-function rank per time bucket is cheap. We rank with row_number over
(partition=time window, order=sort spec + full key tiebreak) — the tiebreak
makes results deterministic under ties, which the reference achieves by
byte-comparing composite trie keys (monit-objects-fwm.c:496-589).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_n_with_others(
    df: DataFrame,
    key_cols: list[str],
    val_cols: list[str],
    order_by: list[Column],
    n: int,
    partition_by: list[str] | None = None,
    others: bool = True,
) -> DataFrame:
    """Keep the top-``n`` rows per partition (e.g. per time window); roll the
    rest into one NULL-keyed row per partition summing ``val_cols``.

    ``order_by`` should already include deterministic tiebreaks; we append
    the key columns as final tiebreak automatically.
    """
    part = partition_by or []
    order = list(order_by) + [F.col(k).asc_nulls_last() for k in key_cols]
    w = Window.partitionBy(*[F.col(p) for p in part]).orderBy(*order)
    ranked = df.withColumn("_rn", F.row_number().over(w))

    top = ranked.filter(F.col("_rn") <= n).drop("_rn")
    if not others:
        return top

    rest = ranked.filter(F.col("_rn") > n).drop("_rn")
    others_row = rest.groupBy(*[F.col(p) for p in part]).agg(
        *[F.sum(F.col(v)).alias(v) for v in val_cols],
        F.count(F.lit(1)).alias("_cnt"),
    )
    # a global (no-partition) aggregate over an empty remainder yields one
    # all-NULL row — the reference emits others only when remainder exists
    # (monit-objects-fwm.c:459-481)
    others_row = others_row.filter(F.col("_cnt") > 0).drop("_cnt")
    # NULL key columns for the rollup row (monit-objects-fwm.c:449-457)
    for k in key_cols:
        others_row = others_row.withColumn(k, F.lit(None))
    return top.unionByName(others_row.select(top.columns))
