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

    if not others:
        return ranked.filter(F.col("_rn") <= n).drop("_rn")

    # Single-pass formulation: rows beyond the cut get their keys nullified
    # (monit-objects-fwm.c:449-457), then ONE re-aggregation merges them
    # into the others row while top rows stay singleton groups (input is
    # post-aggregation: unique per (partition, keys)). The filter+union
    # alternative evaluates the whole upstream plan twice — at scale that
    # doubles the scan+agg cost. No remainder -> no others group, matching
    # monit-objects-fwm.c:459-481.
    is_top = F.col("_rn") <= n
    nullified = [
        F.when(is_top, F.col(k)).otherwise(F.lit(None)).alias(k)
        for k in key_cols
    ]
    out_cols = list(df.columns)
    return (
        ranked.select(
            *[F.col(p) for p in part],
            *nullified,
            *[F.col(v) for v in val_cols],
            # _is_top in the key keeps a genuine all-NULL-key top row from
            # merging with the rollup row
            is_top.alias("_is_top"),
        )
        .groupBy(*part, *key_cols, "_is_top")
        .agg(*[F.sum(F.col(v)).alias(v) for v in val_cols])
        .drop("_is_top")
        .select(out_cols)
    )
