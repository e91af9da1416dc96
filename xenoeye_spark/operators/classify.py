"""Classification — periodic top-percent model build + per-record labeling.

Reference: classification.c. Every cycle: aggregate flows by the classifier
key fields with a single SUM value, sort descending, keep classes until the
cumulative value covers ``top_percents`` % of the total
(classification.c:540-608, two passes: total then scan), then stamp the
class label onto subsequent flows via lookup (classification.c:873-958;
unmatched -> empty string, :954-956).

Spark shape: the model is a small aggregated table -> broadcast stream-static
join stamps labels on the next micro-batch (SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_percent_classes(
    agg_df: DataFrame,
    key_cols: list[str],
    val_col: str,
    top_percents: int,
) -> DataFrame:
    """Keep the sorted-desc rows whose *preceding* cumulative sum has not yet
    reached ``top_percents`` % of the total — i.e. emit classes until
    coverage is reached, inclusive of the row that crosses the line.

    Deterministic under ties: orders by (val desc, keys asc).
    The aggregated class table is tiny, so the single-partition window over
    it is not a scale concern (the heavy lifting is the upstream groupBy).
    """
    order = [F.col(val_col).desc()] + [F.col(k).asc_nulls_last() for k in key_cols]
    w_cum = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    with_cum = agg_df.withColumn(
        "_prev_cum", F.coalesce(F.sum(F.col(val_col)).over(w_cum), F.lit(0))
    ).withColumn("_total", F.sum(F.col(val_col)).over(Window.partitionBy()))
    kept = with_cum.filter(
        F.col("_prev_cum") * F.lit(100) < F.lit(top_percents) * F.col("_total")
    )
    return kept.drop("_prev_cum", "_total")


def stamp_classes(
    flows: DataFrame,
    class_table: DataFrame,
    key_cols: list[str],
    class_col: str = "class0",
    name_col: str = "class_name",
) -> DataFrame:
    """Stamp the class label onto flows via broadcast join; unmatched rows
    get '' (classification.c:954-956)."""
    ct = class_table.select(
        *[F.col(k) for k in key_cols], F.col(name_col).alias("_cls_name")
    )
    out = flows.join(F.broadcast(ct), on=key_cols, how="left")
    return out.withColumn(class_col, F.coalesce(F.col("_cls_name"), F.lit(""))).drop(
        "_cls_name"
    )
