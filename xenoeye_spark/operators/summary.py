"""Distribution summaries: exact and approximate per-group quantiles.

The exact path uses Spark's ``percentile`` aggregate (sort-based, linear
interpolation between closest ranks — the same definition as DuckDB's
``quantile_cont``, which is what makes the driver oracle a bit-for-bit
check). Exact percentile buffers each group's values in the aggregation
state, so it is for BOUNDED groups: per-source document stats, per-day
latency columns — fine at millions of rows per group, wrong at billions.

The scale path is ``approx_percentile`` (Greenwald-Khanna sketch):
constant state per group (controlled by ``accuracy``), map-side
combinable, mergeable across partitions — the 100-TB default. Both run
through the same API; callers pick with ``exact=``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_quantiles(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    probs: list[float] = (0.5, 0.9, 0.99),
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group quantiles of ``value_col`` at each probability in
    ``probs``, one output column ``p<prob-without-dot>`` each (p50, p90,
    p99, ...), rounded to 6 decimals, plus ``n_rows``."""
    for p in probs:
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"probability {p} outside [0, 1]")

    def name(p: float) -> str:
        # percentile naming: 0.5 -> p50, 0.99 -> p99, 0.999 -> p99_9
        v = p * 100
        return f"p{int(v)}" if v.is_integer() else f"p{v:g}".replace(".", "_")

    aggs = []
    for p in probs:
        if exact:
            c = F.expr(f"percentile({value_col}, {p!r})")
        else:
            c = F.expr(f"approx_percentile({value_col}, {p!r}, {accuracy})")
        aggs.append(F.round(c, 6).alias(name(p)))
    aggs.append(F.count(F.lit(1)).cast("long").alias("n_rows"))
    return df.groupBy(*keys).agg(*aggs)
