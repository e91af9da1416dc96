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


def quantile_clip(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    lo: float = 0.01,
    hi: float = 0.99,
    exact: bool = True,
    accuracy: int = 10000,
    out_col: str = "clipped",
) -> DataFrame:
    """Per-group winsorization (r9): clamp ``value_col`` into its
    group's [lo, hi] quantile band — the standard outlier guard before
    any mean-based weighting of quality/length signals (a handful of
    pathological documents otherwise dominate a source's average).
    Keeps every input column and adds ``out_col`` (double, 6 decimals).

    Bounds use the same exact-``percentile`` / GK-sketch pair as
    group_quantiles (exact buffers a group's values — bounded groups;
    ``exact=False`` is the 100-TB path), rounded to 6 decimals BEFORE
    the clamp so the comparison is engine-exact and a SQL oracle can
    re-derive every clipped value with quantile_cont.

    Scale shape: inherently two-pass (bounds, then clamp) — but the
    bounds pass collapses to one row per group map-side, the bounds
    table is dimension-sized, and Catalyst broadcasts it back for the
    clamp join; the clamp itself is a pure projection.

    NULL groups: a NULL key value is a legitimate group — the bounds
    join is null-safe (``eqNullSafe``, r10 fix), matching groupBy's
    own semantics (and DuckDB's GROUP BY), so NULL-keyed rows clamp
    against their own group's band instead of silently vanishing from
    the output through an inner equi-join.
    """
    from functools import reduce as _reduce

    if not 0.0 <= lo <= hi <= 1.0:
        raise ValueError(
            f"quantile_clip: need 0 <= lo <= hi <= 1 (got {lo}, {hi})"
        )
    bkeys = {k: f"_qk_{k}" for k in keys}
    reserved = ({"_qlo", "_qhi", out_col} | set(bkeys.values())) \
        & set(df.columns)
    if reserved:
        raise ValueError(
            f"quantile_clip: input columns {sorted(reserved)} collide "
            "with the operator's working/output names — rename them"
        )
    fn = "percentile" if exact else "approx_percentile"
    acc = "" if exact else f", {accuracy}"
    bounds = df.groupBy(*keys).agg(
        F.round(F.expr(f"{fn}({value_col}, {lo!r}{acc})"), 6).alias("_qlo"),
        F.round(F.expr(f"{fn}({value_col}, {hi!r}{acc})"), 6).alias("_qhi"),
    ).select(
        *[F.col(k).alias(bk) for k, bk in bkeys.items()], "_qlo", "_qhi"
    )
    cond = _reduce(
        lambda a, b: a & b,
        [F.col(k).eqNullSafe(F.col(bk)) for k, bk in bkeys.items()],
    )
    v = F.col(value_col).cast("double")
    return (
        df.join(bounds, cond)
        .withColumn(
            out_col,
            F.round(F.least(F.greatest(v, F.col("_qlo")), F.col("_qhi")), 6),
        )
        .drop("_qlo", "_qhi", *bkeys.values())
    )


def quantile_bucket(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    probs: list[float] = (1 / 3, 2 / 3),
    labels: list[str] = ("head", "middle", "tail"),
    exact: bool = True,
    accuracy: int = 10000,
    out_col: str = "bucket",
) -> DataFrame:
    """Per-group quantile BUCKETING — label every row by which
    inter-quantile band of its group it falls in. The CCNet move
    (Wenzek et al. 2020: split each language's corpus into head /
    middle / tail by LM-perplexity terciles, then train on the head):
    compose ``bigram_lm_score`` (or any score) into this and the
    default terciles give exactly that split; it is equally the
    length-band / quality-band stratifier.

    Row with value v gets labels[i] for the FIRST cut c_i (the probs
    quantiles of its OWN group, in order) with v <= c_i, else the last
    label — so labels[0] is the LOW end (for perplexity: head = most
    fluent). Cut points round to 6 decimals BEFORE the comparison
    (the quantile_clip trick) so every label is engine-exact and a
    SQL oracle re-derives it with quantile_cont. NULL values get a
    NULL label (no evidence); NULL group keys are a legitimate group
    (eqNullSafe join, groupBy's own semantics).

    Scale shape: quantile_clip's two-pass — a one-row-per-group
    bounds aggregation (exact percentile buffers bounded groups;
    ``exact=False`` is the GK-sketch 100-TB path), the dimension-sized
    cuts table broadcast back, and the labeling itself a pure
    projection. No window, no per-group reducer.
    """
    from functools import reduce as _reduce

    if len(labels) != len(probs) + 1:
        raise ValueError(
            f"quantile_bucket: need len(labels) == len(probs) + 1 "
            f"(got {len(labels)} labels for {len(probs)} cuts)"
        )
    if list(probs) != sorted(set(probs)) or not probs:
        raise ValueError(
            "quantile_bucket: probs must be strictly increasing and "
            "non-empty"
        )
    if not (0.0 < probs[0] and probs[-1] < 1.0):
        raise ValueError("quantile_bucket: probs must lie in (0, 1)")
    bkeys = {k: f"_qk_{k}" for k in keys}
    cut_cols = [f"_qc_{i}" for i in range(len(probs))]
    reserved = (set(cut_cols) | {out_col} | set(bkeys.values())) \
        & set(df.columns)
    if reserved:
        raise ValueError(
            f"quantile_bucket: input columns {sorted(reserved)} collide "
            "with the operator's working/output names — rename them"
        )
    fn = "percentile" if exact else "approx_percentile"
    acc = "" if exact else f", {accuracy}"
    cuts = df.groupBy(*keys).agg(*[
        F.round(F.expr(f"{fn}({value_col}, {p!r}{acc})"), 6).alias(c)
        for p, c in zip(probs, cut_cols)
    ]).select(
        *[F.col(k).alias(bk) for k, bk in bkeys.items()], *cut_cols
    )
    cond = _reduce(
        lambda a, b: a & b,
        [F.col(k).eqNullSafe(F.col(bk)) for k, bk in bkeys.items()],
    )
    v = F.col(value_col).cast("double")
    label = F.lit(labels[-1])
    for c, lab in zip(reversed(cut_cols), reversed(labels[:-1])):
        label = F.when(v <= F.col(c), F.lit(lab)).otherwise(label)
    label = F.when(v.isNull(), F.lit(None).cast("string")).otherwise(label)
    return (
        df.join(cuts, cond)
        .withColumn(out_col, label)
        .drop(*cut_cols, *bkeys.values())
    )


# ------------------------------------------------------------ log-histogram

def log_hist_quantiles(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    probs: list[float] = (0.5, 0.9, 0.99),
    sub: int = 16,
) -> DataFrame:
    """Per-group approximate quantiles from a mergeable LOG-HISTOGRAM —
    the approximate path that, unlike the GK sketch, is fully
    ORACLE-CHECKABLE: binning is pure integer SQL (sub-bins of each
    power of two via length(bin(v))), the cumulative walk is a window
    over <= sub*64 bins per group, and the in-bin interpolation is the
    same IEEE expression on both engines.

    Error: the estimate lands inside the true value's sub-bin —
    relative error <= 1/sub per boundary (6.25% at sub=16). State per
    group is the touched-bin count (<= sub * 64), map-side combinable
    (bin-wise SUM is the merge), so the shuffle is O(bins x partitions)
    per group while exact percentile moves every value. The streaming
    twin (``streaming/quantile_stream.py``) keeps the identical
    histogram per (window, key).

    Quantile definition: nearest-rank target r = max(1, ceil(q*n)),
    linear interpolation within the covering bin at fraction
    (r - cum_before) / bin_count. Values <= 0 bin to -1 and estimate
    as 0. Output: keys..., p50/p90/p99 (group_quantiles naming),
    n_rows; estimates rounded to 6.
    """
    for p in probs:
        if not 0.0 < p <= 1.0:
            raise ValueError(f"probability {p} outside (0, 1]")

    def pname(p: float) -> str:
        v = p * 100
        return f"p{int(v)}" if v.is_integer() else (
            f"p{v:g}".replace(".", "_")
        )

    v = f"CAST({value_col} AS BIGINT)"
    bin_sql = (
        f"CASE WHEN {v} <= 0 THEN -1 ELSE "
        f"(length(bin({v})) - 1) * {sub} + CAST("
        f"(({v} - shiftleft(1L, length(bin({v})) - 1)) * {sub}) div "
        f"shiftleft(1L, length(bin({v})) - 1) AS INT) END"
    )
    # NULL values are ignored outright: a NULL bin would sort FIRST in
    # Spark's ASC window but LAST in DuckDB's, silently skewing the
    # cumulative walk on one engine only
    hist = (
        df.filter(F.col(value_col).isNotNull())
        .select(*keys, F.expr(bin_sql).alias("_bin"))
        .groupBy(*keys, "_bin")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    from pyspark.sql import Window

    wk = Window.partitionBy(*keys).orderBy("_bin")
    cum = hist.select(
        *keys, "_bin", "_cnt",
        F.sum("_cnt").over(wk).alias("_cum"),
        F.sum("_cnt").over(
            Window.partitionBy(*keys)
        ).alias("_n"),
    )
    # bin bounds (doubles; identical expression in the oracle)
    lo = (
        "CASE WHEN _bin < 0 THEN CAST(0.0 AS DOUBLE) ELSE "
        f"pow(CAST(2.0 AS DOUBLE), _bin div {sub}) * "
        f"(CAST(1.0 AS DOUBLE) + CAST(_bin % {sub} AS DOUBLE) / {sub}) "
        "END"
    )
    width = (
        "CASE WHEN _bin < 0 THEN CAST(0.0 AS DOUBLE) ELSE "
        f"pow(CAST(2.0 AS DOUBLE), _bin div {sub}) / {sub} END"
    )
    aggs = []
    for p in probs:
        # CAST AS DOUBLE on BOTH engines: a bare 0.9 parses as DECIMAL
        # (exact 0.9) while the oracle must reproduce the identical
        # IEEE product — ceil(0.9d * 30) is 28 in double (27.000...04)
        # but 27 in decimal, so mixed representations diverge at
        # exact-multiple boundaries
        r = (
            f"greatest(1L, CAST(ceil(CAST({p!r} AS DOUBLE) * _n) "
            f"AS BIGINT))"
        )
        est = (
            f"({lo}) + ({width}) * "
            f"CAST({r} - (_cum - _cnt) AS DOUBLE) / CAST(_cnt AS DOUBLE)"
        )
        covering = f"_cum - _cnt < {r} AND {r} <= _cum"
        aggs.append(
            F.round(
                F.max(F.expr(f"CASE WHEN {covering} THEN {est} END")), 6
            ).alias(pname(p))
        )
    aggs.append(F.max("_n").alias("n_rows"))
    return cum.groupBy(*keys).agg(*aggs)
