"""Temporal operators: as-of join and gap-based sessionization.

Spark has no ASOF JOIN; the classic workaround of a range-condition theta
join explodes into a broadcast-nested-loop. ``asof_join`` uses the
union + forward-fill-window formulation instead: tag both sides, union
them, and for every left row take the latest preceding right row via
``last(..., ignorenulls=True)`` over (key, time) — ONE shuffle on the
join key and one in-partition sort, the same cost as any window, no
cartesian anywhere. DuckDB ships a native ASOF JOIN, which makes a
genuinely independent oracle for the driver gate.

``sessionize`` assigns gap-based session ids: a session breaks when the
time since the previous event of the same key exceeds ``gap``. One
window over (key, time): lag -> boolean break -> running sum. The id is
(key, session_seq), deterministic under the (time, tiebreak) ordering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
    tolerance=None,
) -> DataFrame:
    """Backward as-of join: every left row gains the ``value_cols`` of the
    LATEST right row with the same ``by`` key and right.on <= left.on
    (ties at equal time match, like DuckDB/pandas ``asof``).

    ``right`` must be unique per (by, on) — pre-aggregate if not, or the
    fill becomes order-dependent. ``tolerance`` (a Column interval or
    numeric delta in ``on``'s units): matches older than it are nulled.

    Output: all left columns + ``asof_<col>`` for each value col +
    ``asof_on`` (the matched right timestamp, null when no match).
    """
    lcols = left.columns
    if set(value_cols) & set(lcols):
        raise ValueError(
            f"value_cols {sorted(set(value_cols) & set(lcols))} collide "
            "with left columns — alias them on the right side first"
        )
    ltypes = dict(left.dtypes)
    rtypes = dict(right.dtypes)
    l2 = left.select(
        *lcols,
        *[F.lit(None).cast(rtypes[c]).alias(c) for c in value_cols],
        F.lit(1).alias("_side"),
    )
    r2 = right.select(
        *[
            F.col(c) if c in (by, on)
            else F.lit(None).cast(ltypes[c]).alias(c)
            for c in lcols
        ],
        *value_cols,
        F.lit(0).alias("_side"),
    )
    u = l2.unionByName(r2)
    # right rows sort BEFORE left rows at the same timestamp (_side asc),
    # so an equal-time right row is visible to the left row — the
    # backward-inclusive tie rule
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the fill must carry the WHOLE matched right row, not one last()
    # per column: per-column ignorenulls would skip a NULL value in the
    # latest right row and fill an OLDER row's value — inconsistent with
    # asof_on and with pandas/DuckDB ASOF semantics (which return the
    # latest row's NULL as-is)
    matched = F.last(
        F.when(F.col("_side") == 0, F.struct(F.col(on), *value_cols)),
        ignorenulls=True,
    ).over(w)
    filled = u.select(*lcols, "_side", matched.alias("_m"))
    out = filled.filter(F.col("_side") == 1).drop("_side")
    matched_on = F.col(f"_m.{on}")
    in_tol: Column = F.lit(True)
    if tolerance is not None:
        in_tol = (F.col(on) - matched_on) <= tolerance
    keep = F.col("_m").isNotNull() & in_tol
    sel = [F.col(c) for c in lcols]
    sel.append(F.when(keep, matched_on).alias("asof_on"))
    sel.extend(
        F.when(keep, F.col(f"_m.{c}")).alias(f"asof_{c}")
        for c in value_cols
    )
    return out.select(*sel)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    start_col: str,
    end_col: str,
    ts_col: str,
    bucket_width: int,
    by: str | None = None,
) -> DataFrame:
    """Range-containment join: every (left interval [start, end]) row is
    paired with every right row whose ``ts_col`` falls inside it
    (inclusive both ends), optionally also matching a ``by`` equi-key.

    Spark plans the naive ``l.start <= r.ts AND r.ts <= l.end`` theta
    join as a broadcast-nested-loop (O(|L|*|R|) compares, driver-sized
    broadcast). This operator turns it into a HASH join: left intervals
    explode into the ``bucket_width``-sized time buckets they overlap
    (``sequence(floor(start/w), floor(end/w))``), right rows key by their
    single bucket, and the equi-join on (bucket [, by]) prefilters to
    near-misses before the exact range predicate. A right row's ts lies
    in exactly one bucket, so no pair is produced twice — no distinct
    needed. Cost: |L| * (interval/bucket_width + 1) exploded rows, one
    shuffle each side; pick bucket_width ~ the typical interval length.

    Columns from both sides are kept, so apart from ``by`` no column
    name may appear on both sides (checked; rename before joining).
    """
    w = int(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")
    shared = set(left.columns) & set(right.columns) - ({by} if by else set())
    if shared:
        raise ValueError(
            f"columns {sorted(shared)} exist on both sides — rename them "
            "(only the `by` key may be shared)"
        )
    lb = F.explode(
        F.sequence(
            F.floor(F.col(start_col) / w).cast("long"),
            F.floor(F.col(end_col) / w).cast("long"),
        )
    ).alias("_bkt")
    # alias both sides: left and right often share lineage (two filters
    # of one stream), and unqualified refs trip the ambiguous-self-join
    # analyzer check
    l2 = left.select("*", lb).alias("__ivl")
    r2 = right.select(
        "*", F.floor(F.col(ts_col) / w).cast("long").alias("_bkt")
    ).alias("__ivr")
    cond = F.col("__ivl._bkt") == F.col("__ivr._bkt")
    if by is not None:
        cond = cond & (F.col(f"__ivl.{by}") == F.col(f"__ivr.{by}"))
    joined = l2.join(r2, cond, "inner").filter(
        (F.col(f"__ivr.{ts_col}") >= F.col(f"__ivl.{start_col}"))
        & (F.col(f"__ivr.{ts_col}") <= F.col(f"__ivl.{end_col}"))
    )
    keep = [F.col(f"__ivl.{c}") for c in left.columns] + [
        F.col(f"__ivr.{c}") for c in right.columns if by is None or c != by
    ]
    return joined.select(*keep)


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Append ``session_seq`` (1-based per key) and ``session_event_seq``
    (1-based within the session). A new session starts when the time
    since the key's previous event exceeds ``gap`` (a Column interval or
    numeric delta in ``ts_col``'s units). Deterministic when
    (key, ts, tiebreak) is unique."""
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    brk = F.when(
        prev.isNull() | ((F.col(ts_col) - prev) > gap), F.lit(1)
    ).otherwise(F.lit(0))
    with_brk = df.withColumn("_brk", brk)
    w2 = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = with_brk.withColumn(
        "session_seq", F.sum("_brk").over(w2).cast("long")
    ).drop("_brk")
    w3 = Window.partitionBy(key_col, "session_seq").orderBy(*order)
    return out.withColumn(
        "session_event_seq", F.row_number().over(w3).cast("long")
    )
