"""Shared helpers for the windowed stateful streaming operators
(kmv_stream / topk_stream / sample_stream) — one definition of the
window-duration parser, of the event-time-timeout arithmetic, and of
the stateless map-side pre-combine, so a fix lands everywhere at once.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

_UNIT_SEC = {"second": 1, "minute": 60, "hour": 3600}

# Pre-combine accumulator bound: re-reduce past this many held rows,
# flush a partial past it again. Bounds executor memory at
# O(cap) rows regardless of partition size; partial flushes are safe
# because every consumer of a pre-combined stream re-merges downstream
# (the reduce is mergeable by contract).
PRECOMBINE_CAP = 1 << 16


def precombine_map_in_pandas(
    df: DataFrame,
    schema,
    reduce_fn: Callable[[pd.DataFrame], pd.DataFrame],
    cap: int = PRECOMBINE_CAP,
) -> DataFrame:
    """Stateless per-partition pre-combine for streaming stateful ops —
    the map-side-combine the Misra-Gries/KMV/bottom-k state groups need
    so a window's RAW row volume never funnels through one state task.

    ``reduce_fn`` must be MERGEABLE on its own output:
    ``reduce(concat(reduce(a), reduce(b))) == reduce(concat(a, b))``
    (sum/max/min/k-smallest all qualify), and must return columns in
    ``schema`` order. Per Arrow batch the reduce runs once; reduced
    frames accumulate and re-reduce past ``cap`` rows, flushing a
    partial when a single reduced frame still exceeds it (a genuinely
    high-cardinality partition) — partials re-merge downstream, so
    flush boundaries never change results.

    This runs BEFORE the shuffle feeding the stateful op (plan-asserted
    in test_scale_smoke), i.e. with the full parallelism of the input
    partitions — the reference gets the same effect from per-thread
    tkvdb banks merged at window flush (monit-objects-fwm.c:593-647).
    """
    cols = [f.name for f in schema.fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        frames: list[pd.DataFrame] = []
        nrows = 0
        for pdf in batches:
            if not len(pdf):
                continue
            g = reduce_fn(pdf)
            frames.append(g)
            nrows += len(g)
            if nrows > cap:
                g2 = reduce_fn(pd.concat(frames, ignore_index=True))
                frames, nrows = [g2], len(g2)
                if len(g2) > cap:
                    yield g2[cols]
                    frames, nrows = [], 0
        if frames:
            yield reduce_fn(pd.concat(frames, ignore_index=True))[cols]

    return df.mapInPandas(gen, schema=schema)


def widen_delay(watermark_delay: str, dur_ms: int) -> str:
    """The watermark delay the PRE-COMBINED stream must use so that
    lateness stays window-deterministic.

    The pre-combine merges a partition's rows per (window, key), so a
    per-row ``ts < watermark`` late filter would make results depend on
    which rows happened to share a partition (a late row merged with a
    fresh one survives; alone it is dropped). Instead the partials are
    stamped with the window END as their event time, which makes the
    late filter a pure function of the window: a partial is dropped iff
    ``window_end < watermark`` — exactly the condition under which the
    window's state timeout (registered at ``window_end``) has already
    fired. Invariant: a window absorbs EVERY row that arrives before
    its final is emitted, and drops every row after — Spark's built-in
    windowed-agg drop rule, independent of partitioning.

    Because window_end >= any member row's ts, stamping alone would
    advance the watermark up to one window EARLY (watermark = max event
    time - delay). Widening the user's delay by one window duration
    restores the guarantee that the widened watermark never leads the
    raw-row watermark: max(window_end) - delay - dur <= max(ts) - delay.
    Finals therefore fire at most one window LATER (in event time) than
    the raw-row formulation at the same user delay — the price of
    partition-independent lateness.

    Accepts every delay grammar ``withWatermark`` did before the
    pre-combine existed (compound intervals, milliseconds, days) —
    routing the delay through the stricter window parser would break
    previously-valid callers at stream construction.
    """
    return f"{interval_ms(watermark_delay) + dur_ms} milliseconds"


_INTERVAL_MS = {
    "millisecond": 1, "second": 1000, "minute": 60_000,
    "hour": 3_600_000, "day": 86_400_000, "week": 604_800_000,
}


def interval_ms(interval: str) -> int:
    """Parse a (possibly compound) event-time interval string — the
    grammar ``withWatermark`` accepts for delays, e.g. "1 day",
    "500 milliseconds", "1 minute 30 seconds" — to milliseconds.
    Stricter window arithmetic keeps using ``window_duration_ms``;
    this parser exists so DELAYS keep their full historical grammar."""
    parts = interval.split()
    if not parts or len(parts) % 2:
        raise ValueError(f"unsupported interval: {interval!r}")
    total = 0
    for num, unit in zip(parts[::2], parts[1::2]):
        key = unit.lower().rstrip("s")
        if key not in _INTERVAL_MS or not num.lstrip("-").isdigit():
            raise ValueError(f"unsupported interval: {interval!r}")
        total += int(num) * _INTERVAL_MS[key]
    if total < 0:
        raise ValueError(f"negative interval: {interval!r}")
    return total


def bottomk_reduce(
    gkeys: list[str], ts_col: str, val_cols: list[str], k: int
) -> Callable[[pd.DataFrame], pd.DataFrame]:
    """Shared pre-combine reduce for the bottom-k-sketch streams
    (kmv_stream: val_cols=["_h"]; sample_stream: val_cols=["_h","_id"]).
    Keeps the k lexicographically-smallest DISTINCT value tuples per
    group (mergeable: the global bottom-k of distinct is a subset of
    the union of per-partition bottom-ks), sums the ``_cnt`` delivery
    partials onto the group's FIRST kept row (0 on the rest — sums are
    flush-invariant), and carries the max event time (constant per
    group post window-end stamping). One definition so a stamp/merge
    fix lands in both streams at once."""
    def reduce_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        tot = (
            pdf.groupby(gkeys, sort=False, dropna=False)
            .agg(**{"_cnt": ("_cnt", "sum"), ts_col: (ts_col, "max")})
            .reset_index()
        )
        kept = (
            pdf[gkeys + val_cols].drop_duplicates()
            .sort_values(gkeys + val_cols, kind="mergesort")
            .groupby(gkeys, sort=False, dropna=False).head(k)
        )
        out = kept.merge(tot, on=gkeys, how="left", sort=False)
        first = ~out.duplicated(subset=gkeys)
        out["_cnt"] = np.where(first, out["_cnt"], 0)
        out["_cnt"] = out["_cnt"].astype(np.int64)
        return out

    return reduce_fn


def window_duration_ms(window: str) -> int:
    """Parse "N seconds|minutes|hours" to milliseconds; raises on
    anything else (keep the supported set in lockstep with what the
    batch-equivalence tests exercise)."""
    parts = window.split()
    if len(parts) != 2 or parts[1] not in (
        "second", "seconds", "minute", "minutes", "hour", "hours"
    ):
        raise ValueError(f"unsupported window duration: {window!r}")
    return int(parts[0]) * _UNIT_SEC[parts[1].rstrip("s")] * 1000


def session_timezone(stream: DataFrame) -> str:
    """The session timezone the state-UDF's naive timestamps are
    rendered in (applyInPandasWithState delivers event-time keys as
    NAIVE local-session datetimes)."""
    return stream.sparkSession.conf.get("spark.sql.session.timeZone")


def window_end_epoch_ms(wstart, dur_ms: int, tz: str) -> int:
    """Epoch-UTC milliseconds of the window end for a NAIVE
    session-local window-start key. Treating the naive value as UTC
    (pd.Timestamp(x).value) is wrong in any non-UTC session: the
    timeout would be offset by the zone, firing finals hours early or
    late relative to the watermark.

    DST edges: a window start falling in a fall-back hour is ambiguous
    (two epochs map to it) and one in a spring-forward gap nonexistent;
    a bare tz_localize raises inside the state UDF and kills the
    streaming query. Resolve both deterministically — take the DST
    (earlier) reading of an ambiguous time and shift a nonexistent one
    forward to the gap's end; either side only moves the timeout by the
    DST offset, and set_window_timeout's watermark clamp keeps it
    legal."""
    return int(
        pd.Timestamp(wstart)
        .tz_localize(tz, ambiguous=True, nonexistent="shift_forward")
        .value // 1_000_000
    ) + dur_ms


def set_window_timeout(state, wstart, dur_ms: int, tz: str) -> None:
    """Register the group's event-time timeout at the window end —
    clamped one past the current watermark, because a group fed by an
    in-watermark straggler AFTER the watermark crossed its end must
    still set a FUTURE timestamp (at/behind the watermark is an engine
    error)."""
    state.setTimeoutTimestamp(
        max(window_end_epoch_ms(wstart, dur_ms, tz),
            state.getCurrentWatermarkMs() + 1)
    )
