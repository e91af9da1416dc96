"""Shared helpers for the windowed stateful streaming operators
(kmv_stream / topk_stream / sample_stream) — one definition of the
window-duration parser, of the event-time-timeout arithmetic, and of
the stateless map-side pre-combine, so a fix lands everywhere at once.
"""

from __future__ import annotations

from typing import Callable, Iterator

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
