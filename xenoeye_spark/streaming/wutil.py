"""Shared helpers for the windowed stateful streaming operators
(kmv_stream / topk_stream / sample_stream) — one definition of the
window-duration parser and of the event-time-timeout arithmetic, so a
fix lands everywhere at once.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame

_UNIT_SEC = {"second": 1, "minute": 60, "hour": 3600}


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
