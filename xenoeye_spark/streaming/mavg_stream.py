"""Streaming mavg — per-key EWMA + threshold alerting with
``applyInPandasWithState``.

Reference semantics reproduced (SURVEY.md §2.9):
- decay update per flow (monit-objects-mavg.c:571-593):
      dt = t - t_prev;  dt >= T -> N = V  else  N = N - (dt/T)*N + V
- overlimit when rate = N/T_sec >= threshold (monit-objects-mavg.c:535-569)
- action state machine NEW -> UPDATE -> ALMOST_GONE -> GONE with
  ``back2norm_time`` grace (monit-objects-mavg-act.c:342-444): the alert
  ends only after the rate has stayed below the limit for the grace period.
- silent keys decay synthetically between batches (act:391-397): the state
  carries (N, t_prev) so the next batch's first event applies the decay.

Event ordering: the recurrence is order-sensitive, so each micro-batch
group is sorted by timestamp before replay. State is per key-tuple —
Spark shuffles each micro-batch by key, giving the same per-key ordering
guarantees the reference gets from per-thread tries + merge, without the
cross-thread race (SURVEY.md §7 risk register).

Scale: state per key is O(1); Spark's state store partitions by key hash
across executors — the direct analogue of the reference's 256MB/mavg cap,
but horizontally scalable. Use state TTL (`GroupStateTimeout`) to drop
idle keys like try_reset_db (monit-objects-mavg.c:776-885).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# alert states (monit-objects.h:196-202)
S_NONE, S_NEW, S_UPDATE, S_ALMOST_GONE, S_GONE = (
    "NONE", "NEW", "UPDATE", "ALMOST_GONE", "GONE",
)

STATE_SCHEMA = T.StructType([
    T.StructField("n", T.DoubleType()),          # EWMA accumulator
    T.StructField("t_prev", T.LongType()),       # last update, unix ns
    T.StructField("alarm", T.StringType()),      # NONE/NEW/UPDATE/ALMOST_GONE
    T.StructField("below_since", T.LongType()),  # ns when rate first normal
    T.StructField("first_seen", T.LongType()),   # ns of the key's first flow
])


def ewma_step(n: float, t_prev: int | None, t: int, v: float, window_ns: int):
    """One mavg_recalc step (monit-objects-mavg.c:571-593)."""
    if t_prev is None:
        return float(v)
    dt = t - t_prev
    if dt >= window_ns:
        return float(v)
    return n - (dt / window_ns) * n + float(v)


def make_mavg_state_fn(
    key_cols: list[str],
    window_sec: int,
    threshold: float,
    back2norm_sec: int = 30,
    thresholds: dict[tuple, float] | None = None,
    under: bool = False,
    idle_timeout_sec: int | None = None,
):
    """Build the applyInPandasWithState function for one mavg limit level.
    ``thresholds``: per-key-tuple limits (the limits CSV,
    monit-objects-mavg-limfile.c); fallback to ``threshold``.
    ``under=True`` inverts the comparison for traffic-drop detection
    (monit-objects-mavg-under.c), suppressing alarms during the key's
    first window (grace period, under.c:298-303).

    Emits one row per micro-batch per key whose alarm state changed or is
    active: (keys..., event, rate, threshold, ts_ns).
    """
    window_ns = int(window_sec * 1e9)
    back2norm_ns = int(back2norm_sec * 1e9)

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # idle-key compaction (try_reset_db, monit-objects-mavg.c:776-885):
        # a key with no flows for idle_timeout_sec drops its state — by
        # then the EWMA has decayed to ~0 anyway
        if idle_timeout_sec is not None and state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            n, t_prev, alarm, below_since, first_seen = state.get
        else:
            n, t_prev, alarm, below_since, first_seen = 0.0, None, S_NONE, None, None

        limit = (thresholds or {}).get(key, threshold)
        events: list[tuple] = []

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values("_ts_ns", kind="mergesort")
        for t, v in zip(rows["_ts_ns"].to_numpy(), rows["_val"].to_numpy()):
            t = int(t)
            if first_seen is None:
                first_seen = t
            n = ewma_step(n, t_prev, t, float(v), window_ns)
            t_prev = t
            rate = n / window_sec
            breach = (rate < limit) if under else (rate >= limit)
            if under and t - first_seen < window_ns:
                breach = False  # grace: first window after start
            if breach:
                below_since = None
                if alarm == S_NONE:
                    alarm = S_NEW
                    events.append((*key, S_NEW, rate, limit, t))
                elif alarm == S_ALMOST_GONE:
                    alarm = S_UPDATE        # dipped but came back
            else:
                if alarm in (S_NEW, S_UPDATE):
                    alarm = S_ALMOST_GONE
                    below_since = t
                elif alarm == S_ALMOST_GONE and below_since is not None:
                    if t - below_since >= back2norm_ns:
                        alarm = S_NONE
                        below_since = None
                        events.append((*key, S_GONE, rate, limit, t))
        # steady-state notification refresh (act:427-433): still-active
        # alarms report once per batch
        if alarm in (S_NEW, S_UPDATE) and not events:
            events.append((*key, S_UPDATE, n / window_sec, limit, t_prev))

        state.update((float(n), t_prev, alarm, below_since, first_seen))
        if idle_timeout_sec is not None:
            state.setTimeoutDuration(idle_timeout_sec * 1000)
        if events:
            yield pd.DataFrame(
                events, columns=[*key_cols, "event", "rate", "threshold", "ts_ns"]
            )

    return fn


def mavg_alert_stream(
    flows: DataFrame,
    key_cols: list[str],
    val_col: str,
    window_sec: int,
    threshold: float,
    back2norm_sec: int = 30,
    ts_col: str = "ts",
    thresholds: dict[tuple, float] | None = None,
    under: bool = False,
    idle_timeout_sec: int | None = None,
) -> DataFrame:
    """Wire the stateful fn onto a (streaming or batch-test) DataFrame.

    Output stream: key cols + event (NEW/UPDATE/GONE) + rate + threshold +
    ts_ns. Feed to an alert sink / foreachBatch action runner
    (monit-objects-mavg-act.c).
    """
    key_struct = [flows.schema[k] for k in key_cols]
    out_schema = T.StructType(
        key_struct + [
            T.StructField("event", T.StringType()),
            T.StructField("rate", T.DoubleType()),
            T.StructField("threshold", T.DoubleType()),
            T.StructField("ts_ns", T.LongType()),
        ]
    )
    prepped = flows.select(
        *key_cols,
        (F.col(ts_col).cast("timestamp").cast("double") * F.lit(1e9))
        .cast("long").alias("_ts_ns"),
        F.col(val_col).cast("double").alias("_val"),
    )
    fn = make_mavg_state_fn(
        key_cols, window_sec, threshold, back2norm_sec, thresholds, under,
        idle_timeout_sec,
    )
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_sec is not None
        else GroupStateTimeout.NoTimeout
    )
    return prepped.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf,
    )
