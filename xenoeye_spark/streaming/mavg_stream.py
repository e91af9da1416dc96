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
    T.StructField("limit", T.DoubleType()),      # resolved per-key limit
])

# Per-key limits as a closure dict ride the pickled task binary — fine
# to ~1e6 keys (SURVEY §7.3), pathological past it (the dict is
# re-shipped per task, not once per executor). Beyond the bound the
# limits must arrive as a DataFrame joined map-side into the flow rows
# (``limits_df``), which scales like any equi-join.
LIMITS_DICT_MAX = 1_000_000


def ewma_step(n: float, t_prev: int | None, t: int, v: float, window_ns: int):
    """One mavg_recalc step (monit-objects-mavg.c:571-593)."""
    if t_prev is None:
        return float(v)
    dt = t - t_prev
    if dt >= window_ns:
        return float(v)
    return n - (dt / window_ns) * n + float(v)


def replay_rows(
    st: tuple,
    ts_arr,
    val_arr,
    key: tuple,
    limit: float,
    window_sec: int,
    window_ns: int,
    back2norm_ns: int,
    under: bool,
) -> tuple[tuple, list[tuple]]:
    """Shared per-key replay: EWMA decay + alarm state machine over rows
    already sorted by time. ``st`` = (n, t_prev, alarm, below_since,
    first_seen); returns (new_st, events). Used by both the
    applyInPandasWithState and transformWithState operators so the
    order-sensitive core has exactly one implementation."""
    n, t_prev, alarm, below_since, first_seen = st
    events: list[tuple] = []
    for t, v in zip(ts_arr, val_arr):
        t = int(t)
        if first_seen is None:
            first_seen = t
        n = ewma_step(n, t_prev, t, float(v), window_ns)
        t_prev = t
        rate = n / window_sec
        breach = (rate < limit) if under else (rate >= limit)
        if under and t - first_seen < window_ns:
            breach = False  # grace: first window after start (under.c:298-303)
        if breach:
            below_since = None
            if alarm == S_NONE:
                alarm = S_NEW
                events.append((*key, S_NEW, rate, limit, t))
            elif alarm == S_ALMOST_GONE:
                alarm = S_UPDATE  # dipped but came back
        else:
            if alarm in (S_NEW, S_UPDATE):
                alarm = S_ALMOST_GONE
                below_since = t
            elif alarm == S_ALMOST_GONE and below_since is not None:
                if t - below_since >= back2norm_ns:
                    alarm = S_NONE
                    below_since = None
                    events.append((*key, S_GONE, rate, limit, t))
    # steady-state notification refresh (act:427-433)
    if alarm in (S_NEW, S_UPDATE) and not events:
        events.append((*key, S_UPDATE, n / window_sec, limit, t_prev))
    return (float(n), t_prev, alarm, below_since, first_seen), events


def silent_transition(
    st: tuple,
    now_ns: int,
    key: tuple,
    limit: float,
    window_sec: int,
    window_ns: int,
    back2norm_ns: int,
    under: bool,
) -> tuple[tuple, list[tuple], bool]:
    """Alarm bookkeeping for a key with NO rows since ``st``: apply the
    synthetic decay (value keeps decaying while silent, act:391-397) and
    walk the state machine at ``now_ns``. Returns (new_st, events,
    keep_watching). The reference's act thread does this at ~10Hz for
    every alarmed key (monit-objects-mavg-act.c:342-444)."""
    n, t_prev, alarm, below_since, first_seen = st
    if alarm == S_NONE or t_prev is None:
        return st, [], False
    dt = now_ns - t_prev
    n_dec = 0.0 if dt >= window_ns else n - (dt / window_ns) * n
    rate = n_dec / window_sec
    breach = (rate < limit) if under else (rate >= limit)
    if breach:
        return st, [], True
    if below_since is None:
        return (n, t_prev, S_ALMOST_GONE, now_ns, first_seen), [], True
    if now_ns - below_since >= back2norm_ns:
        return (
            (n, t_prev, S_NONE, None, first_seen),
            [(*key, S_GONE, rate, limit, now_ns)],
            False,
        )
    return (n, t_prev, S_ALMOST_GONE, below_since, first_seen), [], True


def make_mavg_state_fn(
    key_cols: list[str],
    window_sec: int,
    threshold: float,
    back2norm_sec: int = 30,
    thresholds: dict[tuple, float] | None = None,
    under: bool = False,
    idle_timeout_sec: int | None = None,
    silent_watch: bool = True,
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

    # silent-key poll period: the reference's act thread ticks at 10 Hz
    # (monit-objects.c act loop), so its back2norm grace clock starts at
    # the actual crossing. Polling only every back2norm_sec made GONE
    # fire up to ~2x late (below_since starts at the first poll AFTER
    # the crossing). A quarter-period poll capped at 5s bounds the extra
    # latency at ~25% while timer fires stay = active alarms (small).
    watch_ms = int(max(min(back2norm_sec / 4, 5), 1) * 1000)

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        from xenoeye_spark.config.limits import norm_group_key

        dict_limit = (thresholds or {}).get(norm_group_key(key), threshold)
        cols = [*key_cols, "event", "rate", "threshold", "ts_ns"]

        if state.hasTimedOut:
            # two timeout roles:
            # 1. alarmed key gone silent -> synthetic decay + state machine
            #    (the act thread's job, monit-objects-mavg-act.c:391-397)
            # 2. idle-key compaction (try_reset_db, mavg.c:776-885)
            st = state.get if state.exists else None
            if silent_watch and st is not None and st[2] != S_NONE:
                # the resolved limit was persisted at replay time, so a
                # map-side-joined limit survives the key going silent
                limit = st[5] if st[5] is not None else dict_limit
                now_ns = int(_time_now_ns())
                new_st, events, watch = silent_transition(
                    st[:5], now_ns, key, limit, window_sec, window_ns,
                    back2norm_ns, under,
                )
                state.update((*new_st, limit))
                if watch:
                    state.setTimeoutDuration(watch_ms)
                elif idle_timeout_sec is not None:
                    state.setTimeoutDuration(idle_timeout_sec * 1000)
                if events:
                    yield pd.DataFrame(events, columns=cols)
            else:
                state.remove()
            return

        if state.exists:
            st = state.get
        else:
            st = (0.0, None, S_NONE, None, None, None)

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values("_ts_ns", kind="mergesort")
        # limit resolution: map-side-joined _limit column (the at-scale
        # path) > previously stored > closure dict > default
        if "_limit" in rows.columns:
            joined = rows["_limit"].dropna()
            if len(joined):
                limit = float(joined.iloc[0])
            elif st[5] is not None:
                limit = st[5]
            else:
                limit = dict_limit
        else:
            limit = dict_limit
        new_st, events = replay_rows(
            st[:5], rows["_ts_ns"].to_numpy(), rows["_val"].to_numpy(), key,
            limit, window_sec, window_ns, back2norm_ns, under,
        )
        state.update((*new_st, float(limit)))
        if silent_watch and new_st[2] != S_NONE:
            state.setTimeoutDuration(watch_ms)
        elif idle_timeout_sec is not None:
            state.setTimeoutDuration(idle_timeout_sec * 1000)
        if events:
            yield pd.DataFrame(events, columns=cols)

    return fn


def _time_now_ns() -> int:
    import time

    return time.time_ns()


def _validated_limits(
    limits_df: DataFrame, key_cols: list[str], limit_col: str, out_col: str
) -> DataFrame:
    """Project the limits table for the map-side join, refusing
    duplicate keys: a key appearing twice would MULTIPLY its flow rows
    through the left join and double-count every flow in the EWMA —
    silent false alarms, not an error. limits_df is static and
    dimension-sized, so the distinctness check is two tiny driver-side
    jobs at stream-build time."""
    lim = limits_df.select(
        *key_cols, F.col(limit_col).cast("double").alias(out_col)
    )
    n = lim.count()
    nd = lim.select(*key_cols).distinct().count()
    if n != nd:
        raise ValueError(
            f"limits_df has {n - nd} duplicate key row(s) over "
            f"{key_cols}; a duplicated key would multiply its flow "
            "rows through the limit join — deduplicate it first"
        )
    return lim


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
    silent_watch: bool = True,
    limits_df: DataFrame | None = None,
    limit_col: str = "limit",
) -> DataFrame:
    """Wire the stateful fn onto a (streaming or batch-test) DataFrame.

    Output stream: key cols + event (NEW/UPDATE/GONE) + rate + threshold +
    ts_ns. Feed to an alert sink / foreachBatch action runner
    (monit-objects-mavg-act.c).

    Per-key limits, two tiers (SURVEY §7.3):
    - ``thresholds`` dict — rides the pickled closure; refused past
      LIMITS_DICT_MAX (~1e6) keys because the dict re-ships per task.
    - ``limits_df`` (key cols + ``limit_col``) — joined map-side into
      the flow rows before the state shuffle; scales like any equi-join
      (Catalyst broadcasts it while small, shuffles it when not). The
      resolved limit is persisted in state so silent-key timeouts keep
      using it.

    ``silent_watch`` (default on) arms a processing-time timeout for every
    alarmed key so back-to-normal fires even when the key goes silent —
    the reference's act-thread behavior. Note for availableNow test runs:
    armed timeouts keep the query alive, so bounded drains should either
    pass silent_watch=False or stop() after a short awaitTermination.
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
    if thresholds is not None and len(thresholds) > LIMITS_DICT_MAX:
        raise ValueError(
            f"thresholds dict has {len(thresholds)} keys, past the "
            f"{LIMITS_DICT_MAX} closure-shipping bound (SURVEY §7.3); "
            "pass the limits as limits_df for a map-side join"
        )
    prepped = flows.select(
        *key_cols,
        (F.col(ts_col).cast("timestamp").cast("double") * F.lit(1e9))
        .cast("long").alias("_ts_ns"),
        F.col(val_col).cast("double").alias("_val"),
    )
    if limits_df is not None:
        lim = _validated_limits(limits_df, key_cols, limit_col, "_limit")
        prepped = prepped.join(lim, key_cols, "left")
    fn = make_mavg_state_fn(
        key_cols, window_sec, threshold, back2norm_sec, thresholds, under,
        idle_timeout_sec, silent_watch,
    )
    # timeouts serve the alarmed-key watch (silent keys must reach GONE,
    # act-thread parity) and idle-state compaction. Request the timeout
    # conf only when one of them is in play: a ProcessingTimeTimeout conf
    # keeps availableNow/bounded runs scheduling batches even with no
    # armed timers, which would make batch-drain usage hang to its
    # awaitTermination bound.
    use_timeouts = silent_watch or idle_timeout_sec is not None
    return prepped.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if use_timeouts
            else GroupStateTimeout.NoTimeout
        ),
    )
