"""Streaming mavg on ``transformWithStateInPandas`` (Spark 4 stateful API).

Same reference semantics as ``mavg_stream`` (EWMA decay per flow, per-key
limits, NEW/UPDATE/ALMOST_GONE/GONE machine — SURVEY.md §2.9), plus the
two things the older ``applyInPandasWithState`` op cannot express:

- **Timer-driven transitions for silent keys.** The reference's action
  thread ticks ~10Hz and decays each alarmed key's value even when no
  flows arrive, so back-to-normal fires on silence
  (monit-objects-mavg-act.c:391-397, 304-340). Here every alarmed key
  registers a processing-time timer; ``handleExpiredTimer`` applies the
  synthetic decay and walks the state machine without input rows — an
  attack that simply stops now produces GONE on schedule.
- **Native idle-state TTL** (``ttlDurationMs``) replacing the manual
  timeout plumbing for try_reset_db parity (monit-objects-mavg.c:776-885).

Requires the RocksDB state store provider
(``spark.sql.streaming.stateStore.providerClass`` →
``...state.RocksDBStateStoreProvider``); ``mavg_alert_stream_tws`` sets
it on the session if unset. The transformWithState protocol also needs
the ``protobuf`` Python package at runtime (standard on clusters;
``protobuf_compat.ensure_protobuf`` finds a vendored pure-python runtime
where site-packages lacks one, so the tests execute this path). Note the
TWS Arrow exchange strips leading-underscore column names to positional
``_1``/``_2`` — internal columns here use ``xe_``-prefixed names. The
replay core and silent-key transition logic are shared with ``mavg_stream``
(replay_rows / silent_transition), which is fully tested through the
applyInPandasWithState operator; this module only adapts them to the
newer API.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from xenoeye_spark.config.limits import norm_group_key
from xenoeye_spark.streaming.mavg_stream import (
    S_NONE,
    STATE_SCHEMA,
    _first_notnull,
    _pad_state,
    replay_rows,
    resolve_limit,
    silent_transition,
)

_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class MavgProcessor(StatefulProcessor):
    """Per-key EWMA + threshold machine; one instance per partition."""

    def __init__(
        self,
        key_cols: list[str],
        window_sec: int,
        threshold: float,
        back2norm_sec: int = 30,
        thresholds: dict[tuple, float] | None = None,
        under: bool = False,
        idle_ttl_sec: int | None = None,
        timer_sec: int | None = None,
        use_timers: bool = True,
    ):
        self.key_cols = key_cols
        self.window_sec = window_sec
        self.window_ns = int(window_sec * 1e9)
        self.threshold = threshold
        self.back2norm_ns = int(back2norm_sec * 1e9)
        self.thresholds = thresholds or {}
        self.under = under
        self.idle_ttl_sec = idle_ttl_sec
        # silent-key re-check cadence; the reference's act thread ticks
        # ~10Hz, one back2norm period is the useful granularity here
        self.timer_ms = int((timer_sec or max(back2norm_sec, 1)) * 1000)
        # time_mode='none' runs: registerTimer is illegal there, and the
        # act-thread watch is the caller's explicit trade (see
        # mavg_alert_stream_tws time_mode)
        self.use_timers = use_timers

    def init(self, handle: StatefulProcessorHandle) -> None:
        ttl = self.idle_ttl_sec * 1000 if self.idle_ttl_sec else None
        self.state = handle.getValueState("mavg", STATE_SCHEMA, ttlDurationMs=ttl)
        self.handle = handle

    def close(self) -> None:
        pass

    def handleInputRows(
        self, key, rows, timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        got = self.state.get()
        st = _pad_state(tuple(got)) if got is not None else (
            0.0, None, S_NONE, None, None, None,
        )
        dict_limit = self.thresholds.get(
            norm_group_key(tuple(key)), self.threshold
        )

        pdf = pd.concat(list(rows), ignore_index=True)
        pdf = pdf.sort_values("xe_ts_ns", kind="mergesort")
        # same resolution order as the applyInPandasWithState twin
        if "xe_limit" in pdf.columns:
            limit = resolve_limit(
                _first_notnull(pdf["xe_limit"]), st[5], dict_limit
            )
        else:
            limit = dict_limit
        new_st, events = replay_rows(
            st[:5], pdf["xe_ts_ns"].to_numpy(), pdf["xe_val"].to_numpy(),
            tuple(key),
            limit, self.window_sec, self.window_ns, self.back2norm_ns,
            self.under,
        )
        st = (*new_st, float(limit))
        self.state.update(st)
        if st[2] != S_NONE and self.use_timers:
            # watch the key while alarmed: the GONE path must fire even if
            # the key goes silent (act-thread parity)
            self.handle.registerTimer(
                timerValues.getCurrentProcessingTimeInMs() + self.timer_ms
            )
        if events:
            yield pd.DataFrame(
                events,
                columns=[*self.key_cols, "event", "rate", "threshold", "ts_ns"],
            )

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        st = self.state.get()
        if st is None:
            return
        st = _pad_state(tuple(st))
        limit = resolve_limit(None, st[5], self.thresholds.get(
            norm_group_key(tuple(key)), self.threshold
        ))
        now_ns = expiredTimerInfo.getExpiryTimeInMs() * 1_000_000
        new_st, events, watch = silent_transition(
            st[:5], now_ns, tuple(key), limit, self.window_sec,
            self.window_ns, self.back2norm_ns, self.under,
        )
        self.state.update((*new_st, limit))
        if watch and self.use_timers:
            self.handle.registerTimer(
                expiredTimerInfo.getExpiryTimeInMs() + self.timer_ms
            )
        for ev in events:
            yield pd.DataFrame(
                [ev],
                columns=[*self.key_cols, "event", "rate", "threshold", "ts_ns"],
            )


# r8 shipped a second precombine here — MavgPcProcessor consuming a
# fully-JVM windowed aggregate fold (jvm_fold_windows: sort_array(
# collect_list) + a sequential SQL `aggregate` lambda over the affine
# decay monoid) so raw flows never crossed into Python. DELETED r11
# after losing its second measurement: 3-4x slower than per-event rows
# in the r8 availableNow drain (worst case: every raw row persisted
# into RocksDB before any window closed), and still 2.1x slower in the
# steady multi-batch regime built to favor it (10 batches, each
# closing the previous fold window — 67s vs 31s over 20M flows / 5k
# keys on local[32]). The windowed agg's raw-row state persistence
# dominates the Arrow crossing it saves at every shape measured;
# SCALE.md §Round-11 records the protocol, the numbers and the
# decision. The apply-backend python precombine (mavg_stream,
# precombine=True) is the surviving O(keys)-input path.


def mavg_alert_stream_tws(
    flows: DataFrame,
    key_cols: list[str],
    val_col: str,
    window_sec: int,
    threshold: float,
    back2norm_sec: int = 30,
    ts_col: str = "ts",
    thresholds: dict[tuple, float] | None = None,
    under: bool = False,
    idle_ttl_sec: int | None = None,
    timer_sec: int | None = None,
    limits_df: DataFrame | None = None,
    limit_col: str = "limit",
    time_mode: str = "processingTime",
) -> DataFrame:
    """transformWithState twin of ``mavg_alert_stream`` — same output
    schema (keys..., event, rate, threshold, ts_ns) plus timer-driven GONE
    for silent keys and TTL'd idle state. ``limits_df`` is the at-scale
    per-key limit path (map-side join; see mavg_alert_stream).

    This backend is per-event only: its r8 JVM-fold precombine was
    DELETED r11 after losing both measurements (see the module note
    above and SCALE.md §Round-11); the O(keys)-input precombine lives
    on the applyInPandasWithState backend (``mavg_alert_stream``).

    ``time_mode``: 'processingTime' (default) arms the act-thread-parity
    timers for alarmed keys. CAVEAT (measured r8): under
    Trigger.AvailableNow a processingTime-mode query never drains — the
    engine keeps scheduling empty no-data micro-batches (observed 100+
    at ~4s each) whether or not any timer is registered, so bounded
    runs must stop() explicitly after their input batch (the pattern
    tests/test_mavg_tws.py uses) or pass time_mode='none', which trades
    away silent-key GONE (same trade as mavg_alert_stream's
    silent_watch=False)."""
    from xenoeye_spark.protobuf_compat import ensure_protobuf

    # the TWS Python protocol speaks protobuf to the JVM state server
    if not ensure_protobuf():
        raise RuntimeError(
            "transformWithStateInPandas requires the python 'protobuf' "
            "package, which is not installed in this environment (and no "
            "vendored runtime was found). The applyInPandasWithState twin "
            "(streaming.mavg_stream.mavg_alert_stream) implements "
            "identical semantics and runs without it."
        )
    spark = flows.sparkSession
    if "RocksDB" not in (
        spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    ):
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", _ROCKSDB)
    key_struct = [flows.schema[k] for k in key_cols]
    out_schema = T.StructType(
        key_struct
        + [
            T.StructField("event", T.StringType()),
            T.StructField("rate", T.DoubleType()),
            T.StructField("threshold", T.DoubleType()),
            T.StructField("ts_ns", T.LongType()),
        ]
    )
    from xenoeye_spark.streaming.mavg_stream import LIMITS_DICT_MAX

    if thresholds is not None and len(thresholds) > LIMITS_DICT_MAX:
        raise ValueError(
            f"thresholds dict has {len(thresholds)} keys, past the "
            f"{LIMITS_DICT_MAX} closure-shipping bound (SURVEY §7.3); "
            "pass the limits as limits_df for a map-side join"
        )
    prepped = flows.select(
        *key_cols,
        (F.col(ts_col).cast("timestamp").cast("double") * F.lit(1e9))
        .cast("long").alias("xe_ts_ns"),
        F.col(val_col).cast("double").alias("xe_val"),
    )
    if limits_df is not None:
        from xenoeye_spark.streaming.mavg_stream import _validated_limits

        lim = _validated_limits(limits_df, key_cols, limit_col, "xe_limit")
        prepped = prepped.join(lim, key_cols, "left")
    proc = MavgProcessor(
        key_cols, window_sec, threshold, back2norm_sec, thresholds,
        under, idle_ttl_sec, timer_sec,
        use_timers=(time_mode == "processingTime"),
    )
    return prepped.groupBy(*key_cols).transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=out_schema,
        outputMode="append",
        timeMode=time_mode,
    )
