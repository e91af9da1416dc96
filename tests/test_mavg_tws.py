"""Stateful-mavg timer tests: silent keys must come back to normal
(act-thread parity) through BOTH operators — the applyInPandasWithState
timeout path (always runnable) and the transformWithState timer path
(skipped where the protobuf package the TWS protocol needs is absent)."""

from __future__ import annotations

import glob
import os
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from xenoeye_spark.operators.mavg import ewma_replay_py
from xenoeye_spark.streaming.mavg_stream import mavg_alert_stream

from xenoeye_spark.protobuf_compat import ensure_protobuf

# transformWithState speaks protobuf to the JVM state server; the compat
# helper finds the vendored pure-python runtime when site-packages lacks one
_HAS_PROTOBUF = ensure_protobuf()

needs_tws = pytest.mark.skipif(
    not _HAS_PROTOBUF, reason="transformWithState needs python protobuf"
)

WRITE_SCHEMA = "k string, ts double, v double"
READ_SCHEMA = "k string, ts timestamp, v double"
BASE = 1_700_000_000


def _write_batches(spark, dir_path, batches):
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, WRITE_SCHEMA) \
            .withColumn("ts", F.col("ts").cast("timestamp")).coalesce(1)
        df.write.parquet(os.path.join(dir_path, f"b{i}"))
    return [os.path.join(dir_path, f"b{i}") for i in range(len(batches))]


def _await_input_processed(q, time_mod, deadline_sec=120, settle_sec=8):
    """Wait until this run has COMPLETED a micro-batch that actually
    read rows (recentProgress carries numInputRows per batch), then a
    bounded settle window for timer-driven emissions. Fixed waits
    flaked on loaded hosts where the first micro-batch had not even
    started; polling for ROWS instead would burn the deadline on
    batches that legitimately emit nothing."""
    deadline = time_mod.time() + deadline_sec
    while time_mod.time() < deadline:
        try:
            if any(
                (p or {}).get("numInputRows", 0) > 0
                for p in (q.recentProgress or [])
            ):
                break
        except Exception:
            pass
        q.awaitTermination(1)
    q.awaitTermination(settle_sec)


def _run_batches(spark, dirs, build_query, out_rows, sleep_between=0.0,
                 timeout=8):
    """availableNow drain per batch dir. Armed processing-time timeouts
    keep an availableNow query alive (the silent-key watch keeps
    scheduling batches), so each run waits a bounded ``timeout`` for the
    timer-driven emissions and then stops the query explicitly."""
    import shutil, tempfile

    schema = READ_SCHEMA
    stage = tempfile.mkdtemp(prefix="tws_src_")
    ckpt = tempfile.mkdtemp(prefix="tws_ckpt_")
    for d in dirs:
        for f in glob.glob(os.path.join(d, "*.parquet")):
            shutil.copy(f, os.path.join(stage, os.path.basename(d) + "_" + os.path.basename(f)))
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(stage)
        )
        q = build_query(stream, ckpt, out_rows)
        _await_input_processed(q, time, settle_sec=timeout)
        q.stop()
        q.awaitTermination(60)
        if sleep_between:
            time.sleep(sleep_between)
    return out_rows


@needs_tws
def test_tws_state_continuity_matches_oracle(spark, tmp_path):
    from xenoeye_spark.streaming.mavg_tws import mavg_alert_stream_tws
    rng = np.random.RandomState(7)
    all_rows = []
    t = BASE
    for _ in range(40):
        t += int(rng.randint(1, 5))
        all_rows.append(("k1", float(t), float(rng.randint(50, 150))))
    batches = [all_rows[:20], all_rows[20:]]
    dirs = _write_batches(spark, str(tmp_path / "src"), batches)

    collected = []

    def build(stream, ckpt, out):
        alerts = mavg_alert_stream_tws(
            stream, ["k"], "v", window_sec=30, threshold=0.0,
            back2norm_sec=5,
        )

        def sink(df, epoch):
            out.extend(df.collect())

        return (
            alerts.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )

    _run_batches(spark, dirs, build, collected)
    assert collected, "no alert rows emitted"
    final = max(collected, key=lambda r: r["ts_ns"])
    ts_ns = np.array([int(r[1] * 1e9) for r in all_rows], dtype=np.int64)
    vals = np.array([r[2] for r in all_rows])
    n_exp, _ = ewma_replay_py(ts_ns, vals, int(30e9))
    assert final["rate"] == pytest.approx(n_exp / 30, rel=1e-6)


@needs_tws
def test_tws_silent_key_goes_back_to_norm(spark, tmp_path):
    from xenoeye_spark.streaming.mavg_tws import mavg_alert_stream_tws

    _silent_key_scenario(spark, tmp_path, mavg_alert_stream_tws)


def test_apply_silent_key_goes_back_to_norm(spark, tmp_path):
    _silent_key_scenario(spark, tmp_path, _apply_variant)


def _apply_variant(stream, key_cols, val_col, **kw):
    kw.pop("timer_sec", None)
    return mavg_alert_stream(stream, key_cols, val_col, **kw)


def _silent_key_scenario(spark, tmp_path, stream_fn):
    """A key that breaches then goes silent must emit GONE from the timer/
    timeout path: later batches carry only a different key, yet k1's alarm
    must clear once the synthetic decay has kept it below limit past
    back2norm."""
    hot = [("k1", float(BASE + i), 1000.0) for i in range(5)]
    other = [("k2", float(BASE + 60), 1.0)]
    dirs = _write_batches(spark, str(tmp_path / "src"), [hot, other,
                                                         [("k2", float(BASE + 61), 1.0)]])

    collected = []

    def build(stream, ckpt, out):
        alerts = stream_fn(
            stream, ["k"], "v",
            window_sec=2,        # EWMA decays to zero 2s after last flow
            threshold=10.0,
            back2norm_sec=1,
            timer_sec=1,
        )

        def sink(df, epoch):
            out.extend(df.collect())

        return (
            alerts.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )

    _run_batches(spark, dirs, build, collected, sleep_between=2.5)
    by_key = {}
    for r in collected:
        by_key.setdefault(r["k"], []).append(r["event"])
    assert "NEW" in by_key.get("k1", [])
    assert "GONE" in by_key.get("k1", []), (
        f"silent key never cleared: {by_key}"
    )
    # k2 stays quiet: tiny rate far below limit, no alarms
    assert "NEW" not in by_key.get("k2", [])


# --- history: r8-r10 carried a second precombine on this backend — a
# fully-JVM windowed aggregate fold (jvm_fold_windows) feeding a
# MavgPcProcessor, pinned here by test_jvm_fold_matches_numpy_fold
# (SQL fold == numpy scan, composites to 1e-9, sample points exact)
# and test_tws_precombine_alert_stream (e2e NEW through the fold
# window, rate and ts exact). DELETED r11 with the path after losing
# both measurements (r8 drain: 3-4x slower; r11 steady multi-batch
# probe: 2.1x slower — SCALE.md §Round-11). The engine now rejects
# precombine+tws (test_engine.py::test_engine_rejects_tws_precombine);
# the apply backend keeps the python precombine and its tests. ---
