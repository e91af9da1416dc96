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


def test_jvm_fold_matches_numpy_fold(spark):
    """r8: the SQL aggregate fold (jvm_fold_windows) and the numpy
    segmented scan (fold_sorted) compute the same composites and
    sample points on the same data — count/time fields exactly,
    floating-point fields to composite-regroup tolerance (the JVM fold
    is sequential, the scan is tree-regrouped)."""
    import numpy as np
    import pandas as pd

    from xenoeye_spark.streaming.mavg_stream import fold_sorted
    from xenoeye_spark.streaming.mavg_tws import jvm_fold_windows

    rng = np.random.RandomState(5)
    base = 1_700_000_000
    rows = []
    for k in ("a", "b"):
        t = float(base)
        for _ in range(60):
            t += rng.uniform(0.1, 12.0)  # crosses dt >= W resets (W=10)
            rows.append((k, t, float(rng.uniform(0, 100))))
    df = spark.createDataFrame(rows, "k string, ts double, v double")
    prepped = df.select(
        "k",
        F.col("ts").cast("timestamp").alias("xe_ts"),
        (F.col("ts").cast("timestamp").cast("double") * F.lit(1e9))
        .cast("long").alias("xe_ts_ns"),
        F.col("v").cast("double").alias("xe_val"),
    )
    W = int(10e9)
    # one giant fold window -> one row per key, comparable to fold_sorted
    jvm = (
        jvm_fold_windows(prepped, ["k"], W, False, "3600 seconds",
                         "0 seconds")
        .toPandas().sort_values("k").reset_index(drop=True)
    )
    pdf = (
        prepped.toPandas()[["k", "xe_ts_ns", "xe_val"]]
        .rename(columns={"xe_ts_ns": "_ts_ns", "xe_val": "_val"})
        .sort_values(["k", "_ts_ns", "_val"], kind="mergesort",
                     ignore_index=True)
    )
    ref = fold_sorted(pdf, ["k"], W).sort_values("k").reset_index(drop=True)
    for col in ("pk", "pt1", "pv1", "ptk", "ptpr", "ptbm"):
        assert (jvm[col] == ref[col]).all(), col
    for col in ("pA", "pB", "pApr", "pBpr", "pAbm", "pBbm"):
        a = jvm[col].to_numpy(float)
        b = ref[col].to_numpy(float)
        assert np.allclose(a, b, rtol=1e-9, atol=1e-12), col


@pytest.mark.skipif(
    not _HAS_PROTOBUF, reason="transformWithState needs python protobuf"
)
def test_tws_precombine_alert_stream(spark, tmp_path):
    """r8: the JVM-fold precombine path end to end — windowed agg ->
    fold -> transformWithStateInPandas — fires NEW for the bursting key
    once the watermark closes its fold window. time_mode='none' so the
    availableNow drain terminates (the processingTime no-data-batch
    storm is documented on mavg_alert_stream_tws)."""
    import glob as g
    import os
    import shutil
    import tempfile

    from xenoeye_spark.streaming.mavg_tws import mavg_alert_stream_tws

    base = 1_700_000_000
    rows = (
        [("kA", float(base + i), 1000.0) for i in range(5)]
        + [("kB", float(base + i), 0.001) for i in range(5)]
        # nudge far ahead so the watermark passes the first fold window
        + [("kC", float(base + 3600), 0.001)]
    )
    src = tempfile.mkdtemp(prefix="twspc_src_")
    df = spark.createDataFrame(rows, "k string, ts double, v double") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    d = tempfile.mkdtemp(prefix="twspc_stage_")
    df.coalesce(1).write.parquet(d, mode="overwrite")
    for f in g.glob(os.path.join(d, "*.parquet")):
        shutil.copy(f, os.path.join(src, os.path.basename(f)))

    events: list = []
    stream = spark.readStream.schema(
        "k string, ts timestamp, v double").parquet(src)
    alerts = mavg_alert_stream_tws(
        stream, ["k"], "v", window_sec=10, threshold=50.0,
        precombine=True, fold_window="60 seconds",
        watermark_delay="1 second", time_mode="none",
    )
    q = (
        alerts.writeStream
        .foreachBatch(lambda bdf, e: events.extend(bdf.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = sorted(set((r["k"], r["event"]) for r in events))
    assert ("kA", "NEW") in got
    assert all(k != "kB" for k, _ in got)
    # NEW resolves at the fold window's first event with rate v1/W
    new_row = [r for r in events if r["k"] == "kA" and r["event"] == "NEW"][0]
    assert new_row["rate"] == pytest.approx(100.0)
    assert new_row["ts_ns"] == int(base * 1e9)
