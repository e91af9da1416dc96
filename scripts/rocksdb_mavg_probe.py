#!/usr/bin/env python3
"""r9 measurement: bucketed mavg state under RocksDBStateStoreProvider
with real checkpoint dirs — the store the layout would actually run on
at carrier scale (DEPLOY.md). Answers the one open question from the
r8 design (SCALE.md §Round-8 bucketed state): any ACTIVE key rewrites
its bucket's whole pickled blob, so with all keys hot the state store
writes O(total state) per micro-batch — is that write amplification
tolerable under RocksDB (snapshot and changelog checkpointing), and
what does a restart from the checkpoint cost?

Protocol per configuration (changelog checkpointing off/on):
  b0  first touch      — 500k new keys (state build, all blobs created)
  b1  all-keys-hot     — same 500k keys again (EVERY blob rewritten;
                         the stated worst case)
  b2  restart+1-row    — fresh query from the same checkpoint, one row
                         (state reload + one bucket update: recovery
                         cost proxy)
Each run is an availableNow drain (stop + restart between batches, so
every batch also exercises checkpoint recovery). Alarm continuity is
asserted across b0->b1 (the planted key must fire NEW once, then
UPDATE — never a second NEW).

Prints one JSON line per configuration:
  {"changelog": bool, "keys": N, "buckets": B,
   "first_touch_sec": s, "keys_per_sec": k,
   "hot_rewrite_sec": s, "hot_state_bytes_written": b,
   "hot_sst_bytes": b, "state_rows": n,
   "restart_1row_sec": s}

Usage: python scripts/rocksdb_mavg_probe.py [n_keys] [buckets] [cores]
Defaults 500000 64 4 (local[4] for comparability with the r8 table).
"""
from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_KEYS = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
BUCKETS = int(sys.argv[2]) if len(sys.argv) > 2 else 64
CORES = int(sys.argv[3]) if len(sys.argv) > 3 else 4
BASE = 1_700_000_000
ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from xenoeye_spark.streaming.mavg_stream import mavg_alert_stream

    spark = (
        SparkSession.builder.master(f"local[{CORES}]")
        .appName("rocksdb-mavg-probe")
        .config("spark.sql.shuffle.partitions", str(CORES))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def mkbatch(ts: float, nrows: int):
        return spark.range(nrows).select(
            F.col("id").alias("k"),
            F.lit(ts).cast("timestamp").alias("ts"),
            F.when(F.col("id") == 7, 1000.0).otherwise(1.0).alias("v"),
        )

    for changelog in (False, True):
        spark.conf.set(
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled",
            str(changelog).lower(),
        )
        stage = tempfile.mkdtemp(prefix="rdbp_src_")
        ckpt = tempfile.mkdtemp(prefix="rdbp_ckpt_")

        def stage_batch(df, tag):
            d = tempfile.mkdtemp(prefix=f"rdbp_{tag}_")
            df.write.parquet(d, mode="overwrite")
            for i, f in enumerate(glob.glob(os.path.join(d, "*.parquet"))):
                shutil.copy(f, os.path.join(stage, f"{tag}_{i}.parquet"))
            shutil.rmtree(d)

        def run():
            events: list = []
            stream = (
                spark.readStream.schema("k long, ts timestamp, v double")
                .parquet(stage)
            )
            alerts = mavg_alert_stream(
                stream, ["k"], "v", window_sec=10, threshold=50.0,
                silent_watch=False, buckets=BUCKETS,
            )
            t0 = time.monotonic()
            q = (
                alerts.writeStream
                .foreachBatch(lambda df, e: events.extend(df.collect()))
                .option("checkpointLocation", ckpt).outputMode("append")
                .trigger(availableNow=True).start()
            )
            q.awaitTermination(1800)
            wall = time.monotonic() - t0
            prog = [p for p in (q.recentProgress or []) if p]
            return wall, events, prog

        def state_metrics(prog):
            rows, written, sst = 0, 0, 0
            for p in prog:
                for so in p.get("stateOperators", []):
                    rows = max(rows, so.get("numRowsTotal", 0))
                    cm = so.get("customMetrics") or {}
                    written += cm.get("rocksdbTotalBytesWritten", 0)
                    sst = max(sst, cm.get("rocksdbSstFileSize", 0))
            return rows, written, sst

        stage_batch(mkbatch(float(BASE), N_KEYS), "b0")
        w0, ev0, _ = run()
        assert [(r["k"], r["event"]) for r in ev0] == [(7, "NEW")], ev0

        stage_batch(mkbatch(float(BASE + 1), N_KEYS), "b1")
        w1, ev1, prog1 = run()
        assert [(r["k"], r["event"]) for r in ev1] == [(7, "UPDATE")], ev1
        rows, written, sst = state_metrics(prog1)

        stage_batch(mkbatch(float(BASE + 2), 1), "b2")
        w2, _, _ = run()

        print(json.dumps({
            "changelog": changelog, "keys": N_KEYS, "buckets": BUCKETS,
            "cores": CORES,
            "first_touch_sec": round(w0, 2),
            "keys_per_sec": int(N_KEYS / w0),
            "hot_rewrite_sec": round(w1, 2),
            "hot_state_bytes_written": written,
            "hot_sst_bytes": sst,
            "state_rows": rows,
            "restart_1row_sec": round(w2, 2),
        }), flush=True)
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
