"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is executed to completion (count-collapsed via a noop write to
force full materialization of every row, not just the first partition).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    import __spark_entry__ as entrymod
    from xenoeye_spark.session import get_spark

    spark = get_spark("xenoeye-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qmap = entrymod.queries()
    only = os.environ.get("SPARK_GRAFT_QUERIES")
    if only:
        keep = [q.strip() for q in only.split(",") if q.strip()]
        qmap = {k: v for k, v in qmap.items() if k in keep}
    timings: dict[str, float] = {}

    # warm up the JVM + parquet footers + the Python/Arrow worker pool once
    # so per-query timings measure the query, not session bring-up (the
    # first pandas-UDF stage otherwise pays ~10s of worker spawn)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.range(0, 64, 1, 32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    for name, fn in qmap.items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        # force full materialization of every output row JVM-side
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)

    # flows/sec probe against BASELINE.md's ~700K fps/CPU reference
    # number: run the flagship standing-query shape (DSL filter -> windowed
    # groupBy-SUM -> top-N+others) over synthetic in-memory flows so the
    # figure measures the engine, not parquet IO
    from pyspark.sql import functions as F
    from xenoeye_spark.config.mo import MoConfig

    n_flows = int(os.environ.get("SPARK_GRAFT_FPS_ROWS", 10_000_000))
    flows = spark.range(n_flows).select(
        F.timestamp_seconds(F.lit(1_700_000_000) + (F.col("id") % 86400)).alias("ts"),
        (F.lit(167772160) + F.col("id") % 4096).alias("ip4_src_addr"),
        (F.lit(167772160) + F.col("id") % 1024).alias("ip4_dst_addr"),
        (F.col("id") % 1500 + 40).alias("in_bytes"),
        F.when(F.col("id") % 3 == 0, 17).otherwise(6).alias("protocol"),
    )
    mo = MoConfig.from_dict(
        {"filter": "proto 6 and src net 10.0.0.0/22",
         "fwm": [{"name": "bench", "fields": ["octets desc", "src host"],
                  "time": 3600, "limit": 10}]},
        name="fps",
    )
    t0 = time.perf_counter()
    mo.fwm_result(flows, mo.fwm[0]).write.format("noop").mode("overwrite").save()
    fps = round(n_flows / (time.perf_counter() - t0))

    print(json.dumps({
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "flows_per_sec": fps,
        "flows_per_sec_note": "synthetic flows through filter+fwm+topN, "
                              f"n={n_flows}, local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
    }))


if __name__ == "__main__":
    main()
