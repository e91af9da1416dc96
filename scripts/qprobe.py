"""Per-query measurement probe for the optimization rounds.

For each named query (default: all), run bench-methodology reps
(build + noop write) and report wall seconds plus the first rep's
Spark job count — the §1 "where does the time go" numbers the bench
headline can't show.

Usage: python scripts/qprobe.py [-r REPS] [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
Prints one JSON line per query; exits nonzero on query failure.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-r":
        reps = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from xenoeye_spark.session import get_spark

    spark = get_spark("qprobe")
    sc = spark.sparkContext
    spark.sparkContext.setLogLevel("ERROR")

    # same warm-up as bench.py: JVM, parquet footers, Python worker pool
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.range(0, 64, 1, 32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    qs = entrymod.queries()
    names = args if args else list(qs)

    for name in names:
        runs = []
        jobs0 = None
        for rep in range(reps):
            sc.setJobGroup(f"qprobe-{name}", name)
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            if rep == 0:
                jobs0 = len(sc.statusTracker().getJobIdsForGroup(
                    f"qprobe-{name}"))
            sc.setJobGroup("qprobe-idle", "idle")
            spark.catalog.clearCache()
        print(json.dumps({
            "q": name, "runs": runs, "min": min(runs),
            "jobs_rep0": jobs0,
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
