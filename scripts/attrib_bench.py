"""Round-5 attribution run (VERDICT r4 "Next #2"): isolated 5-rep timings
of the embedding-family queries whose r3->r4 min moved 1.8-2.7x, plus
planted-vs-unplanted twins of the two queries whose input grew in r4
(`_with_planted` unions 12 near-dup rows so they return 12 rows instead
of 0). Prints one JSON line per variant; the conclusion goes to SCALE.md.

Usage: python scripts/attrib_bench.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    import __spark_entry__ as em
    from pyspark.sql import functions as F
    from xenoeye_spark.datapipe.similarity import (
        cosine_neardup_lsh,
        cosine_neardup_pairs,
    )
    from xenoeye_spark.session import get_spark

    spark = get_spark("xenoeye-attrib")
    spark.sparkContext.setLogLevel("ERROR")
    # same warm-up as bench.py so rep 1 doesn't pay worker-pool spawn
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.range(0, 64, 1, 32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    emb_raw = em._t(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    variants = {
        "sim_ivf": lambda: em.q_sim_ivf(spark, sf_dir),
        "emb_neardup_planted": lambda: em.q_emb_neardup(spark, sf_dir),
        "emb_neardup_r3shape": lambda: cosine_neardup_pairs(
            emb_raw, threshold=0.8
        ),
        "emb_neardup_lsh_planted": lambda: em.q_emb_neardup_lsh(spark, sf_dir),
        "emb_neardup_lsh_r3shape": lambda: cosine_neardup_lsh(
            emb_raw, dim=64, threshold=0.8
        ),
        "dedup_minhash_lsh": lambda: em.q_dedup_minhash_lsh(spark, sf_dir),
    }

    out = {}
    for name, make in variants.items():
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            make().write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        out[name] = {
            "median": round(statistics.median(runs), 3),
            "min": min(runs),
            "spread": round(max(runs) - min(runs), 3),
            "runs": runs,
        }
        print(json.dumps({name: out[name]}), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
