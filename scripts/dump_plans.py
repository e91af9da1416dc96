"""Dump per-query `explain("formatted")` output to plans/<tag>/<q>_<suffix>.txt.

Usage: python scripts/dump_plans.py <tag> <suffix> [query ...]
       (no query args = all queries)

The optimization rounds commit before/after plans for every touched
query so the judge can check plan claims (Exchange counts, join
strategy, PushedFilters, Python boundary nodes) without running Spark.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    only = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from xenoeye_spark.session import get_spark

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")

    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)

    qs = entrymod.queries()
    names = only if only else list(qs)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # plan build failure must be loud
            text = f"PLAN BUILD FAILED: {exc!r}\n"
            print(f"{name}: FAILED {exc!r}", file=sys.stderr)
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(text)
        print(f"{name} -> {name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
