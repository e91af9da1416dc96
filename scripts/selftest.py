"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at the given SF, compare
row count + column names + order-insensitive values.

Usage: python scripts/selftest.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):          # int(inf) raises OverflowError and
            return "Inf" if v > 0 else "-Inf"  # would abort the gate
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from xenoeye_spark.session import get_spark

    spark = get_spark("selftest", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd name must not let the gate exit green having
        # verified nothing
        print(f"unknown queries: {sorted(unknown)}", file=sys.stderr)
        sys.exit(2)
    failed, passed, weak = [], [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"weak {name}: rows-only ({len(srows)} rows)")
            weak.append(name)
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failed.append(name)
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns {sorted(scols)} != {sorted(ocols)}")
            failed.append(name)
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount {len(srows)} != {len(orows)}")
            failed.append(name)
            continue
        s_set = rowset(scols, srows)
        o_set = rowset(ocols, orows)
        if s_set != o_set:
            diffs = [i for i, (a, b) in enumerate(zip(s_set, o_set)) if a != b]
            print(f"FAIL {name}: values differ ({len(diffs)} of {len(s_set)} rows)")
            for i in diffs[:3]:
                print(f"   spark: {s_set[i]}")
                print(f"  oracle: {o_set[i]}")
            failed.append(name)
            continue
        print(f"PASS {name} ({len(srows)} rows)")
        passed.append(name)

    print(f"\n{len(passed)} passed, {len(weak)} rows-only, {len(failed)} FAILED")
    if failed:
        print("failed:", ", ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
