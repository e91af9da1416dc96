"""Count-Min sketch: fixed-size frequency estimation over unbounded
token domains.

The reference keeps EXACT per-value frequency tables (``mfreq``,
filter.c:711-751 — a 2^16-slot table per field) and the repo's
``mfreq``/``vocab_topk`` mirror that exactness with a full groupBy.
For unbounded key domains the exact table grows with the domain; the
Count-Min sketch (public; Cormode & Muthukrishnan, J. Algorithms 2005)
keeps a fixed d x w counter matrix and guarantees, for any item t with
true count c(t) over a stream of n total tokens:

    c(t) <= est(t) <= c(t) + e*n/w   with prob >= 1 - (1/2)^d

(est never underestimates — every occurrence of t lands in all d of
its counters; overestimate comes from other items colliding into
them.)

Spark shape (100-TB story): one token explode -> a groupBy over at
most d*w = 2048 (row, bucket) keys. Partial (map-side) aggregation
reduces every input partition to <= d*w rows before the shuffle, so
the shuffle volume is O(d*w * partitions) regardless of corpus size —
and because the sketch is a sum of per-partition sketches, this IS the
mergeable-summaries merge (same property the streaming kmv/MG twins
exploit). Point queries join a tiny probe set against the tiny sketch.

Hashing is the repo's oracle-checkable integer family: the 31-char
polynomial mod P (< 2^30, int64-exact — see ranking.KMV_P) composed
with d pairwise-independent affine maps (a_i*x + b_i) mod P mod w.
a_i < 2^31 keeps every product < 2^61: exact in int64 in both Spark
and DuckDB, so the oracle re-derives every counter bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xenoeye_spark.datapipe.ranking import KMV_M, KMV_P
from xenoeye_spark.datapipe.util import ws_tokens_sql

# d affine maps over the polynomial hash — odd multipliers, fixed
# literals mirrored verbatim by the DuckDB oracle.
CMS_ROWS: list[tuple[int, int]] = [
    (1_103_515_245, 12_345),
    (1_588_635_695, 677_890_123),
    (784_588_716, 330_114_157),
    (2_027_382_041, 905_208_493),
]
CMS_WIDTH = 512

def _poly_sql(col: str) -> str:
    return (
        f"aggregate(transform(split({col}, ''), ch -> ascii(ch)), 0L, "
        f"(acc, x) -> (acc * {KMV_M} + x) % {KMV_P})"
    )


def _bucket_sql(x: str, row: int, width: int) -> str:
    a, b = CMS_ROWS[row]
    return f"(({x} * {a}L + {b}L) % {KMV_P}) % {width}"


def _token_hashes(
    df: DataFrame, text_col: str, width: int
) -> DataFrame:
    """One row per (occurrence, sketch row): (row_id, bucket). The
    polynomial is evaluated once per token occurrence; the d affine
    maps are a narrow posexplode over a 4-element array."""
    toks = df.select(
        F.explode(F.expr(ws_tokens_sql(text_col))).alias("t")
    ).select(F.expr(_poly_sql("t")).alias("_x"))
    buckets = ", ".join(
        _bucket_sql("_x", i, width) for i in range(len(CMS_ROWS))
    )
    return toks.select(
        F.posexplode(F.expr(f"array({buckets})")).alias("row_id", "bucket")
    )


def cms_build(
    docs: DataFrame, text_col: str = "text", width: int = CMS_WIDTH
) -> DataFrame:
    """The sketch as a (row_id, bucket, cnt) table — at most d*w rows.
    Summing two sketches cell-wise merges them (the map-side combine
    already does exactly this per partition)."""
    return _token_hashes(docs, text_col, width).groupBy(
        "row_id", "bucket"
    ).agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    docs: DataFrame,
    text_col: str = "text",
    n_probes: int = 20,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the sketch, then point-query it for the corpus's
    ``n_probes`` most frequent tokens (exact top under the total order
    count desc, token asc) and report estimate vs truth.

    Output: (token, exact_cnt, cms_est, cms_err) ordered by the probe
    total order. ``cms_err = cms_est - exact_cnt`` is always >= 0 (the
    one-sided CM guarantee); the test suite asserts it and the e*n/w
    bound.

    The exact counter here is the *evaluation harness* (the probe set
    must come from somewhere); a production point-query path would
    probe externally-supplied keys against a pre-built sketch, exactly
    the ``cms_build`` output join below.
    """
    toks = docs.select(
        F.explode(F.expr(ws_tokens_sql(text_col))).alias("token")
    )
    exact = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("exact_cnt")
    )
    probes = exact.orderBy(
        F.col("exact_cnt").desc(), F.col("token").asc()
    ).limit(n_probes)

    sketch = cms_build(docs, text_col, width)

    buckets = ", ".join(
        _bucket_sql("_x", i, width) for i in range(len(CMS_ROWS))
    )
    probe_cells = probes.select(
        "token",
        "exact_cnt",
        F.expr(_poly_sql("token")).alias("_x"),
    ).select(
        "token",
        "exact_cnt",
        F.posexplode(F.expr(f"array({buckets})")).alias("row_id", "bucket"),
    )
    # probe side is n_probes*d rows — broadcast it; the sketch side
    # stays the (already tiny, <= d*w) shuffled aggregate
    est = (
        sketch.join(
            F.broadcast(probe_cells), ["row_id", "bucket"], "inner"
        )
        .groupBy("token", "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return est.select(
        "token",
        "exact_cnt",
        "cms_est",
        (F.col("cms_est") - F.col("exact_cnt")).alias("cms_err"),
    ).orderBy(F.col("exact_cnt").desc(), F.col("token").asc())
