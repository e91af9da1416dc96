"""Similarity search over embedding columns (array<float>).

- brute_force_topk : exact cosine top-k per query — broadcast the (small)
  query set against the full corpus; per-row cosine via built-in
  higher-order functions (zip_with + aggregate, JVM-side); top-k via
  row_number over (query partition). The corpus scan is embarrassingly
  parallel; the only shuffle is the per-query top-k (k rows per partition
  pre-combined by TakeOrdered semantics).
- lsh_bucket_topk  : random-hyperplane LSH variant — hash vectors into
  sign-pattern buckets, search only matching buckets. The 100-TB path:
  bucket key shuffle replaces the full scan per query.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    na, nb = _norm(a), _norm(b)
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(_dot(a, b) / (na * nb))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    ``queries``: (query_id, vec). Output: query_id, vec_id, cosine — the
    query's own id is excluded. Scores optionally rounded for stable
    cross-engine comparison.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qvec"),
    )
    c = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_cvec")
    )
    joined = c.crossJoin(F.broadcast(q)).filter(F.col(id_col) != F.col("query_id"))
    cos = cosine(F.col("_cvec"), F.col("_qvec"))
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    scored = joined.select(
        F.col("query_id"), F.col(id_col), cos.alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def random_hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).tolist()


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: random-hyperplane sign LSH buckets, exact cosine
    within the query's bucket. Recall < 1 by construction; the scale path
    when a full scan per query is too expensive."""
    planes = random_hyperplanes(dim, n_planes, seed)

    def bucket_expr(vec: Column) -> Column:
        bits = []
        for i, p in enumerate(planes):
            arr = F.array(*[F.lit(float(x)) for x in p])
            bits.append(
                F.when(_dot(vec.cast("array<double>"), arr) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
            )
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out

    c = corpus.select(
        F.col(id_col), F.col(vec_col).alias("_cvec"),
        bucket_expr(F.col(vec_col)).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec"),
        bucket_expr(F.col(vec_col)).alias("bucket"),
    )
    joined = c.join(F.broadcast(q), "bucket").filter(F.col(id_col) != F.col("query_id"))
    scored = joined.select(
        "query_id", id_col,
        F.round(
            cosine(F.col("_cvec").cast("array<double>"), F.col("_qvec").cast("array<double>")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return scored.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k).drop("_rn")


def cosine_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, cosine >= t).

    Broadcast nested-loop all-pairs — the correctness baseline. At corpus
    scale, generate candidates with ``lsh_bucket_topk``'s hyperplane
    buckets (or IVF) first and verify only candidates, exactly like the
    MinHash-LSH path in datapipe.dedup.
    """
    ncpu = corpus.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    a = corpus.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).cast("array<double>").alias("_va"),
    )
    b = corpus.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).cast("array<double>").alias("_vb"),
    )
    pairs = a.repartition(int(ncpu)).join(
        F.broadcast(b), F.col("id_a") < F.col("id_b")
    )
    cos = cosine(F.col("_va"), F.col("_vb"))
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    return (
        pairs.select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= F.lit(threshold))
    )
