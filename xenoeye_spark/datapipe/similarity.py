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
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xenoeye_spark.datapipe.util import spread

# Repartition floor for this module's kernels (r5, measured on the r4
# bench): every similarity kernel is a VECTORIZED Arrow-batch matmul, so
# on a sub-8MB corpus the single-core kernel costs less than the
# repartition's own 32-task scheduling overhead (~0.5-1s). Above the
# floor — any real corpus — spread() still rescues an unsplittable scan.
_SPREAD_MIN_BYTES = 8 << 20


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


@F.pandas_udf(T.DoubleType())
def _cos_rows_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Row-wise cosine over Arrow batches (einsum), rounded to 6 digits —
    the vectorized scorer shared by the candidate-verification paths (the
    interpreted higher-order-function form evaluates ~dim lambda calls
    per row). Zero-norm rows score 0.0, matching ``cosine()``."""
    ma = np.array(a.tolist(), dtype=np.float64)
    mb = np.array(b.tolist(), dtype=np.float64)
    dots = np.einsum("ij,ij->i", ma, mb)
    na = np.sqrt(np.einsum("ij,ij->i", ma, ma))
    nb = np.sqrt(np.einsum("ij,ij->i", mb, mb))
    denom = na * nb
    out = np.where(denom == 0.0, 0.0, dots / np.where(denom == 0.0, 1.0, denom))
    return pd.Series(np.round(out, 6))


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
    c = spread(corpus, min_bytes=_SPREAD_MIN_BYTES).select(
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


def _bucket_udf(plane_sets: list):
    """Sign-pattern bucket ids for one or more hyperplane tables as ONE
    Arrow-batched matmul: signs = V @ P.T >= 0, bits packed per table.
    Returns an array<long> of bucket ids (one per table). The
    expression-chain alternative evaluates n_tables*n_planes interpreted
    dot products per row."""
    mats = [np.asarray(p, dtype=np.float64) for p in plane_sets]
    weights = [
        (1 << np.arange(m.shape[0], dtype=np.int64)) for m in mats
    ]

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        m = np.array(vecs.tolist(), dtype=np.float64)
        per_table = [
            ((m @ p.T) >= 0).astype(np.int64) @ w
            for p, w in zip(mats, weights)
        ]
        stacked = np.stack(per_table, axis=1)
        return pd.Series(list(stacked))

    # r13 (guide §4.4): the bucket column feeds equi-joins, whose
    # implied isnotnull(bucket) the optimizer pushes below the
    # projection — duplicating the ArrowEvalPython node so the matmul
    # ran TWICE per side (plan-verified on sim_lsh_topk). The function
    # is pure, but marking it non-deterministic stops the optimizer
    # from re-evaluating it across the filter; callers apply it AFTER
    # their own source filters, so no wanted pushdown is lost.
    return buckets.asNondeterministic()


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
    bucket1 = _bucket_udf([planes])

    c = spread(corpus, min_bytes=_SPREAD_MIN_BYTES).select(
        F.col(id_col), F.col(vec_col).alias("_cvec"),
        bucket1(F.col(vec_col).cast("array<double>"))[0].alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec"),
        bucket1(F.col(vec_col).cast("array<double>"))[0].alias("bucket"),
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
    block_rows: int = 100_000,
    n_rows: int | None = None,
    sim_tile_bytes: int = 64 << 20,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, cosine >= t).

    Exact all-pairs via DISTRIBUTED block-pair matmul: rows hash into B
    blocks (B = ceil(N / block_rows)); each row is replicated into the B
    unordered block-pair groups it belongs to, and each (i, j) group
    computes the (|i| x |j|) similarity matmul in row strips, emitting
    only above-threshold pairs — the FAISS-style brute kernel, O(N^2)
    FLOPs total, sharded as O(N^2/B^2) per task. Nothing touches the
    driver and nothing is broadcast.

    Costs (D = embedding dim, 8-byte doubles):
      - shuffle volume: N*B rows, each carrying the full embedding —
        ~N * B * D * 8 bytes;
      - per-task memory: two blocks of embeddings
        (~2 * block_rows * D * 8 bytes) PLUS one strip of the similarity
        matrix, capped at ``sim_tile_bytes`` — the matmul iterates the
        left block in strips of ~sim_tile_bytes / (|j| * 8) rows, so the
        full block_rows^2 matrix is never materialized.

    ``n_rows``: pass the corpus row count if known to skip the sizing
    ``count()`` (which otherwise re-evaluates the upstream lineage).
    O(N^2) FLOPs still rule at corpus scale — generate candidates with
    ``cosine_neardup_lsh`` there and verify only those.
    """
    id_type = dict(corpus.dtypes).get(id_col, "")
    if id_type not in ("bigint", "int", "smallint", "tinyint", "long"):
        # the block-pair kernel carries ids as int64 ndarrays; a silent
        # cast would null every non-numeric id and crash the executor
        # with an opaque NaN-to-int error — fail at the API instead
        raise ValueError(
            f"{id_col!r} must be an integral column (got {id_type or 'missing'}); "
            "use cosine_neardup_lsh or map ids to longs first"
        )
    # no spread(): the groupBy(_gi, _gj) below ALWAYS shuffles, so the
    # block-pair kernel's parallelism is set by the block count, not the
    # scan partitioning; a pre-shuffle repartition would be a second
    # exchange moving the same bytes for nothing
    base = corpus.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    n = base.count() if n_rows is None else int(n_rows)
    n_blocks = max(1, -(-n // block_rows))

    rep = (
        base.withColumn(
            "_blk", F.pmod(F.xxhash64(F.col("_id")), F.lit(n_blocks))
        )
        .withColumn(
            "_j", F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1)))
        )
        .select(
            F.least("_blk", F.col("_j").cast("long")).alias("_gi"),
            F.greatest("_blk", F.col("_j").cast("long")).alias("_gj"),
            "_blk", "_id", "_v",
        )
    )

    def pair_block(key, pdf):
        gi, gj = key
        ids = pdf["_id"].to_numpy(dtype=np.int64)
        m = np.array(pdf["_v"].tolist(), dtype=np.float64)
        norms = np.sqrt((m * m).sum(axis=1))
        safe = np.where(norms == 0.0, 1.0, norms)
        if gi == gj:
            ia = np.arange(len(ids))
            ib = ia
        else:
            blk = pdf["_blk"].to_numpy(dtype=np.int64)
            ia = np.nonzero(blk == gi)[0]
            ib = np.nonzero(blk == gj)[0]
        empty = pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
            {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
        )
        if not len(ia) or not len(ib):
            return empty
        # strip the left block so the sim matrix never exceeds
        # sim_tile_bytes (the naive |ia| x |ib| float64 matrix would be
        # block_rows^2 * 8 B ~ 80 GB at the default block size)
        step = max(1, sim_tile_bytes // (len(ib) * 8))
        zero_b = norms[ib] == 0.0
        parts = []
        for s in range(0, len(ia), step):
            sl = ia[s:s + step]
            sim = (m[sl] @ m[ib].T) / (safe[sl][:, None] * safe[ib][None, :])
            # zero-norm rows define cosine = 0 (see cosine())
            sim[norms[sl] == 0.0, :] = 0.0
            sim[:, zero_b] = 0.0
            if round_digits is not None:
                sim = np.round(sim, round_digits)
            # id order, not block order, decides (id_a, id_b). Same-block
            # groups scan the full square, so id_a < id_b dedups each
            # pair; cross-block groups see each unordered pair exactly
            # once (blocks are disjoint) — keep all hits, emit (min, max).
            mask = sim >= threshold
            if gi == gj:
                mask &= ids[sl][:, None] < ids[ib][None, :]
            ai, bi = np.nonzero(mask)
            if len(ai):
                id_l, id_r = ids[sl][ai], ids[ib][bi]
                parts.append(pd.DataFrame(
                    {
                        "id_a": np.minimum(id_l, id_r),
                        "id_b": np.maximum(id_l, id_r),
                        "cosine": sim[ai, bi],
                    }
                ))
        if not parts:
            return empty
        return pd.concat(parts, ignore_index=True)

    return rep.groupBy("_gi", "_gj").applyInPandas(
        pair_block, schema="id_a long, id_b long, cosine double"
    )


def kmeans_lite(
    vecs: np.ndarray, k: int, iters: int = 8, seed: int = 42
) -> np.ndarray:
    """Tiny Lloyd's k-means for IVF coarse quantization — runs driver-side
    on a sample (centroid count is small; the heavy assignment step is
    distributed). Deterministic via fixed seed."""
    rng = np.random.RandomState(seed)
    centroids = vecs[rng.choice(len(vecs), size=min(k, len(vecs)), replace=False)]
    for _ in range(iters):
        # ||v-c||^2 = ||v||^2 - 2 v.c + ||c||^2; the ||v||^2 term is
        # constant per row so argmin needs only the matmul form — O(n*k*d)
        # flops without materializing the (n, k, d) broadcast tensor
        d = -2.0 * (vecs @ centroids.T) + (centroids**2).sum(axis=1)[None, :]
        assign = d.argmin(axis=1)
        for c in range(len(centroids)):
            members = vecs[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def _cell_expr(vec: Column, centroids: np.ndarray) -> Column:
    """argmin distance to centroid as a pure expression: each squared
    distance is a zip_with/aggregate fold appearing ONCE in the tree,
    argmin = array_min over (dist, cell) structs (struct ordering is
    lexicographic, so equal distances tie to the LOWER cell — the same
    rule as ivf_topk and the SQL oracles).

    A when-chain argmin would embed each running best twice per step —
    Catalyst does not CSE across when branches, so the tree doubles per
    centroid (measured: ~75s analysis+codegen for 8x64 centroids vs
    <1s for this form)."""
    v = vec.cast("array<double>")
    entries = []
    for i, c in enumerate(centroids):
        arr = F.array(*[F.lit(float(x)) for x in c])
        diff = F.zip_with(v, arr, lambda a, b: (a - b) * (a - b))
        d = F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x)
        # (dist, cell) as a 2-element DOUBLE array, not a struct: array
        # ordering is lexicographic just like struct ordering, but the
        # min element is then addressed by POSITION — struct field
        # names are context-dependent (generator extraction in a
        # caller's select rewrites them to col1/col2, a plain
        # projection keeps the aliases), so a getField() works in one
        # caller and analysis-fails in another
        entries.append(F.array(d, F.lit(float(i))))
    return F.array_min(F.array(*entries)).getItem(1).cast("int")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_fraction: float = 1.0,
    seed: int = 42,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF ANN: coarse k-means cells; each query searches only its
    ``n_probe`` nearest cells. The 100-TB shape: corpus partitioned by
    cell id (shuffle once, reused across queries), queries broadcast;
    recall tunable via n_probe.

    Centroids are trained on a driver-side sample (``sample_fraction``),
    like any IVF index build — or supplied via ``centroids`` (e.g. fixed
    seeded vantage points, which makes the whole index + search pipeline
    re-derivable by a SQL oracle; recall is lower than trained cells)."""
    if centroids is None:
        sample = corpus.select(
            F.col(vec_col).cast("array<double>").alias("_v")
        )
        if sample_fraction < 1.0:
            sample = sample.sample(fraction=sample_fraction, seed=seed)
        # Arrow transfer (toPandas) — a py4j row collect of N array rows
        # is ~100x slower than one Arrow batch
        vecs = np.array(sample.toPandas()["_v"].tolist(), dtype=float)
        centroids = kmeans_lite(vecs, n_cells, seed=seed)
    else:
        centroids = np.asarray(centroids, dtype=float)

    # vectorized cell assignment: one (batch x cells) distance matmul per
    # Arrow batch — beats the expression-chain form by >10x at 64 dims
    cent = centroids
    cent_sq = (cent ** 2).sum(axis=1)

    @F.pandas_udf(T.IntegerType())
    def assign_cell(vecs_s: pd.Series) -> pd.Series:
        m = np.array(vecs_s.tolist(), dtype=float)
        # ||v - c||^2 = ||v||^2 - 2 v.c + ||c||^2 ; ||v||^2 constant per row
        d = -2.0 * (m @ cent.T) + cent_sq[None, :]
        return pd.Series(d.argmin(axis=1).astype("int32"))

    # r13 (guide §4.4, the _bucket_udf fix): the _cell column feeds an
    # equi-join whose implied isnotnull the optimizer pushed below the
    # projection, duplicating the ArrowEvalPython node — the corpus
    # cell-assignment matmul ran TWICE (plan-verified on sim_ivf /
    # ann_recall / ivfpq_topk). Pure function; the marking only stops
    # the optimizer's re-evaluation.
    assign_cell = assign_cell.asNondeterministic()

    c = spread(corpus, min_bytes=_SPREAD_MIN_BYTES).select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_cvec")
    ).withColumn("_cell", assign_cell(F.col("_cvec")))

    # query -> its n_probe nearest cells (computed driver-side: queries are
    # the broadcast-small side by construction)
    q_rows = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qvec"),
    ).collect()
    probe_rows = []
    for r in q_rows:
        qv = np.array(r["_qvec"], dtype=float)
        d = ((centroids - qv[None, :]) ** 2).sum(axis=1)
        for cell in np.argsort(d, kind="stable")[:n_probe]:
            probe_rows.append((r["query_id"], list(r["_qvec"]), int(cell)))
    spark = corpus.sparkSession
    q = spark.createDataFrame(
        probe_rows, "query_id long, _qvec array<double>, _cell int"
    )

    joined = c.join(F.broadcast(q), "_cell").filter(
        F.col(id_col) != F.col("query_id")
    )
    scored = joined.select(
        "query_id", id_col,
        _cos_rows_udf(F.col("_cvec"), F.col("_qvec")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def cosine_neardup_lsh(
    corpus: DataFrame,
    dim: int,
    threshold: float = 0.8,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Scale path for cosine near-dup pairs: ``n_tables`` independent
    hyperplane-LSH bucketings generate candidates (same bucket in ANY
    table), exact cosine verifies. Union of tables raises recall; the
    shuffle key is (table, bucket) instead of an all-pairs product."""
    from pyspark import StorageLevel

    plane_sets = [
        random_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)
    ]
    bucket_all = _bucket_udf(plane_sets)

    v = spread(corpus, min_bytes=_SPREAD_MIN_BYTES).select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # ids only through banding + pair dedup: the candidate self-join and
    # its dropDuplicates then shuffle 3 longs per row instead of dragging
    # two D-double vectors through every exchange; vectors re-attach once,
    # after dedup, from the persisted (id, vec) table. The banded table is
    # persisted because both join sides consume it (the bucket matmul UDF
    # would otherwise run twice over the corpus).
    banded = v.select(
        id_col,
        F.posexplode(bucket_all(F.col("_v"))).alias("tbl", "bucket"),
    ).persist(StorageLevel.MEMORY_AND_DISK)

    a = banded.alias("a")
    b = banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    pairs = (
        cands
        .join(v.select(F.col(id_col).alias("id_a"), F.col("_v").alias("_va")), "id_a")
        .join(v.select(F.col(id_col).alias("id_b"), F.col("_v").alias("_vb")), "id_b")
    )
    # vectorized verification (einsum over Arrow batches) — the
    # higher-order-function cosine walks ~dim interpreted lambda calls
    # per pair and was this operator's scoring bottleneck
    out = (
        pairs.select(
            "id_a", "id_b", _cos_rows_udf(F.col("_va"), F.col("_vb")).alias("cosine")
        )
        .filter(F.col("cosine") >= F.lit(threshold))
    )
    # both persists are load-bearing (the banded table feeds both join
    # sides; v re-attaches vectors post-dedup) but they are the CALLER's
    # to release in long-lived sessions: after materializing, unpersist
    # each frame in result._xe_cached.
    out._xe_cached = [v, banded]
    return out


def semantic_dedup(
    corpus: DataFrame,
    centroids: np.ndarray,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tile_rows: int = 2048,
    max_cell_rows: int = 50_000,
    split_oversized: bool = False,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public
    method): cluster embeddings by nearest ``centroids`` row, then inside
    each cluster mark a row a semantic duplicate when any LOWER-id row of
    the same cluster has cosine >= ``threshold``. Lowest id per duplicate
    set survives — deterministic, order-free.

    Plan shape: one vectorized cell-assign projection (the ivf_topk
    kernel), then ONE shuffle on the cell key into a per-cell
    ``applyInPandas`` kernel that normalizes the cell's matrix once and
    counts lower-id witnesses with tiled BLAS matmuls (``tile_rows``
    caps the sim-strip memory at tile_rows x |cell| doubles). Never
    all-pairs across cells: candidate volume is sum over cells of
    |cell|^2 — the SemDeDup bound; the centroid count controls the
    quadratic term, and a mega-cell is the skew signal to raise it.
    (An earlier self-join + row-wise cosine UDF formulation shuffled
    two full vectors per candidate pair and ran ~8x slower at sf0.1 —
    the matmul kernel moves the same FLOPs into BLAS.)

    Mega-cell guard (r6): the kernel materializes |cell| x dim doubles
    for its base matrix, so a degenerate centroid set (one centroid
    swallowing the corpus) would OOM an executor silently. Cells past
    ``max_cell_rows`` (default 50k rows ~= 300 MB at 768 dims) instead
    raise a diagnostic naming the cell, its row count, and the fix —
    raise the centroid count, or pass ``split_oversized=True`` to
    re-cluster oversized cells BEFORE the group shuffle: a driver loop
    (cheap (cell,_sub) count agg per round) picks deterministic
    sub-centroids (evenly-spaced rows of the id-sorted group — no RNG)
    via a vector-free rank pass, re-assigns only the oversized groups'
    rows with a broadcast mapInPandas matmul, and repeats until every
    group fits. No task ever materializes more than ``max_cell_rows``
    rows — the split itself cannot OOM, unlike an in-kernel split that
    would receive the whole mega-cell as one pandas group first.
    Splitting is the SAME approximation as running SemDeDup with more
    centroids: witnesses across sub-cells are missed, so split mode
    keeps a SUPERSET of exact per-cell mode's keeps (never drops a row
    exact mode kept).

    Cosine is rounded to 6 digits before the threshold compare
    (matching ``_cos_rows_udf`` and the SQL oracle); zero-norm vectors
    score 0.0 against everything, like ``cosine()``.

    Output: (id_col, cell, keep, n_dups) — ``n_dups`` = how many
    lower-id in-cluster near-duplicates witnessed the drop (0 for kept
    rows).
    """
    cent = np.asarray(centroids, dtype=float)
    cent_sq = (cent ** 2).sum(axis=1)

    @F.pandas_udf(T.IntegerType())
    def assign_cell(vecs_s: pd.Series) -> pd.Series:
        m = np.array(vecs_s.tolist(), dtype=np.float64)
        d = -2.0 * (m @ cent.T) + cent_sq[None, :]
        return pd.Series(d.argmin(axis=1).astype("int32"))

    id_type = corpus.schema[id_col].dataType
    out_schema = T.StructType([
        T.StructField(id_col, id_type),
        T.StructField("cell", T.IntegerType()),
        T.StructField("keep", T.BooleanType()),
        T.StructField("n_dups", T.LongType()),
    ])

    def _score_cell(m: np.ndarray) -> np.ndarray:
        """n_dups per row of an id-SORTED cell matrix (the exact
        tiled-BLAS kernel) — row order IS the witness order."""
        n = len(m)
        # dot / (|a||b|), NOT normalize-then-dot: the same float shape
        # as _cos_rows_udf and the oracle's cosine, so a value near a
        # 6-digit rounding boundary evaluates the same way everywhere
        # (a zero-norm row's dots are all 0.0, so 0/1 scores 0.0)
        norms = np.sqrt(np.einsum("ij,ij->i", m, m))
        denom = np.where(norms == 0.0, 1.0, norms)
        n_dups = np.zeros(n, dtype=np.int64)
        for j0 in range(0, n, tile_rows):
            j1 = min(j0 + tile_rows, n)
            sims = np.round(
                (m[j0:j1] @ m.T) / np.outer(denom[j0:j1], denom), 6
            )
            # lower-id witnesses only: mask i >= j
            for dj in range(j1 - j0):
                row = sims[dj, : j0 + dj]
                n_dups[j0 + dj] = int((row >= threshold).sum())
        return n_dups

    def per_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort")
        n = len(pdf)
        if n > max_cell_rows:
            raise ValueError(
                f"semantic_dedup: cell {int(pdf['cell'].iloc[0])} holds "
                f"{n} rows > max_cell_rows={max_cell_rows} — the kernel "
                "would materialize its full matrix on one executor. "
                "Raise the centroid count (the SemDeDup skew knob), or "
                "pass split_oversized=True to re-cluster oversized "
                "cells before the group shuffle, or raise "
                "max_cell_rows if the executors have the memory."
            )
        m = np.array(pdf["_v"].tolist(), dtype=np.float64)
        n_dups = _score_cell(m)
        return pd.DataFrame({
            id_col: pdf[id_col].to_numpy(),
            "cell": pdf["cell"].to_numpy(),
            "keep": n_dups == 0,
            "n_dups": n_dups,
        })

    assigned = (
        spread(corpus, min_bytes=_SPREAD_MIN_BYTES)
        .select(
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
        .withColumn("cell", assign_cell(F.col("_v")))
    )
    group_keys = ["cell"]
    if split_oversized:
        assigned = _split_oversized_cells(
            assigned, id_col, max_cell_rows
        )
        group_keys = ["cell", "_sub"]
    return assigned.groupBy(*group_keys).applyInPandas(
        per_cell, out_schema
    )


def _split_oversized_cells(
    assigned: DataFrame,
    id_col: str,
    max_cell_rows: int,
    max_rounds: int = 16,
) -> DataFrame:
    """Refine semantic_dedup's cell assignment until no (cell, _sub)
    group exceeds ``max_cell_rows`` — entirely BEFORE the per-cell
    group shuffle, so no executor task ever holds an oversized group.

    Each round, driver-side (all driver state is tiny — one row per
    oversized group):
      1. count rows per (cell, _sub); collect the oversized groups
         (bounded by |corpus| / max_cell_rows rows);
      2. rank each oversized group's rows by id WITHOUT vectors (the
         in-partition sort carries ~16 bytes/row), pick the
         evenly-spaced ranks as deterministic sub-centroids, and fetch
         just those vectors (n_sub = ceil(n / max_cell_rows) per
         group) — the same no-RNG rule as picking evenly-spaced rows
         of the id-sorted cell;
      3. re-assign ONLY the oversized groups' rows to their nearest
         sub-centroid with a broadcast mapInPandas matmul (argmin ties
         keep the first pick), relabeling ``_sub`` into a per-cell
         block of fresh labels so rounds never collide.

    A group whose rows all land on one sub-centroid (identical
    vectors) cannot shrink — raise a diagnostic instead of looping;
    likewise after ``max_rounds`` rounds.
    """
    spark = assigned.sparkSession
    assigned = assigned.withColumn("_sub", F.lit(0).cast("long"))
    next_free: dict[int, int] = {}
    # (cell, child-block-range) -> parent size, for the collapse check
    prev_blocks: dict[tuple[int, int], tuple[int, int]] = {}

    for _ in range(max_rounds):
        over = sorted(
            (int(r["cell"]), int(r["_sub"]), int(r["n"]))
            for r in assigned.groupBy("cell", "_sub")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") > max_cell_rows)
            .collect()
        )
        if not over:
            return assigned
        # collapse check: a child group equal in size to its parent
        # means every parent row chose ONE sub-centroid (identical
        # vectors) — it will never shrink, so fail loudly now
        for c, s, n in over:
            parent = prev_blocks.get((c, s))
            if parent is not None and n == parent[1]:
                raise ValueError(
                    f"semantic_dedup: oversized cell of {n} rows "
                    "collapsed onto one sub-centroid — raise "
                    "max_cell_rows or deduplicate exact copies first"
                )
        over_keys = spark.createDataFrame(
            [(c, s) for c, s, _ in over], "cell int, _sub long"
        )
        sub_rows = assigned.join(
            F.broadcast(over_keys), ["cell", "_sub"]
        )
        ranked = sub_rows.select("cell", "_sub", id_col).withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("cell", "_sub").orderBy(id_col)
            ) - 1,
        )
        pos_rows = []
        bases: dict[tuple[int, int], int] = {}
        for c, s, n in over:
            n_sub = max(2, -(-n // max_cell_rows))
            base = next_free.setdefault(c, 1)
            next_free[c] = base + n_sub
            bases[(c, s)] = base
            for j in range(n_sub):
                prev_blocks[(c, base + j)] = (s, n)
            for j, p in enumerate(
                np.linspace(0, n - 1, n_sub).astype(np.int64)
            ):
                pos_rows.append((c, s, int(p), j))
        pos_df = spark.createDataFrame(
            pos_rows, "cell int, _sub long, _rk int, _sidx int"
        )
        # the picked set is tiny (n_sub rows per oversized group) —
        # broadcast it against assigned so fetching the vectors never
        # shuffles the corpus
        small = (
            ranked.join(F.broadcast(pos_df), ["cell", "_sub", "_rk"])
            .select(
                F.col(id_col),
                F.col("cell").alias("_pc"),
                F.col("_sub").alias("_ps"),
                "_sidx",
            )
        )
        picked = (
            assigned.select(id_col, "_v")
            .join(F.broadcast(small), id_col)
            .select("_pc", "_ps", "_sidx", "_v")
            .collect()
        )
        by_group: dict[tuple[int, int], dict[int, list]] = {}
        for r in picked:
            key = (int(r["_pc"]), int(r["_ps"]))
            by_group.setdefault(key, {})[int(r["_sidx"])] = r["_v"]
        bc = spark.sparkContext.broadcast({
            key: (
                np.array(
                    [sub[j] for j in sorted(sub)], dtype=np.float64
                ),
                bases[key],
            )
            for key, sub in by_group.items()
        })

        # bind THIS round's broadcast at def time: the checkpoint is
        # lazy, so the closure may run during the NEXT round's count,
        # after the loop rebinds `bc`
        def reassign(batches, _bc=bc):
            for pdf in batches:
                if not len(pdf):
                    continue
                out = pdf.copy()
                for key, grp in pdf.groupby(["cell", "_sub"], sort=False):
                    sub, base = _bc.value[(int(key[0]), int(key[1]))]
                    m = np.array(grp["_v"].tolist(), dtype=np.float64)
                    d = -2.0 * (m @ sub.T) + (sub ** 2).sum(axis=1)[None, :]
                    out.loc[grp.index, "_sub"] = base + d.argmin(axis=1)
                yield out

        reassigned = sub_rows.mapInPandas(reassign, sub_rows.schema)
        assigned = assigned.join(
            F.broadcast(over_keys), ["cell", "_sub"], "left_anti"
        ).unionByName(reassigned)
        # cut lineage per round: the next count + the final group-by
        # otherwise re-run every prior round's joins
        assigned = assigned.localCheckpoint(eager=False)
    raise ValueError(
        "semantic_dedup: oversized cell failed to shrink under "
        f"{max_rounds} splitting rounds (identical vectors?) — raise "
        "max_cell_rows or deduplicate exact copies first"
    )


def quantize_embeddings(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Per-dimension uniform scalar quantization (the int8 embedding
    compression every large ANN store applies before indexing): corpus
    min/max per dimension -> q_i = floor((v_i-mn_i)/(mx_i-mn_i)*L + .5)
    with L = 2^bits - 1, plus the reconstruction MSE of the dequantized
    vector — the quality gauge for choosing ``bits``.

    Plan shape: one posexplode -> per-dim min/max (dim-count rows, two
    shuffles over a key space of |dims|) -> one-row stats assembled as
    arrays and joined back on a CONSTANT key (broadcast hash join, not a
    nested-loop cross join) -> pure JVM transform/aggregate lambdas per
    row. Everything after the tiny agg is a map: at 100 TB the cost is
    one pass for stats + one pass to quantize.

    floor(x + 0.5) instead of round(): identical half-up behavior in
    Spark and DuckDB, so the oracle is bit-exact. Output: (id_col,
    q_digest = md5 of the comma-joined codes, mse round(6), qmin, qmax).
    """
    levels = (1 << bits) - 1
    v = F.col(vec_col).cast("array<double>")
    dims = emb.select(F.posexplode(v).alias("_d", "_x"))
    mm = (
        dims.groupBy("_d")
        .agg(F.min("_x").alias("_mn"), F.max("_x").alias("_mx"))
        .groupBy()
        .agg(
            F.array_sort(
                F.collect_list(F.struct("_d", "_mn", "_mx"))
            ).alias("_s")
        )
        .select(
            F.lit(1).alias("_k"),
            F.transform("_s", lambda s: s["_mn"]).alias("_mns"),
            F.transform("_s", lambda s: s["_mx"]).alias("_mxs"),
        )
    )
    q = F.transform(
        v,
        lambda x, i: F.when(
            F.element_at("_mxs", i + 1) > F.element_at("_mns", i + 1),
            F.least(
                F.lit(levels),
                F.floor(
                    (x - F.element_at("_mns", i + 1))
                    / (F.element_at("_mxs", i + 1) - F.element_at("_mns", i + 1))
                    * levels
                    + 0.5
                ),
            ),
        ).otherwise(F.lit(0)).cast("int"),
    )
    deq_err = F.aggregate(
        F.zip_with(
            v,
            F.transform(
                F.col("_q"),
                lambda qi, i: F.element_at("_mns", i + 1)
                + qi * (F.element_at("_mxs", i + 1) - F.element_at("_mns", i + 1))
                / levels,
            ),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda acc, e: acc + e,
    )
    return (
        emb.withColumn("_k", F.lit(1))
        .join(F.broadcast(mm), "_k")
        .withColumn("_q", q)
        .select(
            F.col(id_col),
            F.md5(F.array_join(F.col("_q").cast("array<string>"), ","))
            .alias("q_digest"),
            F.round(deq_err / F.size(v), 6).alias("mse"),
            F.array_min("_q").alias("qmin"),
            F.array_max("_q").alias("qmax"),
        )
    )


def random_projection(
    emb: DataFrame,
    planes: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Johnson-Lindenstrauss random projection to ``len(planes)`` output
    dimensions (public JL lemma; the cheap front-end of every
    billion-scale ANN/dedup pipeline). ``planes`` is a fixed (k x d)
    matrix embedded as in-plan literals — no join, no shuffle, a pure
    JVM fold per row; with a seeded matrix the oracle re-derives every
    projection with list_inner_product.

    Output: (id_col, p0..p{k-1}) each round(6).
    """
    p = np.asarray(planes, dtype=float)
    v = F.col(vec_col).cast("array<double>")
    cols = [
        F.round(
            F.aggregate(
                F.zip_with(
                    v,
                    F.array(*[F.lit(float(x)) for x in row]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, e: acc + e,
            ),
            6,
        ).alias(f"p{j}")
        for j, row in enumerate(p)
    ]
    return emb.select(F.col(id_col), *cols)


def kmeans_step(
    emb: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    quant: int = 1_000_000,
) -> DataFrame:
    """One distributed Lloyd k-means iteration, cross-engine exact:
    assign every vector to its nearest centroid (squared-L2 argmin,
    ties to the lower cell — the same rule as ``ivf_topk``), then emit
    each cell's member count and per-dimension mean.

    The building block a 100-TB IVF index build repeats: assignment is
    the same vectorized Arrow-batch matmul as ``ivf_topk`` (one
    (batch x cells) BLAS product per batch; the pure-expression
    ``_cell_expr`` alternative is interpreted per element AND — worse —
    a projection containing a generator re-evaluates it once per
    EXPLODED row, 64x per vector: 9.4s -> sub-second measured at sf0.1).
    The Arrow stage is a pipeline barrier, so the cell is computed once
    per input row before the posexplode. The update is ONE
    map-side-combined groupBy on (cell, dim) after the narrow explode —
    tuples, not matrices, cross the shuffle, and the combine collapses
    them to k*d rows per partition. No driver loop per row, no collect
    of member vectors.

    Means are computed over inputs QUANTIZED to integers —
    floor(v * quant) summed as int64 — so the result is bit-identical
    regardless of partitioning or add order (float sums are not
    associative; int sums are), and a SQL oracle reproduces it exactly.
    The quantization error (< 1/quant per element) is far below k-means'
    own convergence tolerance. int64 bound: |v| * quant * n_rows must
    stay < 2^63 — at quant=1e6 and unit-normalized embeddings that is
    ~9e12 member rows per cell, beyond any real cell.

    Output: cell int, dim int, n_members long, mean double (round 6) —
    exploded rather than array-typed so every engine hashes it the same
    way. Empty cells emit no rows (a fixpoint iteration would keep the
    previous centroid, a policy the caller owns).
    """
    cent = np.asarray(centroids, dtype=float)
    cent_sq = (cent ** 2).sum(axis=1)

    @F.pandas_udf(T.IntegerType())
    def assign_cell(vecs_s: pd.Series) -> pd.Series:
        m = np.array(vecs_s.tolist(), dtype=float)
        # ||v - c||^2 = ||v||^2 - 2 v.c + ||c||^2; ||v||^2 constant per
        # row — the exact float shape the oracle mirrors with
        # -2*list_inner_product + csq (the ivf_topk-proven pairing;
        # argmin is ulp-robust for non-degenerate centroids)
        d = -2.0 * (m @ cent.T) + cent_sq[None, :]
        return pd.Series(d.argmin(axis=1).astype("int32"))

    assigned = (
        emb.select(F.col(vec_col).cast("array<double>").alias("_v"))
        .withColumn("cell", assign_cell(F.col("_v")))
        .select("cell", F.posexplode("_v").alias("dim", "_v"))
    )
    q = F.floor(F.col("_v") * F.lit(float(quant))).cast("long")
    return (
        assigned.groupBy("cell", "dim")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum(q).alias("_qsum"),
        )
        .select(
            F.col("cell").cast("int").alias("cell"),
            F.col("dim").cast("int").alias("dim"),
            F.col("n_members").cast("long").alias("n_members"),
            F.round(
                F.col("_qsum").cast("double")
                / (F.col("n_members") * F.lit(float(quant))),
                6,
            ).alias("mean"),
        )
    )


# ------------------------------------------------------------------- PQ

def pq_codebook(
    m: int = 8,
    ks: int = 16,
    subdim: int = 8,
    seed: int = 778,
    scale: float = 1.0,
) -> np.ndarray:
    """Seeded product-quantization codebook, shape (m, ks, subdim) —
    fixed data like the hyperplane/IVF literals, embedded verbatim in
    the DuckDB oracle. ``scale`` matches the codebook to the data's
    component scale (unit-norm d-dim vectors have component std
    ~1/sqrt(d); an unscaled N(0,1) book quantizes them to garbage).
    A production index trains each subspace's ks centroids with
    k-means (``pq_train_codebook``); the seeded book keeps the whole
    encode+search pipeline SQL-re-derivable."""
    rng = np.random.RandomState(seed)
    return rng.normal(size=(m, ks, subdim)) * scale


def pq_train_codebook(
    emb: DataFrame,
    m: int = 8,
    ks: int = 16,
    vec_col: str = "embedding",
    sample_fraction: float = 1.0,
    seed: int = 778,
    iters: int = 10,
) -> np.ndarray:
    """Train the PQ codebook: independent k-means per subspace over a
    driver-side sample (the standard index build — Jegou 2011 §III).
    Like ``ivf_topk``'s trained path, the sample is one Arrow transfer;
    at 100 TB a codebook trains on a ~1e5-vector sample regardless of
    corpus size (distributed refinement = ``kmeans_step`` per
    subspace if ever needed)."""
    sample = emb.select(F.col(vec_col).cast("array<double>").alias("_v"))
    if sample_fraction < 1.0:
        sample = sample.sample(fraction=sample_fraction, seed=seed)
    vecs = np.array(sample.toPandas()["_v"].tolist(), dtype=float)
    d = vecs.shape[1]
    if d % m:
        # silently truncating the tail dims would train a codebook
        # pq_encode later crashes on (reshape d != m*subdim) — fail at
        # the cause, not the symptom
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    subdim = d // m
    return np.stack([
        kmeans_lite(vecs[:, s * subdim:(s + 1) * subdim], ks,
                    seed=seed + s, iters=iters)
        for s in range(m)
    ])


def pq_encode(
    emb: DataFrame,
    codebook: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization encode (public; Jegou, Douze, Schmid,
    "Product Quantization for Nearest Neighbor Search", TPAMI 2011):
    split each d-dim vector into m contiguous subvectors and store only
    the id of each subvector's nearest codebook centroid — d doubles
    become m small ints (64*8B -> 8B here, a 64x compression).

    Shape at 100 TB: one narrow Arrow-batch projection — per batch, m
    (rows x ks) BLAS products and argmins; no shuffle, no state. The
    squared-L2 argmin uses the kmeans_step-proven float pairing
    (-2 v.c + |c|^2, ties to the lower code via np.argmin-first ==
    the oracle's ORDER BY dist, cell), so the discrete codes are
    cross-engine exact.

    Output: (id_col, codes array<int> length m).
    """
    cb = np.asarray(codebook, dtype=float)
    m, ks, subdim = cb.shape
    cb_sq = (cb ** 2).sum(axis=2)          # (m, ks)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def encode(vecs_s: pd.Series) -> pd.Series:
        v = np.array(vecs_s.tolist(), dtype=float)       # (n, d)
        n = v.shape[0]
        if n == 0:
            return pd.Series([], dtype=object)
        sub = v.reshape(n, m, subdim)
        codes = np.empty((n, m), dtype="int32")
        for s in range(m):
            d = -2.0 * (sub[:, s, :] @ cb[s].T) + cb_sq[s][None, :]
            codes[:, s] = d.argmin(axis=1)
        return pd.Series(list(codes))

    # r13 (guide §4.4, the _bucket_udf fix): downstream null-filters /
    # joins on the codes column otherwise duplicate the eval node —
    # ivfpq_topk's plan showed the corpus encode matmul twice.
    encode = encode.asNondeterministic()

    return emb.select(
        F.col(id_col),
        encode(F.col(vec_col).cast("array<double>")).alias("codes"),
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebook: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: the query stays
    exact, every corpus vector is represented by its codes, and the
    estimated squared L2 is the sum over subspaces of
    ||q_s - C[s, code_s]||^2 — computed via the same
    |q_s|^2 - 2 q_s.c + |c|^2 expansion on both engines.

    Shape at 100 TB: codes (m bytes/vector, not d doubles) are the only
    per-corpus-row data the scoring stage touches — the classic memory
    win that lets a billion-vector index live in RAM. Queries broadcast
    (same <=5-row query-set shape as brute_force_topk); scoring is one
    Arrow-batch numpy gather per batch; per-query top-k is a window
    over query_id partitions.

    Output: (query_id, vec_id, pq_dist, rank), rank 1..k by
    (est dist asc, vec_id asc) — equal codes give bit-equal dists, so
    the tiebreak is engine-independent.
    """
    cb = np.asarray(codebook, dtype=float)

    codes = pq_encode(corpus, codebook, id_col=id_col, vec_col=vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qvec"),
    )
    joined = codes.crossJoin(F.broadcast(q)).filter(
        F.col(id_col) != F.col("query_id")
    )

    # the SAME scoring kernel as ivfpq_topk (one definition — a fix to
    # the float pairing reaches both oracled queries)
    adc = _adc_udf(cb)

    scored = joined.select(
        "query_id",
        F.col(id_col),
        F.round(adc(F.col("_qvec"), F.col("codes")), round_digits)
        .alias("pq_dist"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("pq_dist").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _adc_udf(cb: np.ndarray):
    """The shared ADC scoring kernel: (query-side vector, codes) ->
    estimated squared L2 via the per-subspace |q_s|^2 - 2 q_s.c + |c|^2
    expansion — one numpy gather + three reductions per Arrow batch."""
    m, ks, subdim = cb.shape
    cb_sq = (cb ** 2).sum(axis=2)
    s_idx = np.arange(m)

    @F.pandas_udf(T.DoubleType())
    def adc(qvecs: pd.Series, codes_s: pd.Series) -> pd.Series:
        qm = np.array(qvecs.tolist(), dtype=float)        # (n, d)
        n = qm.shape[0]
        if n == 0:
            return pd.Series([], dtype=float)
        cd = np.array(codes_s.tolist(), dtype=int)        # (n, m)
        qs = qm.reshape(n, m, subdim)                     # (n, m, sd)
        csel = cb[s_idx[None, :], cd]                     # (n, m, sd)
        dots = (qs * csel).sum(axis=2)                    # (n, m)
        qsq = (qs * qs).sum(axis=2)
        csq = cb_sq[s_idx[None, :], cd]
        return pd.Series((qsq - 2.0 * dots + csq).sum(axis=1))

    return adc


def ivfpq_encode(
    corpus: DataFrame,
    centroids: np.ndarray,
    codebook: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVFADC index build (Jegou, Douze, Schmid, TPAMI 2011 §IV): coarse
    cell assignment + PQ codes of the RESIDUAL (v - centroid[cell]) in
    ONE Arrow pass — per batch, one (rows x cells) matmul for the
    assignment, a fancy-index gather for the residual, then the m
    per-subspace argmin matmuls. No shuffle; output is (id, cell,
    codes) — a few bytes per corpus vector.

    Coarse ties go to the lower cell and code ties to the lower code
    (np.argmin-first == the oracle's ORDER BY ... ASC, cell ASC), so
    the discrete index is cross-engine exact."""
    cent = np.asarray(centroids, dtype=float)
    cent_sq = (cent ** 2).sum(axis=1)
    cb = np.asarray(codebook, dtype=float)
    m, ks, subdim = cb.shape
    cb_sq = (cb ** 2).sum(axis=2)

    out_t = T.StructType([
        T.StructField("cell", T.IntegerType()),
        T.StructField("codes", T.ArrayType(T.IntegerType())),
    ])

    @F.pandas_udf(out_t)
    def encode(vecs_s: pd.Series) -> pd.DataFrame:
        v = np.array(vecs_s.tolist(), dtype=float)        # (n, d)
        n = v.shape[0]
        if n == 0:
            return pd.DataFrame({"cell": [], "codes": []})
        dc = -2.0 * (v @ cent.T) + cent_sq[None, :]
        cells = dc.argmin(axis=1)
        res = (v - cent[cells]).reshape(n, m, subdim)
        codes = np.empty((n, m), dtype="int32")
        for s in range(m):
            d = -2.0 * (res[:, s, :] @ cb[s].T) + cb_sq[s][None, :]
            codes[:, s] = d.argmin(axis=1)
        return pd.DataFrame({
            "cell": cells.astype("int32"), "codes": list(codes),
        })

    # r13 (guide §4.4, the _bucket_udf fix): the extracted _cell column
    # feeds ivfpq_topk's equi-join; the pushed isnotnull duplicated the
    # eval node and the whole assign+residual+code matmul ran TWICE
    # over the corpus (plan-verified). Pure function.
    encode = encode.asNondeterministic()

    enc = corpus.select(
        F.col(id_col),
        encode(F.col(vec_col).cast("array<double>")).alias("_e"),
    )
    return enc.select(
        id_col, F.col("_e.cell").alias("_cell"), F.col("_e.codes").alias("codes")
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    codebook: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """IVFADC search — the composition that actually runs billion-scale
    ANN in production systems (public: Jegou 2011; FAISS's IVF,PQ
    index): coarse cells prune the corpus to the query's n_probe
    nearest cells, then asymmetric PQ distance ranks ONLY those
    candidates from their code bytes.

    Shape at 100 TB: the candidate restriction is an EQUI-JOIN on the
    cell id (queries broadcast with one row per probed cell) — not the
    brute-force broadcast BNL — so each query touches n_probe/n_cells
    of the corpus, and what it touches is m code bytes per row, not d
    doubles. The per-query residual (q - centroid[cell]) is computed
    driver-side for the <= n_queries x n_probe probe rows.

    Output: (query_id, vec_id, pq_dist, rank), rank 1..k by
    (est dist asc, vec_id asc) within each query's probed cells.
    """
    cent = np.asarray(centroids, dtype=float)
    cent_sq = (cent ** 2).sum(axis=1)
    cb = np.asarray(codebook, dtype=float)

    enc = ivfpq_encode(corpus, cent, cb, id_col=id_col, vec_col=vec_col)

    q_rows = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qvec"),
    ).collect()
    probe_rows = []
    for r in q_rows:
        qv = np.array(r["_qvec"], dtype=float)
        # the same -2 q.c + |c|^2 expansion as the oracle, so distance
        # TIES rank cells identically (stable argsort == cell-asc ties)
        d = -2.0 * (cent @ qv) + cent_sq
        for cell in np.argsort(d, kind="stable")[:n_probe]:
            probe_rows.append(
                (int(r["query_id"]), int(cell),
                 [float(x) for x in qv - cent[cell]])
            )
    spark = corpus.sparkSession
    probes = spark.createDataFrame(
        probe_rows, "query_id long, _cell int, _qres array<double>"
    )

    joined = enc.join(F.broadcast(probes), "_cell").filter(
        F.col(id_col) != F.col("query_id")
    )
    adc = _adc_udf(cb)
    scored = joined.select(
        "query_id",
        F.col(id_col),
        F.round(adc(F.col("_qres"), F.col("codes")), round_digits)
        .alias("pq_dist"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("pq_dist").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivfpq_train_codebook(
    emb: DataFrame,
    centroids: np.ndarray,
    m: int = 8,
    ks: int = 16,
    vec_col: str = "embedding",
    sample_fraction: float = 1.0,
    seed: int = 779,
    iters: int = 10,
) -> np.ndarray:
    """Train the IVFADC codebook on RESIDUALS (v - centroid[cell]),
    pooled across cells — the standard index build (Jegou 2011 §IV.A).
    The residual projection is one Arrow kernel; training itself is
    per-subspace k-means on a driver-side sample, constant-size work at
    any corpus scale (``kmeans_step`` is the distributed refinement
    path if a sample ever isn't enough)."""
    cent = np.asarray(centroids, dtype=float)
    cent_sq = (cent ** 2).sum(axis=1)

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def residual(vecs_s: pd.Series) -> pd.Series:
        v = np.array(vecs_s.tolist(), dtype=float)
        if v.shape[0] == 0:
            return pd.Series([], dtype=object)
        cells = (-2.0 * (v @ cent.T) + cent_sq[None, :]).argmin(axis=1)
        return pd.Series(list(v - cent[cells]))

    res_df = emb.select(
        residual(F.col(vec_col).cast("array<double>")).alias("_res")
    )
    return pq_train_codebook(
        res_df, m=m, ks=ks, vec_col="_res",
        sample_fraction=sample_fraction, seed=seed, iters=iters,
    )
