"""Connected components over near-duplicate pair graphs.

A dedup pipeline that stops at PAIRS is unfinished: to prune a corpus you
need one canonical representative per duplicate CLASS, and near-dup pairs
are not transitive (A~B, B~C with A~C below threshold still belong to one
class for pruning purposes). The standard closure is connected components
over the pair graph.

``connected_components`` implements the alternating large-star /
small-star algorithm (Kiveris et al., "Connected Components in MapReduce
and Beyond", SoCC'14 — public algorithm), the shape that scales: each
round is two shuffles keyed by node id, the edge set only ever shrinks
toward star graphs centered at each component's minimum id, and the
round count is O(log n) — unlike plain min-label propagation, which
needs O(diameter) rounds and stalls on long chains. Every round runs as
DataFrame joins/aggregations (Catalyst plans, AQE-coalesced); the driver
only compares two scalar convergence signatures per round.
"""

from __future__ import annotations



from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Edge-count bound for the single-task union-find fast path in
# connected_components. Near-dup pair graphs are usually a sliver of the
# corpus (the expensive part was FINDING the pairs), and below this size
# the O(E α(E)) sequential union-find in one executor task beats the
# O(log n) star rounds' per-round shuffle + driver-convergence latency
# (measured: a 68-edge sf0.1 graph cost ~2.9s in star rounds vs ~0.3s in
# one task). 500k edges ≈ 8 MB of longs — trivially one-task-sized; a
# graph past the bound takes the distributed path unchanged. Tunable per
# deployment (XE_CC_LOCAL_EDGES=0 disables the fast path).
CC_LOCAL_EDGES_DEFAULT = 500_000


def _cc_local_minrep(batches):
    """mapInPandas kernel: union-find with minimum-id representatives
    over ONE partition holding the whole (small) edge set. Emits every
    node exactly once as (node, rep) — identical to the star-rounds
    fixpoint by definition (rep = min node id of the connected
    component, minima map to themselves)."""
    import pandas as pd

    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for b in batches:
        for u, v in zip(b["u"].to_numpy(), b["v"].to_numpy()):
            u = int(u)
            v = int(v)
            if u not in parent:
                parent[u] = u
            if v not in parent:
                parent[v] = v
            ru, rv = find(u), find(v)
            if ru != rv:
                # union by min: the smaller id becomes the root, so the
                # final find() of any member IS the component minimum
                if ru < rv:
                    parent[rv] = ru
                else:
                    parent[ru] = rv
    if parent:
        nodes = list(parent)
        yield pd.DataFrame(
            {
                "node": pd.Series(nodes, dtype="int64"),
                "rep": pd.Series([find(x) for x in nodes], dtype="int64"),
            }
        )


def _canon_edges(pairs: DataFrame, src: str, dst: str) -> DataFrame:
    """(u, v) with u = max, v = min, self-loops dropped, distinct."""
    types = dict(pairs.dtypes)
    ok = ("bigint", "int", "smallint", "tinyint", "long")
    bad = [c for c in (src, dst) if types.get(c) not in ok]
    if bad:
        # string ids would cast to NULL (dropping EVERY edge — dedup
        # silently becomes a no-op) and greatest('9','10') compares
        # lexicographically; fail loudly instead
        raise ValueError(
            f"node id columns must be integral; {bad} are "
            f"{[types.get(c) for c in bad]} — map ids to longs first"
        )
    u = F.col(src).cast("long")
    v = F.col(dst).cast("long")
    return (
        pairs.select(
            F.greatest(u, v).alias("u"), F.least(u, v).alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) + {u})."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("_mn"))
    m = F.least(F.col("_mn"), F.col("u"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), m.alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Within each node's smaller-or-equal neighborhood, re-point every
    member (and the node itself) at the minimum."""
    d = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).distinct()
    mins = d.groupBy("u").agg(F.min("v").alias("_mn"))  # _mn < u by construction
    out = (
        d.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("_mn").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .union(mins.select(F.col("u"), F.col("_mn").alias("v")))
        .distinct()
    )
    return out


def _signature(edges: DataFrame) -> tuple[int, int]:
    """Order-insensitive convergence signature: (count, XOR of 64-bit
    edge hashes — bit_xor never overflows, unlike a sum under ANSI mode).
    A signature collision between two DIFFERENT consecutive edge sets
    would terminate one round early — probability ~2^-64 per round, and
    the star rounds are monotone toward the fixpoint, so even then the
    result is a valid partial star assignment of the same components."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, rep) for every node appearing in ``pairs``; rep = the
    minimum node id of its connected component (including itself —
    component minima map to themselves).

    Iterates large-star/small-star until the edge set is stable (the
    proven fixpoint: all edges form stars centered at component minima).
    ``max_iter`` bounds the driver loop; 2^25 nodes of pathological chain
    would converge far sooner (rounds are O(log n)).
    """
    # localCheckpoint (eager), not persist: an iterative plan that embeds
    # the previous round's plan grows EXPONENTIALLY in Catalyst — by round
    # ~6 analysis alone OOMs the driver. Checkpointing truncates lineage
    # to the materialized blocks each round. localCheckpoint keeps blocks
    # on executors (re-run the job on executor loss); set a checkpoint
    # dir and swap in .checkpoint() where fault-tolerance across a long
    # CC run matters.
    edges = _canon_edges(pairs, src, dst).localCheckpoint(eager=True)
    # size-adaptive round parallelism: near-dup pair graphs are usually
    # tiny relative to the corpus (the expensive part was finding the
    # pairs), and a 32-way shuffle per star round is pure scheduling
    # overhead for a few thousand edges. One count on the checkpointed
    # set picks ~50k edges/partition, capped at the session default —
    # the AQE-style decision made once, driver-side.
    n_edges = edges.count()
    # single-task fast path (see CC_LOCAL_EDGES_DEFAULT): the whole edge
    # set in one union-find task — no star rounds, no per-round driver
    # convergence jobs. Same output contract, including the "every node
    # appears, minima map to themselves" rule; equivalence is pinned by
    # tests against the star path on the same graphs.
    from xenoeye_spark.datapipe.util import env_int

    local_cut = env_int("XE_CC_LOCAL_EDGES", CC_LOCAL_EDGES_DEFAULT)
    if n_edges <= local_cut:
        # coalesce, not repartition: the checkpointed blocks merge into
        # one task with no shuffle write/read at all
        out = edges.coalesce(1).mapInPandas(
            _cc_local_minrep, "node long, rep long"
        )
        out._xe_cached = None
        return out
    sc = edges.sparkSession.sparkContext
    parts = max(1, min(sc.defaultParallelism, n_edges // 50_000 + 1))
    if parts < sc.defaultParallelism:
        edges = edges.repartition(parts).localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("u").alias("node"))
        .union(edges.select(F.col("v").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nodes.count()  # materialize before the edge set starts mutating

    sig = _signature(edges)
    for _ in range(max_iter):
        # LAZY checkpoint: the signature aggregation right below is the
        # round's materializing job, and the checkpoint rides along with
        # it — eager=True would run a separate job per round first
        # (measured ~2x the driver round-trips on small pair graphs,
        # where job latency dominates the actual star transforms)
        nxt = _small_star(_large_star(edges)).localCheckpoint(eager=False)
        nxt_sig = _signature(nxt)
        edges = nxt
        if nxt_sig == sig:
            break
        sig = nxt_sig

    # at the fixpoint every edge is (member, component_min); component
    # minima themselves appear only on the v side
    labels = edges.select(F.col("u").alias("node"), F.col("v").alias("rep"))
    out = (
        nodes.join(labels, "node", "left")
        .select(
            F.col("node"),
            F.coalesce(F.col("rep"), F.col("node")).alias("rep"),
        )
    )
    # the nodes persist is load-bearing (materialized before the edge
    # set mutates) but the CALLER releases it in long-lived sessions:
    # result._xe_cached.unpersist() after materializing.
    out._xe_cached = nodes
    return out


def dedup_groups(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Duplicate classes from a near-dup pair list: one row per member
    node — (doc_id, keep_id, group_size). ``keep_id`` is the component's
    minimum doc id (the canonical survivor); pruning = drop every row
    where doc_id != keep_id."""
    cc = connected_components(pairs, src, dst)
    sizes = cc.groupBy("rep").agg(F.count(F.lit(1)).alias("group_size"))
    out = (
        cc.join(sizes, "rep")
        .select(
            F.col("node").alias("doc_id"),
            F.col("rep").alias("keep_id"),
            F.col("group_size"),
        )
    )
    out._xe_cached = getattr(cc, "_xe_cached", None)
    return out


def best_of_class(
    members: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    class_col: str = "keep_id",
    score_col: str = "quality_score",
) -> DataFrame:
    """Representative selection per duplicate class: instead of
    lowest-id-wins (``dedup_groups``'s keep_id), keep the member with
    the BEST ``score_col`` (ties -> lowest id, so selection stays
    deterministic). This is what a curation pipeline actually ships:
    the class survivor should be the best-quality copy, not the one
    with the smallest ingest id.

    ``members``: (id_col, class_col) — e.g. ``dedup_groups`` output.
    ``scores``: (id_col, score_col) — e.g. ``text_stats``.

    Plan: one equi-join on id, then ONE max_by-struct aggregation per
    class — map-side combinable, no window, so a mega-class collapses
    per task instead of sorting on a single reducer (the same no-window
    shape as segment_dedup's first-occurrence resolution).

    Output: (class_col, rep_id, rep_score, n_members).
    """
    joined = members.join(
        scores.select(F.col(id_col), F.col(score_col)), id_col
    )
    # max on (score, -id): best score wins, ties -> smaller id
    pick = F.max(
        F.struct(
            F.col(score_col).alias("_s"),
            (-F.col(id_col)).alias("_negid"),
        )
    )
    return (
        joined.groupBy(class_col)
        .agg(
            pick.alias("_w"),
            F.count(F.lit(1)).cast("long").alias("n_members"),
        )
        .select(
            F.col(class_col),
            (-F.col("_w._negid")).alias("rep_id"),
            F.col("_w._s").alias("rep_score"),
            "n_members",
        )
    )
