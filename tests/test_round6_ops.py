"""Round-6 additions: the training-prep end-to-end chain and its
hand-off contracts (chunk ids -> pack bins -> shard ranks -> span
targets), driven at sf0.01 against the real testdata with
filesystem-level shard asserts."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/documents.parquet"),
    reason="driver testdata not present",
)


def test_training_prep_e2e_shards(spark, tmp_path):
    """chunk -> pack -> write_training_shards at sf0.01: exact shard
    sizes on disk, reproducible global order, bins respect capacity
    slack, and every span target joins back to a packed chunk."""
    from xenoeye_spark.datapipe.layout import write_training_shards
    from xenoeye_spark.datapipe.sampling import mask_spans, pack_sequences
    from xenoeye_spark.datapipe.text import chunk_documents

    CAP, RPS = 256, 1024
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    chunks = chunk_documents(docs, chunk=32, stride=24).select(
        "doc_id", "chunk_id",
        (F.col("doc_id").cast("long") * 4096 + F.col("chunk_id"))
        .alias("cid"),
        "n_tokens", "chunk_text",
    )
    packed = pack_sequences(chunks, capacity=CAP, len_col="n_tokens",
                            id_col="cid")
    n_chunks = packed.count()
    assert n_chunks > 100

    out = str(tmp_path / "shards")
    n_shards = write_training_shards(packed, out, "bin_id", RPS,
                                     id_col="cid")
    assert n_shards == -(-n_chunks // RPS)

    # filesystem level: one partition dir per shard, exact sizes
    dirs = sorted(d for d in os.listdir(out) if d.startswith("_shard="))
    assert len(dirs) == n_shards
    back = spark.read.parquet(out)
    sizes = {r._shard: r.n for r in
             back.groupBy("_shard").agg(F.count(F.lit(1)).alias("n"))
             .collect()}
    for i in range(n_shards - 1):
        assert sizes[i] == RPS, (i, sizes[i])
    assert sizes[n_shards - 1] == n_chunks - (n_shards - 1) * RPS

    # hand-off contract: shard rank == global (bin_id, cid) order
    ranked = back.select(
        "_shard", "bin_id", "cid",
        (F.row_number().over(
            Window.orderBy(F.col("bin_id").asc(), F.col("cid").asc())
        ) - 1).alias("rank"),
    )
    bad = ranked.filter(
        F.col("_shard") != F.floor(F.col("rank") / RPS)
    ).count()
    assert bad == 0

    # bin arithmetic: offsets within capacity; per-bin token sums never
    # exceed capacity + the largest resident chunk (the quantization
    # slack bound)
    assert packed.filter(
        (F.col("bin_offset") < 0) | (F.col("bin_offset") >= CAP)
    ).count() == 0
    over = (
        packed.groupBy("bin_id")
        .agg(F.sum("n_tokens").alias("tot"),
             F.max("n_tokens").alias("mx"))
        .filter(F.col("tot") > CAP + F.col("mx"))
        .count()
    )
    assert over == 0

    # span targets join back onto packed chunks 1:1 on cid
    spans = mask_spans(
        chunks.select("cid", F.col("chunk_text").alias("text")),
        mask_frac=0.15, id_col="cid",
    )
    orphan = spans.join(packed.select("cid"), "cid", "left_anti").count()
    assert orphan == 0
    # and spans stay inside their chunk's token range
    joined = spans.select("cid", "end_pos").join(
        packed.select("cid", F.col("n_tokens").alias("chunk_tokens")),
        "cid",
    )
    assert joined.filter(
        F.col("end_pos") >= F.col("chunk_tokens")
    ).count() == 0


def test_training_prep_rerun_is_deterministic(spark, tmp_path):
    """Two writer runs over the same input produce identical
    (shard, cid) assignments — the rerun-stability contract a resumable
    training loader depends on."""
    from xenoeye_spark.datapipe.layout import write_training_shards
    from xenoeye_spark.datapipe.sampling import pack_sequences
    from xenoeye_spark.datapipe.text import chunk_documents

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .filter(F.col("doc_id") < 300)
    chunks = chunk_documents(docs, chunk=32, stride=24).select(
        (F.col("doc_id").cast("long") * 4096 + F.col("chunk_id"))
        .alias("cid"),
        "n_tokens",
    )
    packed = pack_sequences(chunks, capacity=256, len_col="n_tokens",
                            id_col="cid")
    outs = []
    for rep in range(2):
        out = str(tmp_path / f"rep{rep}")
        write_training_shards(
            packed.repartition(4 + rep), out, "bin_id", 256,
            id_col="cid",
        )
        outs.append({
            (r.cid, r._shard)
            for r in spark.read.parquet(out).select("cid", "_shard")
            .collect()
        })
    assert outs[0] == outs[1]


def test_bpe_pair_counts_twin(spark):
    """Distributed BPE pair counts == a collections.Counter fold over
    the same words; single-char words contribute nothing (the Spark
    sequence(1,0)-descends trap is guarded)."""
    import collections

    from pyspark.sql import Row

    from xenoeye_spark.datapipe.ranking import bpe_pair_counts

    docs = spark.createDataFrame([
        Row(doc_id=0, text="low lower lowest low"),
        Row(doc_id=1, text="a b c low  newer"),   # single-char words
        Row(doc_id=2, text="wider newer newer"),
    ])
    got = {(r.a, r.b): r.pair_count
           for r in bpe_pair_counts(docs, k=1000).collect()}

    twin: collections.Counter = collections.Counter()
    words = ("low lower lowest low a b c low newer "
             "wider newer newer").split()
    for w in words:
        for i in range(len(w) - 1):
            twin[(w[i], w[i + 1])] += 1
    assert got == dict(twin)
    assert ("l", "o") in got and got[("l", "o")] == 5

    # top-k boundary is a total order: k=1 picks the max-count pair
    # with the lexicographically smallest (a, b) tiebreak
    top = bpe_pair_counts(docs, k=1).collect()[0]
    mx = max(twin.values())
    cands = sorted(k for k, v in twin.items() if v == mx)
    assert (top.a, top.b) == cands[0] and top.pair_count == mx
