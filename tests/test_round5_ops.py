"""Round-5 operators: pii_scrub, normalize_text, semantic_dedup."""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import Row
from pyspark.sql import functions as F

from xenoeye_spark.datapipe.similarity import semantic_dedup
from xenoeye_spark.datapipe.text import normalize_text, pii_scrub


def test_pii_scrub_types_and_counts(spark):
    docs = spark.createDataFrame([
        Row(doc_id=0, text="mail a.b+c@x-corp.io or root@sub.example.org ok"),
        Row(doc_id=1, text="host 192.168.0.1 bad 999.999.999.999 edge 255.255.255.255"),
        Row(doc_id=2, text="call +1 (555) 010-7788 or +44 20 7946 0958 now"),
        Row(doc_id=3, text="clean text with no pii at all"),
        Row(doc_id=4, text="combo x@y.zw from 10.0.0.7 call +7 911 000 11 22"),
    ])
    got = {r.doc_id: r for r in pii_scrub(docs).collect()}
    assert (got[0].n_email, got[0].n_ipv4, got[0].n_phone) == (2, 0, 0)
    assert got[0].text_scrubbed == "mail <EMAIL> or <EMAIL> ok"
    # invalid octets (>255) must NOT match; valid boundaries must
    assert (got[1].n_ipv4, got[1].n_email) == (2, 0)
    assert "999.999.999.999" in got[1].text_scrubbed
    assert "<IPV4>" in got[1].text_scrubbed
    assert got[2].n_phone == 2
    assert got[2].text_scrubbed == "call <PHONE> or <PHONE> now"
    assert got[3].n_pii == 0 and got[3].text_scrubbed == got[3].text_scrubbed
    assert (got[4].n_email, got[4].n_ipv4, got[4].n_phone) == (1, 1, 1)
    assert got[4].n_pii == 3


def test_normalize_text_matches_python(spark):
    raw = "  \tThE   Quick\x01\x02  BROWN\nfox  "
    docs = spark.createDataFrame([Row(doc_id=0, text=raw)])
    [r] = normalize_text(docs).collect()
    # python twin: ctrl -> space, collapse ws, trim, lower
    import re
    t = re.sub(r"[\x00-\x1F\x7F]", " ", raw)
    t = re.sub(r"\s+", " ", t).strip().lower()
    assert r.norm_text == t == "the quick brown fox"
    assert r.n_chars_norm == len(t)
    assert r.norm_md5 == hashlib.md5(t.encode()).hexdigest()


def test_semantic_dedup_matches_python_twin(spark):
    """Synthetic embeddings around two fixed centroids with planted
    in-cluster near-dups and one cross-cluster near-identical pair (must
    both survive: different cells never compare)."""
    rng = np.random.RandomState(11)
    cents = np.array([[10.0, 0.0, 0.0], [0.0, 10.0, 0.0]])
    rows = []
    vecs = {}

    def add(vid, v):
        vecs[vid] = np.asarray(v, dtype=float)
        rows.append(Row(vec_id=vid, embedding=[float(x) for x in v]))

    for i in range(20):
        base = cents[i % 2] + rng.normal(scale=0.5, size=3)
        add(i, base)
    # in-cluster near-dup pair (cluster 0): 100 ~ 102
    add(100, cents[0] + [0.3, 0.01, 0.0])
    add(102, (vecs[100] * 1.0001))
    # cross-cluster near-identical direction — but assigned to different
    # cells, so never compared
    add(200, [7.0, 7.1, 0.0])
    add(201, [7.1, 7.0, 0.0])

    df = spark.createDataFrame(rows)
    sdf = semantic_dedup(df, cents, threshold=0.99)
    out = {r.vec_id: r for r in sdf.collect()}

    # python twin
    def cell(v):
        d = ((cents - v[None, :]) ** 2).sum(axis=1)
        return int(d.argmin())

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na == 0 or nb == 0:
            return 0.0
        return round(float(a @ b / (na * nb)), 6)

    ids = sorted(vecs)
    for vid in ids:
        witnesses = [
            o for o in ids
            if o < vid and cell(vecs[o]) == cell(vecs[vid])
            and cos(vecs[o], vecs[vid]) >= 0.99
        ]
        assert out[vid].cell == cell(vecs[vid]), vid
        assert out[vid].keep == (not witnesses), vid
        assert out[vid].n_dups == len(witnesses), vid
    # the planted facts actually hold. (Vectors clustered around a far
    # centroid all share its direction, so at t=0.99 most of a cluster
    # witnesses most of it — the twin loop above verified every verdict;
    # these spot-check the planted rows specifically.)
    assert not out[102].keep and out[102].n_dups >= 1
    assert out[0].keep  # the lowest id of its cluster has no witness
    assert out[200].cell != out[201].cell
    assert out[200].keep and out[201].keep


def test_semantic_dedup_mega_cell_guard(spark):
    """r6: a degenerate centroid set (one centroid swallows the corpus)
    must fail LOUDLY with a diagnostic, not OOM an executor; with
    split_oversized=True it completes via deterministic in-kernel
    re-clustering and keeps a SUPERSET of exact mode's keeps."""
    import pytest

    rng = np.random.RandomState(7)
    one_cent = np.array([[0.0, 0.0, 0.0]])
    rows = [
        Row(vec_id=i, embedding=[float(x) for x in rng.normal(size=3)])
        for i in range(300)
    ]
    # a planted near-dup pair so split mode has something to drop
    rows.append(Row(vec_id=1000, embedding=[5.0, 0.0, 0.0]))
    rows.append(Row(vec_id=1001, embedding=[5.0001, 0.0, 0.0]))
    df = spark.createDataFrame(rows)

    with pytest.raises(Exception, match="max_cell_rows"):
        semantic_dedup(df, one_cent, threshold=0.99,
                       max_cell_rows=100).collect()

    exact = {r.vec_id: r.keep
             for r in semantic_dedup(df, one_cent, threshold=0.99)
             .collect()}
    split = {r.vec_id: r.keep
             for r in semantic_dedup(df, one_cent, threshold=0.99,
                                     max_cell_rows=100,
                                     split_oversized=True).collect()}
    assert set(split) == set(exact)
    # split only MISSES witnesses: never drops a row exact mode kept
    for vid, kept in exact.items():
        if kept:
            assert split[vid], vid
    assert exact[1000] and not exact[1001]


def test_semantic_dedup_split_unshrinkable_raises(spark):
    """Identical vectors collapse onto one sub-centroid — the split
    path must refuse (loud diagnostic) instead of recursing forever."""
    import pytest

    rows = [Row(vec_id=i, embedding=[1.0, 2.0, 3.0]) for i in range(50)]
    df = spark.createDataFrame(rows)
    with pytest.raises(Exception,
                       match="sub-centroid|failed to shrink"):
        semantic_dedup(df, np.array([[0.0, 0.0, 0.0]]),
                       threshold=0.99, max_cell_rows=10,
                       split_oversized=True).collect()


def test_chunk_documents_windows(spark):
    from xenoeye_spark.datapipe.text import chunk_documents

    docs = spark.createDataFrame([
        Row(doc_id=0, text="a b c d e f g h i j"),
        Row(doc_id=1, text="x y z"),
        Row(doc_id=2, text="   "),          # empty -> no rows
    ])
    got = {
        (r.doc_id, r.chunk_id): (r.n_tokens, r.chunk_text)
        for r in chunk_documents(docs, chunk=4, stride=2).collect()
    }
    # stride 2, chunk 4 over 10 tokens: starts 0,2,4,6 (6+4 reaches end)
    assert got == {
        (0, 0): (4, "a b c d"), (0, 1): (4, "c d e f"),
        (0, 2): (4, "e f g h"), (0, 3): (4, "g h i j"),
        (1, 0): (3, "x y z"),
    }
    # disjoint default keeps the short tail
    got2 = {
        (r.doc_id, r.chunk_id): r.chunk_text
        for r in chunk_documents(docs, chunk=4).collect()
    }
    assert got2[(0, 2)] == "i j"
    import pytest
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk=4, stride=5)


def test_repetition_stats_twin(spark):
    from xenoeye_spark.datapipe.text import repetition_stats

    docs = spark.createDataFrame([
        Row(doc_id=0, text="one two one two one two tail"),
        Row(doc_id=1, text="all distinct words here"),
        Row(doc_id=2, text="xx yy"),        # shorter than n: zero grams
        Row(doc_id=3, text=" "),            # empty: zero everything
    ])
    got = {r.doc_id: r for r in repetition_stats(docs, n=2).collect()}
    # doc 0: 7 tokens, dups = (3-1)+(3-1)=4 -> 4/7; 6 bigrams:
    # "one two"x3, "two one"x2, "two tail" -> dup=(3-1)+(2-1)=3 -> 0.5
    assert got[0].n_tokens == 7 and got[0].n_grams == 6
    assert got[0].dup_token_frac == round(4 / 7, 6)
    assert got[0].dup_gram_frac == 0.5
    assert got[0].top_gram_frac == 0.5
    assert got[1].dup_token_frac == 0.0 and got[1].dup_gram_frac == 0.0
    assert got[2].n_grams == 1 and got[3].n_grams == 0
    assert got[3].n_tokens == 0 and got[3].top_gram_frac == 0.0


def test_url_domain_filter(spark):
    from xenoeye_spark.datapipe.text import url_domain_filter

    docs = spark.createDataFrame([
        Row(doc_id=0, text="a https://www.Blocked.COM/x b "
                           "http://ok.example.org/y c "
                           "https://sub.deep.blocked.com?q=1"),
        Row(doc_id=1, text="no urls at all"),
        Row(doc_id=2, text="bare single-label http://localhost/z"),
    ])
    bl = spark.createDataFrame([Row(domain="Blocked.com"),
                                Row(domain="other.net")])
    got = {r.doc_id: r for r in url_domain_filter(docs, bl).collect()}
    assert (got[0].n_urls, got[0].n_blocked, got[0].keep) == (3, 2, False)
    assert got[0].blocked_domains == ["blocked.com"]
    assert (got[1].n_urls, got[1].keep, got[1].blocked_domains) == (0, True, [])
    # single-label host: registered domain is the host itself
    assert (got[2].n_urls, got[2].n_blocked) == (1, 0)


def test_url_filter_strips_userinfo_and_port(spark):
    """r6 ADVICE regression: the authority capture includes userinfo
    and port; without stripping, 'blocked.com:8080' / 'u@blocked.com'
    reduced to the wrong registered domain and bypassed the blocklist."""
    from xenoeye_spark.datapipe.text import url_domain_filter

    docs = spark.createDataFrame([
        Row(doc_id=0, text="p https://Blocked.com:8080/x q"),
        Row(doc_id=1, text="p http://user@www.blocked.com/x q"),
        Row(doc_id=2, text="p https://u:pw@sub.Blocked.COM:443/x q"),
        Row(doc_id=3, text="p https://ok.example.org:8080/x q"),
    ])
    bl = spark.createDataFrame([Row(domain="blocked.com")])
    got = {r.doc_id: r for r in url_domain_filter(docs, bl).collect()}
    for i in (0, 1, 2):
        assert not got[i].keep and got[i].blocked_domains == ["blocked.com"]
    assert got[3].keep and got[3].n_urls == 1


def test_quantize_embeddings_roundtrip(spark):
    from xenoeye_spark.datapipe.similarity import quantize_embeddings

    rng = np.random.RandomState(7)
    rows = [Row(vec_id=i, embedding=[float(x) for x in rng.normal(size=5)])
            for i in range(50)]
    df = spark.createDataFrame(rows)
    out = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    assert len(out) == 50
    vecs = np.array([r.embedding for r in rows])
    mn, mx = vecs.min(axis=0), vecs.max(axis=0)
    for i, r in enumerate(rows):
        v = np.array(r.embedding)
        q = np.floor((v - mn) / (mx - mn) * 255 + 0.5)
        deq = mn + q * (mx - mn) / 255
        mse = round(float(((v - deq) ** 2).mean()), 6)
        assert abs(out[i].mse - mse) <= 1e-6, i
        assert 0 <= out[i].qmin <= out[i].qmax <= 255
    # rows achieving the corpus min/max hit the code range ends
    assert min(r.qmin for r in out.values()) == 0
    assert max(r.qmax for r in out.values()) == 255
    # a constant (zero-range) dimension codes to 0, not a div-by-zero
    flat = spark.createDataFrame(
        [Row(vec_id=0, embedding=[1.0, 2.0]), Row(vec_id=1, embedding=[1.0, 3.0])]
    )
    got = {r.vec_id: r for r in quantize_embeddings(flat).collect()}
    assert got[0].qmin == 0  # dim 0 constant -> code 0


def test_random_projection_matches_numpy(spark):
    from xenoeye_spark.datapipe.similarity import random_projection

    rng = np.random.RandomState(9)
    planes = rng.normal(size=(3, 4))
    rows = [Row(vec_id=i, embedding=[float(x) for x in rng.normal(size=4)])
            for i in range(10)]
    df = spark.createDataFrame(rows)
    out = {r.vec_id: r for r in random_projection(df, planes).collect()}
    for i, r in enumerate(rows):
        exp = planes @ np.array(r.embedding)
        got = np.array([out[i].p0, out[i].p1, out[i].p2])
        assert np.allclose(got, np.round(exp, 6), atol=1e-6), i


def test_temperature_resample_quotas(spark):
    import math

    import pytest

    from xenoeye_spark.datapipe.sampling import temperature_resample

    rows = (
        [Row(doc_id=i, domain="big") for i in range(100)]
        + [Row(doc_id=100 + i, domain="small") for i in range(10)]
        + [Row(doc_id=500, domain=None)]
    )
    df = spark.createDataFrame(rows)
    out = temperature_resample(df, "domain", alpha=0.5, target_total=20)
    got = {(r.domain, r.doc_id) for r in out.collect()}
    ws = round(math.sqrt(100) + math.sqrt(10), 6)
    nb = math.floor(20 * math.sqrt(100) / ws)
    ns = math.floor(20 * math.sqrt(10) / ws)
    assert sum(1 for d, _ in got if d == "big") == nb
    assert sum(1 for d, _ in got if d == "small") == ns
    assert not any(d is None for d, _ in got)
    # alpha=1 reduces to proportional; alpha out of range raises
    prop = temperature_resample(df, "domain", alpha=1.0, target_total=22)
    cnt = {r[0]: r[1] for r in
           prop.groupBy("domain").count().collect()}
    assert cnt["big"] == 20 and cnt["small"] == 2
    with pytest.raises(ValueError):
        temperature_resample(df, "domain", alpha=0.0)


def test_char_entropy_matches_python(spark):
    import collections
    import math

    from xenoeye_spark.datapipe.text import char_entropy

    texts = ["aaaa", "abab", "", "the quick brown fox", "a1b2!c3 d4"]
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    got = {r.doc_id: r for r in char_entropy(docs).collect()}
    for i, t in enumerate(texts):
        cnt = collections.Counter(t)
        n = len(t)
        h = -sum(v / n * math.log2(v / n) for v in cnt.values()) if n else 0.0
        assert got[i].n_chars == n
        assert got[i].n_distinct_chars == len(cnt)
        assert abs(got[i].entropy_bits - round(h, 6)) <= 2e-6, i
    # uniform-char doc is exactly zero, not -0.0
    assert got[0].entropy_bits == 0.0 and str(got[0].entropy_bits) == "0.0"


def test_best_of_class_argmax(spark):
    from xenoeye_spark.datapipe.graph import best_of_class

    members = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "doc_id long, keep_id long",
    )
    scores = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (10, 0.5), (11, 0.5)],
        "doc_id long, quality_score double",
    )
    got = {r.keep_id: r for r in best_of_class(members, scores).collect()}
    # class 1: 2 and 3 tie at 0.9 -> lowest id 2 wins
    assert (got[1].rep_id, got[1].rep_score, got[1].n_members) == (2, 0.9, 3)
    # class 10: tie -> 10
    assert (got[10].rep_id, got[10].n_members) == (10, 2)


def test_write_training_shards(spark, tmp_path):
    import collections

    import pytest

    from xenoeye_spark.datapipe.layout import write_training_shards
    from xenoeye_spark.datapipe.sampling import permuted_order

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        permuted_order("id").alias("ord"),
        (F.col("id") * 2).alias("payload"),
    )
    out = str(tmp_path / "shards")
    n = write_training_shards(df, out, "ord", 128, id_col="doc_id")
    assert n == 8  # ceil(1000/128)
    rows = spark.read.parquet(out).orderBy("_shard", "ord").collect()
    assert len(rows) == 1000
    sizes = collections.Counter(r._shard for r in rows)
    assert all(sizes[i] == 128 for i in range(7)) and sizes[7] == 104
    # read-back order is the exact global order
    ords = [r.ord for r in rows]
    assert ords == sorted(ords)
    # deterministic shard membership across reruns
    out2 = str(tmp_path / "shards2")
    write_training_shards(df, out2, "ord", 128, id_col="doc_id")
    again = spark.read.parquet(out2).orderBy("_shard", "ord").collect()
    assert [(r._shard, r.doc_id) for r in rows] == \
        [(r._shard, r.doc_id) for r in again]
    # empty input -> zero shards, nothing written
    assert write_training_shards(
        df.filter(F.lit(False)), str(tmp_path / "e"), "ord", 10
    ) == 0
    with pytest.raises(ValueError):
        write_training_shards(df, out, "ord", 0)


def test_write_training_shards_guards(spark, tmp_path):
    """Review fixes: empty input overwrites stale shards; reserved
    column names are rejected."""
    import pytest

    from xenoeye_spark.datapipe.layout import write_training_shards

    df = spark.range(50).select(F.col("id").alias("doc_id"),
                                F.col("id").alias("ord"))
    out = str(tmp_path / "s")
    assert write_training_shards(df, out, "ord", 10, id_col="doc_id") == 5
    assert spark.read.parquet(out).count() == 50
    # empty rerun must CLEAR the previous shards, not leave them stale
    # (the empty partitioned dataset itself is unreadable — no schema —
    # so assert at the filesystem level)
    import glob as _glob

    assert write_training_shards(
        df.filter(F.lit(False)), out, "ord", 10, id_col="doc_id"
    ) == 0
    assert _glob.glob(out + "/_shard=*") == []
    with pytest.raises(ValueError, match="reserved"):
        write_training_shards(
            df.withColumn("_shard", F.lit(1)), out, "ord", 10
        )


def test_mask_spans_twin(spark):
    import collections

    import pytest

    from xenoeye_spark.datapipe.sampling import _A, _A2, _B, _P31, mask_spans

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(f"w{j}" for j in range(30)))
         for i in range(5)]
        + [Row(doc_id=9, text="   ")]            # empty: no rows
    )
    got = collections.defaultdict(list)
    for r in sorted(mask_spans(docs, mask_frac=0.3).collect(),
                    key=lambda r: (r.doc_id, r.span_id)):
        got[r.doc_id].append((r.start_pos, r.end_pos, r.n_tokens,
                              r.span_text))
    cut = int(0.3 * _P31)
    for i in range(5):
        masked = [p for p in range(30)
                  if (i * _A + p * _A2 + _B) % _P31 < cut]
        spans = []
        for p in masked:
            if spans and spans[-1][-1] == p - 1:
                spans[-1].append(p)
            else:
                spans.append([p])
        exp = [(s[0], s[-1], len(s), " ".join(f"w{p}" for p in s))
               for s in spans]
        assert got[i] == exp, i
    assert 9 not in got
    with pytest.raises(ValueError):
        mask_spans(docs, mask_frac=0.0)
