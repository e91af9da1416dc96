"""Plan lint: every driver query's physical plan is scanned for scale
antipatterns. PLANS.md documents the plans; this test ENFORCES them —
a regression that sneaks a cartesian product or a row-at-a-time Python
UDF into a query fails CI, not a 100-TB run.

Allow-lists are deliberate and documented per query; adding to them is
a review decision, not a default.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

# Queries whose BroadcastNestedLoopJoin is a DESIGNED tiny-build-side
# broadcast, not an accident:
#   sim_topk       — the <=5-row query set broadcast against the corpus
#                    (exact brute-force baseline, documented in PLANS.md)
#   bm25           — the ONE-ROW (n, avgdl) scalar attach
#   tfidf_topterms — the ONE-ROW in-plan N scalar attach
#   bigram_lm      — the ONE-ROW vocabulary-size scalar attach
BNL_ALLOWED = {"sim_topk", "bm25", "tfidf_topterms", "bigram_lm"}


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_DIR)
        out[name] = df._jdf.queryExecution().executedPlan().toString()
    return out


def test_no_cartesian_product(plans):
    bad = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert not bad, f"cartesian product in: {bad}"


def test_no_unexpected_broadcast_nested_loop(plans):
    bad = [
        n for n, p in plans.items()
        if "BroadcastNestedLoopJoin" in p and n not in BNL_ALLOWED
    ]
    assert not bad, f"unreviewed BroadcastNestedLoopJoin in: {bad}"


def test_no_row_at_a_time_python_udf(plans):
    # BatchEvalPython = pickled row-at-a-time Python UDF (the slow path);
    # ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas are the
    # vectorized Arrow stages and are fine.
    bad = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert not bad, f"row-at-a-time Python UDF in: {bad}"


def test_allowlist_entries_still_have_bnl(plans):
    """An allow-list entry whose query no longer plans a BNL is stale —
    prune it so the lint stays meaningful."""
    stale = [
        n for n in BNL_ALLOWED
        if n in plans and "BroadcastNestedLoopJoin" not in plans[n]
    ]
    assert not stale, f"stale BNL allow-list entries: {stale}"
