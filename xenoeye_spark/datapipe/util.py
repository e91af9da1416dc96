"""Shared datapipe plumbing."""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def env_int(name: str, default: int) -> int:
    """Integer env-var knob (r13, ADVICE r12): unset or EMPTY falls back
    to the default (an empty string means "unset" — the d792618
    contract), any other non-integer value raises naming the variable
    instead of a bare ValueError deep inside an operator."""
    raw = os.environ.get(name)
    if raw is None or raw.strip() == "":
        return default
    try:
        return int(raw)
    except ValueError:
        raise ValueError(
            f"{name} must be an integer, got {raw!r}"
        ) from None

# THE canonical whitespace tokenizer, in both Column and SQL-string form.
# Every text operator (text.py, dedup.py, ranking.py) and every DuckDB
# oracle mirrors this exact expression — one definition, or a future
# delimiter tweak silently desynchronizes operators from their oracles.
WS_TOKENS_SQL = "filter(split(trim({c}), '\\\\s+'), t -> t != '')"


def ws_tokens(text_col: Column | str) -> Column:
    """Whitespace tokens with empties dropped (Column form).

    Known boundary: ``\\s`` here is Java's class, which includes
    U+000B (vertical tab); the DuckDB oracle's RE2 ``\\s`` does not —
    a document containing a bare \\x0B tokenizes differently across
    the engines. The gate corpora contain none, and crawl text
    reaches the tokenizer after extract_html_text, whose explicit
    HTML_WS class has already collapsed \\x0B into plain spaces."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")


def ws_tokens_sql(col_name: str) -> str:
    """The same tokenizer as a Spark-SQL expression string (for use
    inside F.expr-composed higher-order expressions)."""
    return WS_TOKENS_SQL.format(c=col_name)


def spread(
    df: DataFrame, min_parts: int | None = None, min_bytes: int = 0
) -> DataFrame:
    """Guard a CPU-bound per-row kernel against an under-partitioned scan.

    A parquet file with one row group is unsplittable, so a small corpus
    can reach a heavy projection (winnowing grams, simhash bit-votes,
    shingle windows, media decode) as a SINGLE partition — the whole
    stage then runs on one core regardless of cluster size. When the
    input has fewer partitions than the session's default parallelism,
    repartition up to it (one narrow shuffle of ids+payload, measured 9x
    on the sf0.1 winnowing grams stage).

    At 100-TB scale the scan yields orders of magnitude more splits than
    cores, the condition is false, and this is a no-op — the guard never
    forces a shuffle onto a well-partitioned corpus.

    Inputs with an upstream Exchange are returned untouched WITHOUT
    probing: their kernel stage already runs at shuffle-partition
    parallelism, and probing ``.rdd`` under AQE would eagerly execute
    the upstream stages just to count partitions (they would then run
    AGAIN in the real job). The exchange check reads the non-adaptive
    physical plan, which plans but never executes.

    ``min_bytes``: cost floor for VECTORIZED kernels (numpy matmuls over
    Arrow batches), whose single-core cost on a small input is lower than
    the repartition's own scheduling/shuffle overhead (~0.5-1s for 32
    tasks, measured on the r4 embedding-family bench). When the
    optimizer's size estimate for the input — plan statistics, no
    execution; for a parquet scan this is the file size — is below the
    floor, return untouched. Interpreted-lambda kernels (winnowing
    grams, shingle windows: ~us/byte) should keep the default 0: spread
    measured 9x on a 600 KB corpus for those.

    Known blind spot: partition COUNT is a proxy for balance. A union of
    an unsplittable scan with a many-partition-but-tiny frame (e.g.
    ``createDataFrame`` of a handful of rows, which spreads them over
    defaultParallelism partitions) passes the count check while all the
    data sits in one partition — the kernel then runs single-core
    (measured 3.3x on the r4 planted-union fixture). Detecting that
    without executing the plan is not possible here; callers unioning a
    big scan with a small local frame should ``coalesce(1)`` the small
    side or repartition the union themselves.
    """
    if df.isStreaming:
        # a stream's parallelism comes from its source/shuffle config,
        # and .rdd / plan-stat probes are illegal on unstarted streams
        # (r6: surfaced when incremental_dedup_stream reused the batch
        # signature builder) — the unsplittable-scan rescue this guard
        # exists for cannot arise here
        return df
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    try:
        plan = df._jdf.queryExecution().sparkPlan().toString()
        if "Exchange" in plan:
            return df
    except Exception:
        pass  # plan introspection is best-effort; fall through to probe
    if min_bytes > 0:
        try:
            size = int(
                df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
            if size < min_bytes:
                return df
        except Exception:
            pass  # stats are best-effort; fall through to the probe
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
