"""Shared datapipe plumbing."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# THE canonical whitespace tokenizer, in both Column and SQL-string form.
# Every text operator (text.py, dedup.py, ranking.py) and every DuckDB
# oracle mirrors this exact expression — one definition, or a future
# delimiter tweak silently desynchronizes operators from their oracles.
WS_TOKENS_SQL = "filter(split(trim({c}), '\\\\s+'), t -> t != '')"


def ws_tokens(text_col: Column | str) -> Column:
    """Whitespace tokens with empties dropped (Column form)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")


def ws_tokens_sql(col_name: str) -> str:
    """The same tokenizer as a Spark-SQL expression string (for use
    inside F.expr-composed higher-order expressions)."""
    return WS_TOKENS_SQL.format(c=col_name)


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
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
    """
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    try:
        plan = df._jdf.queryExecution().sparkPlan().toString()
        if "Exchange" in plan:
            return df
    except Exception:
        pass  # plan introspection is best-effort; fall through to probe
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
