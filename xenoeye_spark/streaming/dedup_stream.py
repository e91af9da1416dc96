"""Streaming ingest deduplication.

A training-data (or flow) ingest stream re-delivers records: at-least-
once sources (Kafka, file drops, UDP replay after restart) and upstream
retries both produce duplicates that a batch dedup would only catch a
day later. Structured Streaming's answer is state-store dedup:

- ``dedup_stream``: exact streaming dedup on a key set via
  ``dropDuplicatesWithinWatermark`` — the state store keeps one entry
  per key only until the watermark passes it, so state is bounded by
  (key arrival rate x watermark delay), not by stream history. This is
  the scale-correct form; plain ``dropDuplicates`` on a stream grows
  state forever.

- ``dedup_batch_first_wins``: the ``foreachBatch`` kernel for sinks
  that need the FIRST row's payload (not just key suppression) with
  batch-local ordering control: within each micro-batch, the minimum
  (order_col) row per key wins, and cross-batch suppression rides on the
  same watermark state.

State sizing at 100 TB ingest: one state row ≈ key bytes + timestamp.
A 1M rows/s stream with a 30-minute watermark holds ≤ 1.8G keys spread
across the cluster's state stores — partitioned by key hash, the same
layout as the mavg state (SCALE.md §mavg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Exact streaming dedup: keep the first-arriving row per key; a
    duplicate arriving within ``watermark_delay`` of the original's
    event time is dropped; state for a key is freed once the watermark
    passes it. ``key_cols`` must not include the event-time column
    (dropDuplicatesWithinWatermark requirement)."""
    if ts_col in key_cols:
        raise ValueError("ts_col must not be part of key_cols")
    return stream.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        key_cols
    )


def dedup_batch_first_wins(
    batch: DataFrame,
    key_cols: list[str],
    order_col: str,
) -> DataFrame:
    """Batch-local deterministic dedup kernel (used inside foreachBatch
    alongside the watermark state): per key, the row with the minimum
    ``order_col`` survives. One map-side-combinable min-struct agg —
    the same no-window shape as segment_dedup's first-occurrence
    resolution, so hot keys collapse before the shuffle."""
    others = [c for c in batch.columns if c not in key_cols]
    packed = batch.groupBy(*key_cols).agg(
        F.min(F.struct(order_col, *[c for c in others if c != order_col])).alias("_w")
    )
    return packed.select(
        *key_cols,
        F.col(f"_w.{order_col}").alias(order_col),
        *[F.col(f"_w.{c}").alias(c) for c in others if c != order_col],
    )
