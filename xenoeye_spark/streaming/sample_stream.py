"""Streaming per-(window, group) uniform sampling with O(k) state —
the stream twin of ``datapipe.sampling.stratified_sample``.

A classic reservoir sample is RNG-driven and order-dependent; this is
the DETERMINISTIC bottom-k variant (public technique; Cohen & Kaplan's
bottom-k sketches): keep the k rows whose permuted-id hash is smallest.
The selection criterion is EXACTLY ``stratified_sample``'s rank key:
(id * A + B) mod 2^31-1 ascending, id ascending on hash ties — two
distinct ids exactly 2^31-1 apart DO collide under the mod-P
permutation over the [0, 2^32) id domain, and both survive here like
the batch window's id tiebreak keeps both. For the same rows the
stream's final sample equals the batch operator's row-for-row — the
batch-equivalence test asserts set equality per window/group.

Bottom-k is order-free and mergeable (union the candidate sets, keep
the k smallest), so micro-batch boundaries and shuffle order cannot
change the result — same determinism argument as the KMV sketch
(``kmv_stream``), which is the same structure over a different value.

State per (window, group): <= k (hash, id) pairs + 1 scalar; finals on
event-time timeout when the watermark passes the window end, running
rows each touched micro-batch — the kmv_stream emission contract.

A hot group's raw rows do NOT all cross into its state task (r6): a
stateless map-side pre-combine keeps only each partition's k smallest
deduped (hash, id) pairs per (window, group) before the state shuffle
— bottom-k is mergeable, so the global bottom-k is a subset of the
union of per-partition bottom-ks. Raw delivery counts survive as a
``_cnt`` partial (group total on the first kept row, 0 on the rest),
so ``n_rows`` still counts deliveries exactly. Crossing volume per
(window, group): O(k * input_partitions), not O(rows).

Lateness is decided at WINDOW granularity: partials carry the window
END as their event time and the watermark delay is widened by one
window (``wutil.widen_delay``), so a row is dropped iff its window's
final already fired — independent of which rows shared a partition
(a per-row ts filter after the merge would not be). See
widen_delay's docstring for the watermark arithmetic.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from xenoeye_spark.datapipe.sampling import permuted_order
from xenoeye_spark.streaming.wutil import (
    bottomk_reduce, precombine_map_in_pandas, session_timezone,
    set_window_timeout, widen_delay, window_duration_ms,
)

_STATE_SCHEMA = "hashes array<long>, ids array<long>, n_rows long"


def precombined_input(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    k: int,
    window: str,
) -> DataFrame:
    """The map-side pre-combine feeding the state op (see module
    docstring): k smallest deduped (hash, id) pairs + delivery-count
    partial per (window, group) per partition. The event-time column
    is stamped with the window END so the downstream late filter is
    partition-placement-independent (see wutil.widen_delay).
    Module-level so the scale smoke can drive it in batch mode and
    count the rows that would cross the state shuffle."""
    win = F.window(F.col(ts_col), window)
    raw = stream.select(
        win.getField("start").alias("window_start"),
        win.getField("end").alias(ts_col),
        F.col(key_col),
        F.col(id_col).cast("long").alias("_id"),
        permuted_order(id_col).alias("_h"),
        F.lit(1).cast("long").alias("_cnt"),
    )
    pre_schema = T.StructType([
        T.StructField("window_start", T.TimestampType()),
        T.StructField(ts_col, T.TimestampType()),
        raw.schema[key_col],
        T.StructField("_id", T.LongType()),
        T.StructField("_h", T.LongType()),
        T.StructField("_cnt", T.LongType()),
    ])
    reduce_fn = bottomk_reduce(
        ["window_start", key_col], ts_col, ["_h", "_id"], k
    )
    return precombine_map_in_pandas(raw, pre_schema, reduce_fn)


def bottomk_sample_stream(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    k: int = 100,
    window: str = "60 seconds",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Windowed deterministic k-sample per group.

    Output rows (one per SAMPLED id per emission): (window_start,
    key_col, id_col, sample_rank, n_rows, is_final) — ``sample_rank``
    is 1-based in hash order, identical to ``stratified_sample``'s
    rank for the same rows.
    """
    dur_ms = window_duration_ms(window)
    tz = session_timezone(stream)

    key_type = stream.schema[key_col].dataType
    out_schema = T.StructType([
        T.StructField("window_start", T.TimestampType()),
        T.StructField(key_col, key_type),
        T.StructField(id_col, T.LongType()),
        T.StructField("sample_rank", T.LongType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("is_final", T.BooleanType()),
    ])

    def emit(wstart, kval, hashes, ids, n_rows, final):
        # (hash, id) order — hash ties rank by id, like the batch window
        order = np.lexsort((ids, hashes))
        return pd.DataFrame({
            "window_start": [wstart] * len(ids),
            key_col: [kval] * len(ids),
            id_col: np.asarray(ids)[order],
            "sample_rank": np.arange(1, len(ids) + 1, dtype=np.int64),
            "n_rows": [n_rows] * len(ids),
            "is_final": [final] * len(ids),
        })

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        wstart, kval = key
        if state.hasTimedOut:
            hashes, ids, n_rows = state.get
            yield emit(wstart, kval, np.asarray(hashes, dtype=np.int64),
                       np.asarray(ids, dtype=np.int64), int(n_rows), True)
            state.remove()
            return
        parts = [p for p in pdfs if len(p)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        if state.exists:
            hashes, ids, n_rows = state.get
            h = np.concatenate([
                np.asarray(hashes, dtype=np.int64),
                pdf["_h"].to_numpy(dtype=np.int64),
            ])
            i = np.concatenate([
                np.asarray(ids, dtype=np.int64),
                pdf["_id"].to_numpy(dtype=np.int64),
            ])
        else:
            n_rows = 0
            h = pdf["_h"].to_numpy(dtype=np.int64)
            i = pdf["_id"].to_numpy(dtype=np.int64)
        # lexicographic (hash, id) candidate order — the batch window's
        # (hkey asc, id asc). Dedup EXACT (hash, id) pairs (duplicate
        # deliveries of one id); two DISTINCT ids CAN share a hash (the
        # mod-2^31-1 permutation over a 2^32 id domain collides for ids
        # P apart) and both must survive, exactly as the batch
        # tiebreak keeps both.
        order = np.lexsort((i, h))
        h, i = h[order], i[order]
        if h.size > 1:
            keep_mask = np.ones(h.size, dtype=bool)
            keep_mask[1:] = (h[1:] != h[:-1]) | (i[1:] != i[:-1])
            h, i = h[keep_mask], i[keep_mask]
        if h.size > k:
            h, i = h[:k], i[:k]
        # _cnt partials, not len(pdf): rows are pre-combined
        n_rows = int(n_rows) + int(pdf["_cnt"].sum())
        state.update((h.tolist(), i.tolist(), n_rows))
        set_window_timeout(state, wstart, dur_ms, tz)
        yield emit(wstart, kval, h, i, n_rows, False)

    prepped = (
        precombined_input(stream, key_col, ts_col, id_col, k, window)
        .withWatermark(ts_col, widen_delay(watermark_delay, dur_ms))
    )
    return prepped.groupBy("window_start", key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
