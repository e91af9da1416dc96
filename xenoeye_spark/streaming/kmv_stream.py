"""Streaming distinct-count per (event-time window, key) via the KMV
sketch — the stream twin of ``datapipe.ranking.kmv_distinct``.

The collector-world shape this serves is "distinct source hosts per
monitoring window" (a scan/DDoS signal the reference's mfreq/fwm
family approximates by frequency tables, monit-objects-fwm.c's
windowed group-bys); the training-data shape is "distinct tokens per
shard per hour". Exact streaming distinct needs state proportional to
the vocabulary; the KMV sketch (Bar-Yossef et al. 2002, public) keeps
the k smallest DISTINCT hash values per group — O(k) longs of state —
and estimates |distinct| = (k-1) * P / h_k once full, exact while
under-full (an under-full sketch IS the distinct hash set).

Parity: hashes use the SAME 31-multiplier polynomial + Knuth mix as
the batch operator, so for identical input rows the sketch minima —
and therefore the estimate — match ``kmv_distinct`` bit-for-bit; the
batch-equivalence test asserts exactly that in both the under-full
(exact) and full (estimating) regimes.

State & emission: keyed by (window_start, key); every micro-batch that
touches a group emits a RUNNING row (``is_final=false``); when the
event-time watermark passes the window end the group emits its FINAL
row and frees its state (EventTimeTimeout). Downstream consumers keep
the last row per group, or filter ``is_final``.

Scale: state is <= k longs + 2 scalars per live (window, key) group,
hash-partitioned across state stores; watermark bounds the number of
live windows, so state is O(live_keys * k) regardless of stream
history — the same bounded-state argument as dedup_stream.

A hot key's raw token-hash rows do NOT all cross into its state task
(r6): a stateless map-side pre-combine reduces each partition's rows
to the k smallest DISTINCT hashes per (window, key) before the state
shuffle — correct because a bottom-k-of-distinct sketch is mergeable
(the global k minima are a subset of the union of per-partition k
minima). The raw occurrence count each group folded in survives as a
``_cnt`` partial (group total stamped on the first kept row, 0 on the
rest — sums are flush-invariant), so ``n_rows`` still counts raw
deliveries exactly. Crossing volume per (window, key):
O(k * input_partitions), not O(rows).

Lateness is decided at WINDOW granularity, not per row: the partials
carry the window END as their event time and the watermark delay is
widened by one window duration (``wutil.widen_delay``), so a row is
dropped as late iff its window's final has already been emitted —
a partition-placement-independent rule (a per-row ts filter after the
merge would keep or drop a late row depending on which rows it
happened to share a partition with). See widen_delay's docstring for
the exact watermark arithmetic.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from xenoeye_spark.datapipe.ranking import KMV_P, kmv_token_hashes
from xenoeye_spark.streaming.wutil import (
    bottomk_reduce, precombine_map_in_pandas, session_timezone,
    set_window_timeout, widen_delay, window_duration_ms,
)

_STATE_SCHEMA = "minima array<long>, n_rows long"


def precombined_input(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    text_col: str,
    k: int,
    window: str,
) -> DataFrame:
    """The map-side pre-combine feeding the state op (see module
    docstring): k smallest distinct token hashes + occurrence-count
    partial per (window, key) per partition. The event-time column is
    stamped with the window END — a pure function of the window — so
    the downstream late filter is partition-placement-independent (see
    module docstring / wutil.widen_delay). Module-level so the scale
    smoke can drive it in batch mode and count the rows that would
    cross the state shuffle."""
    win = F.window(F.col(ts_col), window)
    raw = stream.select(
        win.getField("start").alias("window_start"),
        win.getField("end").alias(ts_col),
        F.col(key_col),
        F.explode(kmv_token_hashes(text_col)).alias("_h"),
        F.lit(1).cast("long").alias("_cnt"),
    )
    pre_schema = T.StructType([
        T.StructField("window_start", T.TimestampType()),
        T.StructField(ts_col, T.TimestampType()),
        raw.schema[key_col],
        T.StructField("_h", T.LongType()),
        T.StructField("_cnt", T.LongType()),
    ])
    reduce_fn = bottomk_reduce(
        ["window_start", key_col], ts_col, ["_h"], k
    )
    return precombine_map_in_pandas(raw, pre_schema, reduce_fn)


def kmv_distinct_stream(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    text_col: str = "text",
    k: int = 256,
    window: str = "60 seconds",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Windowed streaming distinct-token estimate.

    Output rows: (window_start, key_col, kmv_k, n_sketch, kmv_estimate,
    n_rows, is_final) — ``n_sketch`` is the sketch fill (== exact
    distinct count while < k), ``kmv_estimate`` the same figure the
    batch operator computes, ``n_rows`` the total (non-distinct) rows
    folded in.
    """
    dur_ms = window_duration_ms(window)
    tz = session_timezone(stream)

    key_type = stream.schema[key_col].dataType
    out_schema = T.StructType([
        T.StructField("window_start", T.TimestampType()),
        T.StructField(key_col, key_type),
        T.StructField("kmv_k", T.LongType()),
        T.StructField("n_sketch", T.LongType()),
        T.StructField("kmv_estimate", T.DoubleType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("is_final", T.BooleanType()),
    ])

    def emit(wstart, key, minima: np.ndarray, n_rows: int, final: bool):
        n_sketch = int(minima.size)
        if n_sketch >= k:
            est = round((k - 1) * float(KMV_P) / float(minima[k - 1]), 6)
        else:
            est = float(n_sketch)
        return pd.DataFrame({
            "window_start": [wstart],
            key_col: [key],
            "kmv_k": [k],
            "n_sketch": [n_sketch],
            "kmv_estimate": [est],
            "n_rows": [n_rows],
            "is_final": [final],
        })

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        wstart, kval = key
        if state.hasTimedOut:
            minima, n_rows = state.get
            yield emit(wstart, kval, np.asarray(minima, dtype=np.int64),
                       int(n_rows), True)
            state.remove()
            return
        batch_hashes: list[np.ndarray] = []
        n_new = 0
        for p in pdfs:
            if len(p):
                batch_hashes.append(p["_h"].to_numpy(dtype=np.int64))
                # _cnt partials, not len(p): rows are pre-combined
                n_new += int(p["_cnt"].sum())
        if not batch_hashes:
            return
        if state.exists:
            old_minima, n_rows = state.get
            parts = [np.asarray(old_minima, dtype=np.int64)] + batch_hashes
        else:
            n_rows = 0
            parts = batch_hashes
        minima = np.unique(np.concatenate(parts))[:k]
        n_rows = int(n_rows) + n_new
        state.update((minima.tolist(), n_rows))
        set_window_timeout(state, wstart, dur_ms, tz)
        yield emit(wstart, kval, minima, n_rows, False)

    hashed = (
        precombined_input(stream, key_col, ts_col, text_col, k, window)
        .withWatermark(ts_col, widen_delay(watermark_delay, dur_ms))
    )
    return hashed.groupBy("window_start", key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
