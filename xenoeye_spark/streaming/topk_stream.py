"""Streaming windowed heavy-hitters with O(k) state — the bounded-state
scale path beside the exact streaming ``mfreq`` frequency table.

The reference's frequency machinery (``mfreq``, filter.c:711-751; the
fwm top-N window group-bys, monit-objects-fwm.c) keeps EXACT per-value
counts — a 2^16 table there, a full groupBy here. For unbounded key
domains (src addresses at carrier scale, tokens at corpus scale) exact
counts need state proportional to the domain; the Misra-Gries summary
(public; Misra & Gries 1982, merge rule from Agarwal et al., "Mergeable
Summaries", PODS'12) keeps at most ``k`` (item, count) pairs and
guarantees, after any stream prefix of n rows:

    est(x) <= true(x) <= est(x) + deficit,   deficit <= n/(k+1)

so every item with true count > deficit is PRESENT in the summary —
the top-talkers contract the fwm windows want, at O(k) state.

This implementation uses the MERGE form, not the per-row fold: each
micro-batch's exact (small) count table merges into the state by
summing counts and, when more than ``k`` items remain, subtracting the
(k+1)-th largest count from all and dropping the non-positive. The
merge form is deterministic REGARDLESS of row order within a batch —
that is what makes the stream twin testable against a pure-python fold
and independent of shuffle nondeterminism (the per-row fold's result
depends on arrival order; the merge form's only on batch boundaries).

State per window: ONE summary group of <= k items + counts + 2
scalars (a global top-k is a global reduction — its final fold is one
group by construction); emission mirrors kmv_stream — a running row
per touched group per micro-batch, finals on event-time timeout when
the watermark passes the window end.

What keeps the single final group from being a throughput funnel is
the map-side pre-combine (r6): a stateless ``mapInPandas`` pass
reduces each input partition's raw rows to at most one
(window, item, partial_weight) row per distinct item BEFORE the
shuffle feeding the state op — full input parallelism does the heavy
counting, and the state group only merges per-partition count tables
(<= distinct-items-per-partition rows each, capped by
``wutil.PRECOMBINE_CAP``). Batch totals per (window, item) are
unchanged by where the partial sums split, and the MERGE form is
insensitive to row order within a batch, so for in-watermark rows the
results are bit-identical with and without the pre-combine — the
batch-equivalence test pins exact per-micro-batch summaries.

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

from xenoeye_spark.streaming.wutil import (
    precombine_map_in_pandas, session_timezone, set_window_timeout,
    widen_delay, window_duration_ms,
)

_STATE_SCHEMA = (
    "items array<string>, counts array<long>, n_rows long, deficit long"
)


def mg_merge(
    state: dict[str, int], batch: dict[str, int], k: int
) -> tuple[dict[str, int], int]:
    """Mergeable-summaries Misra-Gries merge: sum the two count maps;
    if more than k items survive, subtract the (k+1)-th largest count
    and keep the strictly positive. Returns (merged, subtracted) —
    ``subtracted`` accumulates into the summary's error deficit.
    Pure function; the stream op and the test twin both call it."""
    merged = dict(state)
    for it, c in batch.items():
        merged[it] = merged.get(it, 0) + c
    if len(merged) <= k:
        return merged, 0
    thresh = sorted(merged.values(), reverse=True)[k]
    out = {it: c - thresh for it, c in merged.items() if c > thresh}
    return out, thresh


def precombined_input(
    stream: DataFrame,
    item_col: str,
    ts_col: str,
    window: str,
    weight_col: str | None = None,
) -> DataFrame:
    """The map-side pre-combine feeding the state op (see module
    docstring): partial weight sums per (window, item) per partition.
    The event-time column is stamped with the window END so the
    downstream late filter is partition-placement-independent (see
    wutil.widen_delay). Module-level so the scale smoke can drive it
    in batch mode and count the rows that would cross the state
    shuffle."""
    w = F.lit(1).cast("long") if weight_col is None else (
        F.col(weight_col).cast("long")
    )
    # NULL items are EXCLUDED before the stateful op (a pandas groupby
    # would silently drop the None key from the summary while its
    # weight still inflated n_rows — n_rows must equal the rows the
    # summary actually folded in)
    win = F.window(F.col(ts_col), window)
    raw = (
        stream.filter(F.col(item_col).isNotNull())
        .select(
            win.getField("start").alias("window_start"),
            win.getField("end").alias(ts_col),
            F.col(item_col).cast("string").alias("_item"),
            w.alias("_w"),
        )
    )
    pre_schema = T.StructType([
        T.StructField("window_start", T.TimestampType()),
        T.StructField(ts_col, T.TimestampType()),
        T.StructField("_item", T.StringType()),
        T.StructField("_w", T.LongType()),
    ])

    def reduce_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return (
            pdf.groupby(["window_start", "_item"], sort=False,
                        dropna=False)
            .agg(**{ts_col: (ts_col, "max"), "_w": ("_w", "sum")})
            .reset_index()
        )

    return precombine_map_in_pandas(raw, pre_schema, reduce_fn)


def heavy_hitters_stream(
    stream: DataFrame,
    item_col: str,
    ts_col: str,
    k: int = 64,
    window: str = "60 seconds",
    watermark_delay: str = "0 seconds",
    weight_col: str | None = None,
) -> DataFrame:
    """Windowed Misra-Gries heavy hitters over ``item_col`` (optionally
    weighted by ``weight_col`` — octets-weighted top talkers rather
    than row counts).

    Output: one row per summary item per emission —
    (window_start, item, est_count, deficit, n_rows, is_final); the
    true count of ``item`` lies in [est_count, est_count + deficit],
    and any item whose window-true count exceeds ``deficit`` is
    guaranteed present in the final summary.
    """
    dur_ms = window_duration_ms(window)
    tz = session_timezone(stream)

    out_schema = T.StructType([
        T.StructField("window_start", T.TimestampType()),
        T.StructField("item", T.StringType()),
        T.StructField("est_count", T.LongType()),
        T.StructField("deficit", T.LongType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("is_final", T.BooleanType()),
    ])

    def emit(wstart, summary: dict[str, int], n_rows: int,
             deficit: int, final: bool) -> pd.DataFrame:
        items = sorted(summary)  # deterministic row order per emission
        return pd.DataFrame({
            "window_start": [wstart] * len(items),
            "item": items,
            "est_count": [summary[i] for i in items],
            "deficit": [deficit] * len(items),
            "n_rows": [n_rows] * len(items),
            "is_final": [final] * len(items),
        })

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (wstart,) = key
        if state.hasTimedOut:
            items, counts, n_rows, deficit = state.get
            yield emit(wstart, dict(zip(items, counts)), int(n_rows),
                       int(deficit), True)
            state.remove()
            return
        parts = [p for p in pdfs if len(p)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        batch = pdf.groupby("_item")["_w"].sum().astype(int).to_dict()
        n_new = int(pdf["_w"].sum())
        if state.exists:
            items, counts, n_rows, deficit = state.get
            summary = dict(zip(items, counts))
        else:
            summary, n_rows, deficit = {}, 0, 0
        summary, subtracted = mg_merge(summary, batch, k)
        n_rows = int(n_rows) + n_new
        deficit = int(deficit) + subtracted
        state.update((
            list(summary), [summary[i] for i in summary], n_rows, deficit
        ))
        set_window_timeout(state, wstart, dur_ms, tz)
        yield emit(wstart, summary, n_rows, deficit, False)

    prepped = (
        precombined_input(stream, item_col, ts_col, window, weight_col)
        .withWatermark(ts_col, widen_delay(watermark_delay, dur_ms))
    )
    return prepped.groupBy("window_start").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
