"""Streaming windowed quantiles per (event-time window, key) via a
mergeable log-histogram — the stream twin of
``operators.summary.group_quantiles`` (whose exact path sorts each
group and whose GK path is batch-only).

The collector-world shape is "p99 flow duration / packet size per
monitoring window" (the reference reports fixed aggregates per window,
monit-objects-fwm.c; percentiles need a sketch); the training-data
shape is "token-length p50/p90/p99 per source per ingest hour". Exact
streaming quantiles need the window's full value multiset; this keeps
a LOG-HISTOGRAM: non-negative integer values bin into SUB=16 sub-bins
per power of two (bin id and boundaries are pure int arithmetic), so
relative error is bounded by 1/SUB per boundary (~6% worst-case with
in-bin linear interpolation) and state is O(bins-touched) <= SUB * 64
longs per live (window, key) group.

Mergeability: the histogram is a count vector — bin-wise addition is
the merge — so the state op's input is PRE-COMBINED per partition into
(window, key, bin) partial counts: crossing volume per group is
O(bins * input_partitions) rows per micro-batch, not the raw stream
(same rail as the CMS/KMV/MG streams). Lateness is window-
deterministic via the window-end stamp + widened delay
(``wutil.widen_delay``).

The python twin in tests folds the same integer binning and the same
interpolation, and the accuracy test bounds the estimate against the
exact percentile.
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

SUB = 16                       # sub-bins per power of two

# v in [2^(b-1), 2^b) splits into SUB equal sub-bins; values <= 0 take
# bin -1 (estimated as 0). Integer-exact for v < 2^57 ((v-lo)*SUB must
# stay in int64) — far beyond any length/duration/bytes column.
_BIN_SQL = (
    "CASE WHEN {v} <= 0 THEN -1 ELSE "
    "(length(bin({v})) - 1) * {sub} + CAST("
    "(({v} - shiftleft(1L, length(bin({v})) - 1)) * {sub}) div "
    "shiftleft(1L, length(bin({v})) - 1) AS INT) END"
)


def value_bin(v: int, sub: int = SUB) -> int:
    """Python twin of the SQL binning (tests + emit-side bounds)."""
    if v <= 0:
        return -1
    bl = int(v).bit_length()
    lo = 1 << (bl - 1)
    return (bl - 1) * sub + ((v - lo) * sub) // lo


def bin_bounds(b: int, sub: int = SUB) -> tuple[float, float]:
    """[lo, hi) value bounds of a bin id."""
    if b < 0:
        return (0.0, 0.0)
    octave, s = divmod(b, sub)
    lo = float(1 << octave)
    return (lo + lo * s / sub, lo + lo * (s + 1) / sub)


def hist_quantiles(
    bins: np.ndarray, counts: np.ndarray, probs: list[float]
) -> list[float]:
    """Quantile estimates from a (sorted-by-bin) histogram: nearest-rank
    target r = max(1, ceil(q*n)), linear interpolation within the bin
    at fraction (r - cum_before) / bin_count. Deterministic given the
    histogram — the python twin runs the identical fold."""
    order = np.argsort(bins, kind="stable")
    bins, counts = bins[order], counts[order]
    n = int(counts.sum())
    cum = np.cumsum(counts)
    out = []
    for q in probs:
        r = max(1, int(np.ceil(q * n)))
        i = int(np.searchsorted(cum, r))
        lo, hi = bin_bounds(int(bins[i]))
        before = int(cum[i - 1]) if i else 0
        frac = (r - before) / float(counts[i])
        out.append(round(lo + (hi - lo) * frac, 6))
    return out


def precombined_input(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window: str,
) -> DataFrame:
    """Per-partition (window, key, bin) partial counts feeding the
    state op — bin-wise addition IS the histogram merge. Module-level
    so the scale smoke can drive it in batch mode."""
    win = F.window(F.col(ts_col), window)
    raw = stream.select(
        win.getField("start").alias("window_start"),
        win.getField("end").alias(ts_col),
        F.col(key_col),
        F.expr(
            _BIN_SQL.format(v=f"CAST({value_col} AS BIGINT)", sub=SUB)
        ).alias("_bin"),
        F.lit(1).cast("long").alias("_cnt"),
    )
    pre_schema = T.StructType([
        T.StructField("window_start", T.TimestampType()),
        T.StructField(ts_col, T.TimestampType()),
        raw.schema[key_col],
        T.StructField("_bin", T.IntegerType()),
        T.StructField("_cnt", T.LongType()),
    ])

    def reduce_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        out = (
            pdf.groupby(["window_start", key_col, "_bin"],
                        sort=False, dropna=False)
            .agg(**{"_cnt": ("_cnt", "sum"), ts_col: (ts_col, "max")})
            .reset_index()
        )
        out["_cnt"] = out["_cnt"].astype(np.int64)
        return out

    return precombine_map_in_pandas(raw, pre_schema, reduce_fn)


def hist_quantile_stream(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    probs: tuple = (0.5, 0.9, 0.99),
    window: str = "60 seconds",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Windowed streaming quantile estimates per key.

    Output rows: (window_start, key, p50, p90, p99 [one column per
    prob, summary.group_quantiles naming], n_rows, is_final).
    """
    dur_ms = window_duration_ms(window)
    tz = session_timezone(stream)

    def pname(p: float) -> str:
        v = p * 100
        return f"p{int(v)}" if v.is_integer() else (
            f"p{v:g}".replace(".", "_")
        )

    names = [pname(p) for p in probs]
    key_type = stream.schema[key_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("window_start", T.TimestampType()),
            T.StructField(key_col, key_type),
        ]
        + [T.StructField(nm, T.DoubleType()) for nm in names]
        + [
            T.StructField("n_rows", T.LongType()),
            T.StructField("is_final", T.BooleanType()),
        ]
    )

    def emit(wstart, kval, bins, counts, final) -> pd.DataFrame:
        ests = hist_quantiles(bins, counts, list(probs))
        row = {"window_start": [wstart], key_col: [kval]}
        for nm, e in zip(names, ests):
            row[nm] = [e]
        row["n_rows"] = [int(counts.sum())]
        row["is_final"] = [final]
        return pd.DataFrame(row)

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        wstart, kval = key
        if state.hasTimedOut:
            bins_l, counts_l = state.get
            yield emit(wstart, kval,
                       np.asarray(bins_l, dtype=np.int64),
                       np.asarray(counts_l, dtype=np.int64), True)
            state.remove()
            return
        hist: dict[int, int] = {}
        if state.exists:
            bins_l, counts_l = state.get
            hist = dict(zip(bins_l, counts_l))
        touched = False
        for p in pdfs:
            if not len(p):
                continue
            touched = True
            for b, c in zip(p["_bin"].to_numpy(dtype=np.int64),
                            p["_cnt"].to_numpy(dtype=np.int64)):
                hist[int(b)] = hist.get(int(b), 0) + int(c)
        if not touched:
            return
        bins = np.fromiter(hist.keys(), dtype=np.int64, count=len(hist))
        counts = np.fromiter(hist.values(), dtype=np.int64,
                             count=len(hist))
        state.update((bins.tolist(), counts.tolist()))
        set_window_timeout(state, wstart, dur_ms, tz)
        yield emit(wstart, kval, bins, counts, False)

    pre = (
        precombined_input(stream, key_col, ts_col, value_col, window)
        .withWatermark(ts_col, widen_delay(watermark_delay, dur_ms))
    )
    return pre.groupBy("window_start", key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="bins array<long>, counts array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
