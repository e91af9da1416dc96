"""fwm — fixed time-window GROUP-BY aggregation.

Reference: monit-objects-fwm.c. Tumbling processing-time windows of ``time``
seconds; key = the non-aggregable fields, values = SUM of each aggregable
field × scale × sampling_rate (monit-objects.c:973-1022); SUM is the only
aggregate (monit-objects.c:991-997). Per-thread partial tries merged before
export (monit-objects-fwm.c:593-691) — in Spark that is partial aggregation
+ shuffle, which we get for free from groupBy.

Scale notes: the groupBy shuffles on (window, keys). Cardinality after
aggregation is #distinct keys per window — tiny compared to input — so the
expensive part is the map-side partial agg, which Catalyst already does.
No additional repartitioning needed; AQE coalesces the post-shuffle side.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from xenoeye_spark.dsl.compiler import FilterContext
from xenoeye_spark.dsl.fields import FieldSpec, parse_field


@dataclass
class FwmSpec:
    """One fwm entry of an mo.conf (CONFIG.md:348-375)."""

    fields: list[FieldSpec]
    time: int = 30          # window seconds (monit-objects.h:10)
    limit: int | None = None  # top-N; None = all rows

    @classmethod
    def parse(cls, field_strs: list[str], time: int = 30, limit: int | None = None):
        return cls(fields=[parse_field(s) for s in field_strs], time=time, limit=limit)


def fwm_aggregate(
    df: DataFrame,
    spec: FwmSpec,
    ctx: FilterContext | None = None,
    ts_col: str = "ts",
    sampling_col: str | None = "sampling_rate",
    window: bool = True,
) -> DataFrame:
    """Windowed groupBy-SUM for one fwm entry.

    Output columns: ``time`` (window start, mirroring the exported SQL's
    ``time`` column, monit-objects-fwm.c:270-324), one column per key field,
    one SUM per aggregable field (aliased to its sql_name).
    """
    if ctx is None:
        ctx = FilterContext()
    keys: list[Column] = []
    key_names: list[str] = []
    aggs: list[Column] = []
    for f in spec.fields:
        if f.is_aggr:
            val = f.column(ctx)
            if sampling_col and sampling_col in df.columns:
                # per-device multiplier on counters (monit-objects.c:995)
                val = val * F.coalesce(F.col(sampling_col), F.lit(1))
            aggs.append(F.sum(val).alias(f.sql_name))
        else:
            keys.append(f.column(ctx).alias(f.sql_name))
            key_names.append(f.sql_name)
    if not aggs:
        raise ValueError("fwm needs at least one aggregable field")

    group_cols: list[Column] = []
    if window:
        # tumbling processing-time window; reference uses server arrival
        # time only (INTERNALS.md:126-128)
        group_cols.append(
            F.window(F.col(ts_col), f"{spec.time} seconds").start.alias("time")
        )
    group_cols.extend(keys)
    return df.groupBy(*group_cols).agg(*aggs)
