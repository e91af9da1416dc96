"""Device dimension — sampling rate + interface mark filters.

Reference: devices.c. Each exporting device (router) declares a sampling
rate applied as a multiplier to counters (devices.c:199-235,
STEP-BY-STEP.md:181) and optional "mark" filter expressions: each matching
mark expression increments ``dev_mark``; ``skip-unmarked`` drops flows with
mark 0 (devices.c:237-313, CONFIG.md:183-197).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xenoeye_spark.dsl.compiler import FilterContext, compile_filter


def apply_sampling_rate(
    flows: DataFrame, devices: DataFrame, default_rate: int = 1
) -> DataFrame:
    """Broadcast-join sampling_rate by (dev_ip [, dev_id])."""
    keys = ["dev_ip"] + (["dev_id"] if "dev_id" in devices.columns else [])
    dim = devices.select(*keys, F.col("sampling_rate").alias("_sr"))
    out = flows.join(F.broadcast(dim), on=keys, how="left")
    return out.withColumn(
        "sampling_rate", F.coalesce(F.col("_sr"), F.lit(default_rate))
    ).drop("_sr")


def apply_device_marks(
    flows: DataFrame,
    mark_filters: list[str],
    ctx: FilterContext | None = None,
    skip_unmarked: bool = False,
) -> DataFrame:
    """dev_mark = count of matching mark expressions; optionally drop
    unmarked flows (devices.c:286-314)."""
    if ctx is None:
        ctx = FilterContext()
    mark = F.lit(0)
    for expr_str in mark_filters:
        cond = compile_filter(expr_str, ctx)
        mark = mark + F.when(cond, F.lit(1)).otherwise(F.lit(0))
    out = flows.withColumn("dev_mark", mark.cast("long"))
    if skip_unmarked:
        out = out.filter(F.col("dev_mark") > 0)
    return out
