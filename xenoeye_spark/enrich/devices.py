"""Device dimension — sampling rate + interface mark filters.

Reference: devices.c. Each exporting device (router) declares a sampling
rate applied as a multiplier to counters (devices.c:199-235,
STEP-BY-STEP.md:181) and optional "mark" filter expressions: each matching
mark expression increments ``dev_mark``; ``skip-unmarked`` drops flows with
mark 0 (devices.c:237-313, CONFIG.md:183-197).
"""

from __future__ import annotations

import socket
import struct
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xenoeye_spark.dsl.compiler import FilterContext, compile_filter


@dataclass
class DeviceConfig:
    """One devices.conf entry (devices.c:60-139, CONFIG.md sample)."""

    ip: int                       # device address as uint32
    id: int = 0
    sampling_rate: int = 1
    mark: list[str] = field(default_factory=list)
    skip_unmarked: bool = False

    @classmethod
    def from_dict(cls, d: dict) -> "DeviceConfig":
        return cls(
            ip=struct.unpack(">I", socket.inet_aton(d["ip"]))[0],
            id=int(d.get("id", 0)),
            sampling_rate=int(d.get("sampling-rate", 1)),
            mark=list(d.get("mark", [])),
            skip_unmarked=bool(d.get("skip-unmarked", False)),
        )


def load_devices_conf(path: str) -> list[DeviceConfig]:
    """Parse a devices.conf JSONC array."""
    from xenoeye_spark.config.mo import parse_jsonc

    with open(path) as fh:
        entries = parse_jsonc(fh.read())
    return [DeviceConfig.from_dict(d) for d in entries]


def devices_df(spark, devices: list[DeviceConfig]) -> DataFrame:
    """(dev_ip, dev_id, sampling_rate) dimension for apply_sampling_rate."""
    return spark.createDataFrame(
        [(d.ip, d.id, d.sampling_rate) for d in devices],
        "dev_ip long, dev_id long, sampling_rate long",
    )


def apply_devices(
    flows: DataFrame,
    devices: list[DeviceConfig],
    ctx: FilterContext | None = None,
) -> DataFrame:
    """Full devices.conf semantics over a flow DF: join sampling rate by
    (dev_ip, dev_id), then per-device mark filters — each device's mark
    expressions apply only to ITS flows, and skip-unmarked drops that
    device's unmarked flows without touching other devices'
    (devices.c:237-313)."""
    if ctx is None:
        ctx = FilterContext()
    out = apply_sampling_rate(
        flows, devices_df(flows.sparkSession, devices)
    )
    mark = F.lit(0)
    drop = F.lit(False)
    for d in devices:
        if not d.mark:
            continue
        mine = F.col("dev_ip") == F.lit(d.ip)
        dev_mark = F.lit(0)
        for expr_str in d.mark:
            cond = compile_filter(expr_str, ctx)
            dev_mark = dev_mark + F.when(cond, F.lit(1)).otherwise(F.lit(0))
        mark = F.when(mine, dev_mark).otherwise(mark)
        if d.skip_unmarked:
            drop = drop | (mine & (dev_mark == 0))
    return out.withColumn("dev_mark", mark.cast("long")).filter(~drop)


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
