"""Debug flow dump — per-flow text rendering (flow-debug.c parity).

The reference can print every decoded flow to syslog or a file, globally
or per monitoring object (CONFIG.md:90-97). Here: a Column that renders a
flow row as one text line, plus sinks for batch (file) and streaming
(console / foreachBatch file append).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from xenoeye_spark.functions.scalar import ip4_to_str


def flow_debug_line(df: DataFrame) -> Column:
    """'ip4_src_addr: 1.2.3.4, l4_src_port: 80, ...' for the columns the
    row actually has (present fields only, like the reference's dump)."""
    parts: list[Column] = []
    for name in df.columns:
        col = F.col(name)
        dt = df.schema[name].dataType.simpleString()
        if name in ("ip4_src_addr", "ip4_dst_addr", "ip4_next_hop",
                    "bgp_next_hop", "dev_ip"):
            rendered = ip4_to_str(col)
        elif dt == "binary":
            rendered = F.hex(col)
        else:
            rendered = col.cast("string")
        parts.append(
            F.when(col.isNotNull(), F.concat(F.lit(f"{name}: "), rendered))
        )
    return F.concat_ws(", ", *parts).alias("flow_debug")


def dump_flows_stream(flows: DataFrame, checkpoint_dir: str,
                      console: bool = True, path: str | None = None):
    """writeStream dump (the 'dump-flows' config key): console when
    ``console`` (the syslog stand-in), else an append-to-``path``
    foreachBatch sink — console=False without a path used to return a
    writer with NO sink at all (start() failed wanting a parquet
    path)."""
    lines = flows.select(flow_debug_line(flows))
    if console or path is None:
        w = (
            lines.writeStream.outputMode("append")
            .format("console").option("truncate", "false")
        )
    else:
        def _append(df: DataFrame, _epoch: int, _p=path) -> None:
            rows = df.collect()
            if rows:
                with open(_p, "a") as fh:
                    for r in rows:
                        fh.write(r[0] + "\n")

        w = lines.writeStream.outputMode("append").foreachBatch(_append)
    return w.option("checkpointLocation", checkpoint_dir)
