"""Global ``xenoeye.conf`` model (CONFIG.md:20-110, xenoeye.c:276-369).

Sections: ``capture`` / ``sflow-capture`` (socket or pcap entries, one
worker per entry — here one ingest source per entry), ``templates`` (the
persistent template DB path → TemplateStore seed file), ``debug``
(dump-flows target), ``devices``, ``mo-dir``, ``geodb``, ``db-type``,
``db-export`` (runner script), ``ch-codec`` (ClickHouse column codec for
exported DDL). JSONC like every other config.

``build_engine()`` bridges the global config to the Engine orchestrator;
capture entries map to the ingest helpers (UdpBridge ports /
pcap_flows_df globs) — wiring a live source is the caller's choice since
tests replay files.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from xenoeye_spark.config.mo import parse_jsonc

# the reference accepts pg|ch (xenoeye.c:317) and logs unknown types;
# the sink code recognizes "clickhouse" — normalize here so a stock
# reference config with "db-type": "ch" does not silently emit
# PostgreSQL DDL at ClickHouse
_DB_TYPES = {"pg": "pg", "postgresql": "pg",
             "ch": "clickhouse", "clickhouse": "clickhouse"}


def _norm_db_type(v: str) -> str:
    t = _DB_TYPES.get(str(v).lower())
    if t is None:
        raise ValueError(f"unknown db-type {v!r} (expected pg or ch)")
    return t


@dataclass
class CaptureEntry:
    kind: str                 # "socket" | "pcap"
    listen_on: str = "*"
    port: int = 2055
    interface: str = ""
    bpf: str = ""

    @classmethod
    def from_dict(cls, d: dict) -> "CaptureEntry":
        if "socket" in d:
            s = d["socket"]
            return cls(kind="socket", listen_on=s.get("listen-on", "*"),
                       port=int(s.get("port", 2055)))
        if "pcap" in d:
            p = d["pcap"]
            return cls(kind="pcap", interface=p.get("interface", ""),
                       bpf=p.get("filter", ""))
        raise ValueError(f"capture entry needs 'socket' or 'pcap': {d}")


@dataclass
class XenoeyeConfig:
    capture: list[CaptureEntry] = field(default_factory=list)
    sflow_capture: list[CaptureEntry] = field(default_factory=list)
    templates_db: str | None = None
    dump_flows: str = "none"          # none | syslog | /path/file
    devices: str | None = None
    mo_dir: str = "mo"
    geodb: str | None = None
    db_type: str = "pg"
    db_export: str | None = None      # runner script/command
    ch_codec: str = ""
    iplists_dir: str | None = None    # xenoeye.c:292, default dir :44

    @classmethod
    def from_dict(cls, d: dict) -> "XenoeyeConfig":
        return cls(
            capture=[CaptureEntry.from_dict(e) for e in d.get("capture", [])],
            sflow_capture=[
                CaptureEntry.from_dict(e) for e in d.get("sflow-capture", [])
            ],
            templates_db=d.get("templates", {}).get("db"),
            dump_flows=d.get("debug", {}).get("dump-flows", "none"),
            devices=d.get("devices"),
            mo_dir=d.get("mo-dir", "mo"),
            geodb=d.get("geodb"),
            db_type=_norm_db_type(d.get("db-type", "pg")),
            db_export=d.get("db-export"),
            ch_codec=d.get("ch-codec", ""),
            iplists_dir=d.get("iplists-dir"),
        )

    @classmethod
    def from_file(cls, path: str) -> "XenoeyeConfig":
        with open(path) as fh:
            return cls.from_dict(parse_jsonc(fh.read()))

    def socket_ports(self) -> list[int]:
        return [e.port for e in self.capture + self.sflow_capture
                if e.kind == "socket"]

    def socket_entries(self) -> list["CaptureEntry"]:
        return [e for e in self.capture + self.sflow_capture
                if e.kind == "socket"]

    def build_engine(self, **overrides):
        """Engine for this config's mo-dir/db-type, with named IP lists
        loaded into the filter context when iplists-dir is set."""
        from xenoeye_spark.engine import Engine

        kw = dict(mo_dir=self.mo_dir, db_type=self.db_type,
                  ch_codec=self.ch_codec)
        if "ctx" not in overrides and (self.iplists_dir or self.geodb):
            from xenoeye_spark.dsl.compiler import FilterContext
            from xenoeye_spark.enrich.geoip import load_geodb_dir, make_geo_fn
            from xenoeye_spark.enrich.iplist import load_iplists_dir

            lists = (
                load_iplists_dir(self.iplists_dir) if self.iplists_dir else {}
            )
            geo_db, as_db = (
                load_geodb_dir(self.geodb) if self.geodb else (None, None)
            )
            if lists or geo_db or as_db:
                kw["ctx"] = FilterContext(
                    iplists=lists,
                    geo_fn=(
                        make_geo_fn(geo_db, as_db)
                        if (geo_db or as_db) else None
                    ),
                )
        kw.update(overrides)
        return Engine(**kw)
