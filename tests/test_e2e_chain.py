"""Whole-engine chain: pcap bytes -> UDP extraction -> NetFlow v5 decode
-> mo.conf standing query (filter + fwm top-N) -> SQL export file ->
db-export runner. One test walking every layer a production deployment
uses, with hand-computable numbers."""

from __future__ import annotations

import os
import sys

from xenoeye_spark.config.mo import MoConfig
from xenoeye_spark.sources.pcap import pcap_flows_df
from xenoeye_spark.streaming.fwm_stream import fwm_sql_export
from tests.test_pcap import build_eth_ipv4_udp, build_pcap
from tests.test_sources import build_v5

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))


def test_pcap_to_sql_export_chain(spark, tmp_path):
    # two exporters; TCP flows we keep, UDP flow the filter drops
    v5_a = build_v5([
        {"src": 0x0A000001, "dst": 0x0A000002, "pkts": 2, "octets": 100,
         "sport": 1111, "dport": 80, "proto": 6},
        {"src": 0x0A000001, "dst": 0x0A000003, "pkts": 1, "octets": 50,
         "sport": 1112, "dport": 443, "proto": 6},
        {"src": 0x0A000009, "dst": 0x0A000002, "pkts": 9, "octets": 999,
         "sport": 53, "dport": 5353, "proto": 17},
    ])
    v5_b = build_v5([
        {"src": 0x0A000004, "dst": 0x0A000002, "pkts": 3, "octets": 300,
         "sport": 2222, "dport": 80, "proto": 6},
    ])
    frames = [
        (1700000000.0, build_eth_ipv4_udp(0xC0A80001, 1, 30000, 2055, v5_a)),
        (1700000001.0, build_eth_ipv4_udp(0xC0A80002, 1, 30001, 2055, v5_b)),
    ]
    pcap_path = tmp_path / "routers.pcap"
    pcap_path.write_bytes(build_pcap(frames))

    flows = pcap_flows_df(spark, str(pcap_path), ports={2055})

    mo = MoConfig.from_dict(
        {
            "filter": "proto 6",
            "fwm": [{"name": "tcp_top", "fields": ["octets desc", "src host"],
                     "time": 3600, "limit": 5}],
        },
        name="border",
    )
    result = mo.fwm_result(flows, mo.fwm[0])
    rows = {r["src_host"]: r["octets"] for r in result.collect()}
    # per-src sums of TCP octets only; the UDP flow must not appear
    assert rows == {0x0A000004: 300, 0x0A000001: 150}

    # export: DDL + INSERT file, then ship it with the runner
    exp_dir = str(tmp_path / "exp")
    path = fwm_sql_export(result, "border_tcp_top", exp_dir, epoch_id=7)
    text = open(path).read()
    assert "CREATE TABLE IF NOT EXISTS border_tcp_top" in text
    assert "INSERT INTO border_tcp_top" in text
    assert "300" in text and "150" in text

    from xe_dbexport import run_export

    sink = tmp_path / "db.txt"
    shipped, failed = run_export(exp_dir, f"cat >> {sink}", "pg")
    assert (shipped, failed) == (1, 0)
    assert "INSERT INTO border_tcp_top" in sink.read_text()
