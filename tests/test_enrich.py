"""Enrichment tests: IP-list membership, GeoIP/ASN longest-prefix match,
devices (sampling rate + mark filters)."""

from __future__ import annotations

import ipaddress

import pytest
from pyspark.sql import functions as F

from xenoeye_spark.enrich.geoip import GeoDB
from xenoeye_spark.enrich.iplist import IpList
from xenoeye_spark.functions.scalar import str_to_ip4


def test_iplist_membership_vs_ipaddress(spark):
    cidrs = ["10.0.0.0/8", "192.168.1.0/24", "203.0.113.7/32", "172.16.0.0/12"]
    ipl = IpList("t", cidrs)
    nets = [ipaddress.ip_network(c) for c in cidrs]
    samples = [
        "10.1.2.3", "11.0.0.1", "192.168.1.99", "192.168.2.1",
        "203.0.113.7", "203.0.113.8", "172.16.0.1", "172.32.0.1",
        "0.0.0.0", "255.255.255.255",
    ]
    df = spark.createDataFrame([(s, str_to_ip4(s)) for s in samples],
                               "s string, ip long")
    out = {r["s"]: r["m"] for r in
           df.select("s", ipl.match_expr(F.col("ip")).alias("m")).collect()}
    for s in samples:
        expected = any(ipaddress.ip_address(s) in n for n in nets)
        assert out[s] == expected, s


def test_iplist_comments_and_empty(spark):
    ipl = IpList("t", ["# comment", "", "10.0.0.0/8"])
    df = spark.createDataFrame([(str_to_ip4("10.9.9.9"),)], "ip long")
    assert df.select(ipl.match_expr(F.col("ip")).alias("m")).first()["m"] is True

    empty = IpList("e", [])
    assert df.select(empty.match_expr(F.col("ip")).alias("m")).first()["m"] is False


def test_geoip_longest_prefix_wins(spark):
    """geoip.c LPM: most specific overlapping prefix wins; miss -> '?'
    (monit-objects.c:766-769)."""
    db = GeoDB([
        ("10.0.0.0/8", {"country": "wide", "asn": 100}),
        ("10.1.0.0/16", {"country": "mid", "asn": 200}),
        ("10.1.2.0/24", {"country": "narrow", "asn": 300}),
    ])
    samples = {
        "10.1.2.3": "narrow", "10.1.9.9": "mid",
        "10.200.0.1": "wide", "11.0.0.1": "?",
    }
    df = spark.createDataFrame(
        [(s, str_to_ip4(s)) for s in samples], "s string, ip long"
    )
    out = {r["s"]: r["c"] for r in df.select(
        "s", db.lookup_expr("country", F.col("ip")).alias("c")).collect()}
    assert out == samples


def test_geoip_asn_miss_zero_and_null_ip(spark):
    db = GeoDB([("10.0.0.0/8", {"asn": 64512})])
    df = spark.createDataFrame(
        [(str_to_ip4("10.0.0.1"),), (str_to_ip4("9.9.9.9"),), (None,)], "ip long"
    )
    out = [r["a"] for r in
           df.select(db.lookup_expr("asn", F.col("ip")).alias("a")).collect()]
    assert out == [64512, 0, 0]


def test_geoip_v6_lpm(spark):
    import ipaddress
    db = GeoDB([
        ("2001:db8::/32", {"country": "wide"}),
        ("2001:db8:1::/48", {"country": "narrow"}),
        ("10.0.0.0/8", {"country": "v4"}),
    ])
    samples = {
        "2001:db8:1::5": "narrow",
        "2001:db8:2::5": "wide",
        "2001:dead::1": "?",
    }
    rows = [(s, ipaddress.IPv6Address(s).packed) for s in samples]
    df = spark.createDataFrame(rows, "s string, ip6 binary")
    out = {r["s"]: r["c"] for r in df.select(
        "s", db.lookup_expr6("country", F.col("ip6")).alias("c")).collect()}
    assert out == samples


def test_dsl_addr6_and_iplist6(spark):
    import ipaddress
    from xenoeye_spark.dsl.compiler import FilterContext, compile_filter
    rows = [
        ("2001:db8::1",), ("2001:db8:ffff::1",), ("fe80::1",),
    ]
    df = spark.createDataFrame(
        [(ipaddress.IPv6Address(s).packed,) for s, in rows], "ip6_src_addr binary"
    )
    ctx = FilterContext(iplists={"l6": IpList("l6", ["fe80::/10"])})
    got = df.filter(compile_filter("src host6 2001:db8::/32", ctx)).count()
    assert got == 2
    got6 = df.filter(compile_filter("src net6 l6", ctx)).count()
    assert got6 == 1


def test_flow_debug_line(spark):
    from xenoeye_spark.streaming.debug import flow_debug_line
    df = spark.createDataFrame(
        [(0x01020304, 80, None)], "ip4_src_addr long, l4_src_port long, proto long"
    )
    line = df.select(flow_debug_line(df)).first()[0]
    assert "ip4_src_addr: 1.2.3.4" in line
    assert "l4_src_port: 80" in line
    assert "proto" not in line  # null fields omitted


def test_devices_conf_full_semantics(spark, tmp_path):
    """devices.conf loader + per-device marks: each device's mark
    expressions apply only to its own flows; skip-unmarked drops only
    that device's unmarked flows (devices.c:237-313)."""
    from xenoeye_spark.enrich.devices import apply_devices, load_devices_conf

    conf = tmp_path / "devices.conf"
    conf.write_text("""
[
    {
        "ip": "10.0.0.1",
        "id": 0,
        "sampling-rate": 100,
        "mark": [ "src ifidx 7", "dst ifidx 7" ],
        "skip-unmarked": true
    },
    { "ip": "10.0.0.2", "sampling-rate": 1000 }
    /* trailing comment */
]
""")
    devices = load_devices_conf(str(conf))
    assert [d.sampling_rate for d in devices] == [100, 1000]

    d1, d2 = 0x0A000001, 0x0A000002
    flows = spark.createDataFrame(
        [
            (d1, 0, 7, 1),    # device 1, marked via src ifidx
            (d1, 0, 2, 7),    # device 1, marked via dst ifidx
            (d1, 0, 2, 3),    # device 1, unmarked -> dropped
            (d2, 0, 2, 3),    # device 2: no marks -> kept, mark 0
        ],
        "dev_ip long, dev_id long, input_snmp long, output_snmp long",
    )
    out = apply_devices(flows, devices).collect()
    got = {(r["dev_ip"], r["input_snmp"], r["output_snmp"]):
           (r["dev_mark"], r["sampling_rate"]) for r in out}
    assert got == {
        (d1, 7, 1): (1, 100),
        (d1, 2, 7): (1, 100),
        (d2, 2, 3): (0, 1000),
    }
