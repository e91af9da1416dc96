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
