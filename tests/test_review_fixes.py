"""Regression tests for the round-4 core-path review findings:
mid-run template persistence across micro-batches, typed per-key limit
coercion, short-record decoder padding, ClickHouse literal escaping,
and the engine's classification ClassDB wiring."""

from __future__ import annotations

import glob
import os
import struct

from pyspark.sql import functions as F

from xenoeye_spark.sources.netflow import (
    TemplateJournal,
    decode_packets_df,
    parse_packet,
    TemplateStore,
)
from test_sources import build_v9  # noqa: E402  (pytest puts tests/ on sys.path)


# --------------------------------------------------- templates mid-run

def test_mid_run_template_reaches_next_batch(spark, tmp_path):
    """A template journaled MID-RUN must decode data packets in LATER
    micro-batches: each decode task starts a fresh TemplateStore, so
    without the per-task journal replay only the batch carrying the
    announcement decodes (and the next batch silently drops flows)."""
    tpl_pkt = build_v9([(8, 4), (1, 4)], [(0x0A000001, 11)], tid=301,
                       source_id=5)
    data_body = int(0x0A000003).to_bytes(4, "big") + int(33).to_bytes(4, "big")
    data_fs = struct.pack(">HH", 301, 4 + len(data_body)) + data_body
    data_pkt = struct.pack(">HHIIII", 9, 1, 0, 1700000000, 2, 5) + data_fs

    tj = TemplateJournal(str(tmp_path / "templates"))
    # bridge journals the announcement while the stream is ALREADY up
    tj.append_packet(tpl_pkt, dev_ip=7)
    tj.close()

    # the "next micro-batch": data-only packet, NO static seed
    df = spark.createDataFrame(
        [(data_pkt, 7, 1.7e9)], "data binary, dev_ip long, recv_ts double"
    ).withColumn("recv_ts", F.col("recv_ts").cast("timestamp"))
    rows = decode_packets_df(
        df, journal_paths=(tj.json_path, tj.pkts_path)
    ).collect()
    assert len(rows) == 1 and rows[0]["ip4_src_addr"] == 0x0A000003

    # without the journal the same batch decodes NOTHING (the bug)
    assert decode_packets_df(df).collect() == []


# ------------------------------------------------------- limits typing

def test_coerce_limit_keys_types():
    from xenoeye_spark.config.limits import coerce_limit_keys, norm_group_key

    limits = {
        ("1.2.3.4", "6"): 100.0,
        ("10.0.0.1", "17"): 200.0,
    }
    got = coerce_limit_keys(limits, ["bigint", "bigint"])
    assert got == {(0x01020304, 6): 100.0, (0x0A000001, 17): 200.0}
    # v6 + MAC to binary
    got6 = coerce_limit_keys({("fe80::1",): 1.0}, ["binary"])
    import socket
    assert got6 == {(socket.inet_pton(socket.AF_INET6, "fe80::1"),): 1.0}
    mac = coerce_limit_keys({("aa:bb:cc:00:11:22",): 2.0}, ["binary"])
    assert mac == {(bytes([0xAA, 0xBB, 0xCC, 0x00, 0x11, 0x22]),): 2.0}
    # pandas hands binary group keys over as bytearray
    assert norm_group_key((bytearray(b"\x01"), 5)) == (b"\x01", 5)


def test_per_key_limit_applied_in_stream(spark, tmp_path):
    """End to end: a CSV limit keyed by dotted-quad must beat the
    section default for that key's LongType group value."""
    from xenoeye_spark.config.limits import (
        coerce_limit_keys, parse_limits_lines,
    )
    from xenoeye_spark.streaming.mavg_stream import mavg_alert_stream

    base = 1_700_000_000
    # two keys, identical traffic; key 16909060 (=1.2.3.4) has a huge
    # per-key limit (never alerts), the other falls to default 0.0
    rows = [(k, float(base + i), 100.0)
            for i in range(10) for k in (16909060, 42)]
    src = tmp_path / "src"
    df = spark.createDataFrame(rows, "k long, ts double, v double") \
        .withColumn("ts", F.col("ts").cast("timestamp")).coalesce(1)
    df.write.parquet(str(src / "b0"))

    per_key = coerce_limit_keys(
        parse_limits_lines(["1.2.3.4,1e12"], 1), ["bigint"]
    )
    collected = []

    def build(stream, ckpt, out):
        alerts = mavg_alert_stream(
            stream, ["k"], "v", window_sec=30, threshold=0.0,
            back2norm_sec=5, thresholds=per_key, silent_watch=False,
        )

        def sink(d, e):
            out.extend(d.collect())

        return (
            alerts.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )

    import pyspark.sql.types as T
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("v", T.DoubleType()),
    ])

    stream = (
        spark.readStream.schema(schema).parquet(str(src / "b0"))
    )
    q = build(stream, str(tmp_path / "ckpt"), collected)
    q.awaitTermination(120)
    alerted = {r["k"] for r in collected}
    assert 42 in alerted          # default 0.0 breached
    assert 16909060 not in alerted  # per-key 1e12 honored


# ------------------------------------------------------ decoder padding

def test_final_short_record_not_dropped_as_padding():
    """A template shorter than 4 bytes must decode its final record —
    the old 'remainder < 4 is padding' check dropped it."""
    tpl = [(4, 1), (5, 1)]  # protocol + src_tos: 2-byte records
    tpl_pkt = build_v9(tpl, [], tid=302, source_id=1)
    store = TemplateStore()
    parse_packet(tpl_pkt, store, dev_ip=1)

    body = bytes([6, 0, 17, 1, 1, 2])  # three 2-byte records
    fs = struct.pack(">HH", 302, 4 + len(body)) + body
    pkt = struct.pack(">HHIIII", 9, 1, 0, 1700000000, 2, 1) + fs
    rows = parse_packet(pkt, store, dev_ip=1)
    assert [(r["protocol"], r["src_tos"]) for r in rows] == [
        (6, 0), (17, 1), (1, 2)
    ]


# -------------------------------------------------------- SQL literals

def test_sql_literal_clickhouse_dialect():
    from xenoeye_spark.streaming.fwm_stream import _sql_literal

    assert _sql_literal(b"\x00\x11\x22") == "'\\x001122'"          # PG bytea
    assert _sql_literal(b"\x00\x11\x22", "clickhouse") == "unhex('001122')"
    assert _sql_literal("a\\b", "clickhouse") == "'a\\\\b'"
    assert _sql_literal("a\\b") == "'a\\b'"
    assert _sql_literal("o'x", "clickhouse") == "'o''x'"


# ------------------------------------------------- classification wiring

def test_engine_classification_writes_class_db(spark, tmp_path):
    """The daemon's classification query persists the filesystem class
    DB (clsf/<mo>/<id>/<class>/{name,stats}) and a user rename in the
    `name` file wins on the next cycle (classification.c parity)."""
    from xenoeye_spark.engine import Engine

    root = tmp_path / "modir" / "border"
    root.mkdir(parents=True)
    (root / "mo.conf").write_text("""
{
  "filter": "",
  "classification": [ {"fields": ["src host"], "val": "octets desc",
                       "top-percents": 99, "time": 1} ]
}
""")
    src_dir = tmp_path / "flows"
    rows = [(1_700_000_000 + i, 0x0A000001, 1000 + i) for i in range(5)]
    df = spark.createDataFrame(
        rows, "ts long, ip4_src_addr long, in_bytes long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.coalesce(1).write.parquet(str(src_dir))

    eng = Engine(
        str(tmp_path / "modir"),
        exp_dir=str(tmp_path / "exp"),
        state_dir=str(tmp_path / "state"),
        checkpoint_root=str(tmp_path / "ckpt"),
        run_scripts=False,
        silent_watch=False,
    )
    stream = spark.readStream.schema(df.schema).parquet(str(src_dir))
    [(qname, make)] = eng.builders(stream)
    assert qname == "border.clsf.0"
    q = make().trigger(availableNow=True).start()
    q.awaitTermination(60)

    class_dirs = glob.glob(
        str(tmp_path / "state" / "clsf" / "border" / "0" / "*")
    )
    assert class_dirs, "class DB directory not written"
    d = class_dirs[0]
    assert os.path.isfile(os.path.join(d, "name"))
    assert os.path.isfile(os.path.join(d, "stats"))


# ------------------------------------------------------- geoip round 2

def test_csv_asn_is_numeric_through_lookup_expr(spark, tmp_path):
    """CSV-loaded AS db must survive lookup_expr's LongType UDF — string
    asn values made the Arrow conversion throw on the first hit."""
    import numpy as np

    from xenoeye_spark.enrich.geoip import load_geodb_dir

    (tmp_path / "as4.csv").write_text("cidr,asn,asd\n10.0.0.0/8,64512,X\n")
    _, asdb = load_geodb_dir(str(tmp_path))
    df = spark.createDataFrame([(0x0A000001,), (0x7F000001,)], "ip long")
    got = {r.ip: r.a for r in df.select(
        "ip", asdb.lookup_expr("asn", F.col("ip")).alias("a")
    ).collect()}
    assert got == {0x0A000001: 64512, 0x7F000001: 0}


def test_geo_fn_dispatches_v6_columns(spark):
    """country(src host6) must reach the v6 LPM: the v4 path casts the
    BinaryType(16) column to long and fails analysis."""
    import ipaddress

    from xenoeye_spark.dsl.compiler import FilterContext, compile_filter
    from xenoeye_spark.enrich.geoip import GeoDB, make_geo_fn

    db = GeoDB([("2001:db8::/32", {"country": "XX"})])
    ctx = FilterContext(geo_fn=make_geo_fn(db, db))
    pred = compile_filter("country(src host6) 'XX'", ctx)
    df = spark.createDataFrame(
        [(ipaddress.IPv6Address("2001:db8::1").packed,),
         (ipaddress.IPv6Address("fe80::1").packed,)],
        "ip6_src_addr binary",
    )
    got = [r[0] for r in df.select(pred).collect()]
    assert got == [True, False]


# ----------------------------------------------------- bridge uniqueness

def test_bridge_spool_names_unique_across_instances(tmp_path):
    """Two bridges sharing one spool (several ports) and a restarted
    bridge (seq resets) must never produce colliding parquet names."""
    from xenoeye_spark.sources.udp_bridge import UdpBridge

    names = set()
    for _ in range(3):
        b = UdpBridge(str(tmp_path), host="127.0.0.1", port=0)
        b._flush([(b"x", 1, 1.0)])
        b.sock.close()
        new = {f for f in os.listdir(tmp_path) if f.endswith(".parquet")}
        added = new - names
        assert len(added) == 1, "flush must create exactly one new file"
        names = new
    assert len(names) == 3


# ---------------------------------------------------- prefix validation

def test_bad_prefix_lengths_rejected():
    from xenoeye_spark.dsl.compiler import (
        CompileError, FilterContext, compile_filter,
    )

    for flt in ("src net 10.0.0.0/33", "src net6 ::1/129",
                "src net6 ::1/200"):
        try:
            compile_filter(flt, FilterContext())
            raise AssertionError(f"{flt!r} must not compile")
        except CompileError:
            pass


# ------------------------------------------------- notif path traversal

def test_notification_path_cannot_escape_dir(tmp_path):
    from xenoeye_spark.streaming.act import AlertActionSink

    sink = AlertActionSink(
        mo_name="mo", mavg_name="m", limit_name="hi", key_cols=["a", "b"],
        notif_dir=str(tmp_path), run_scripts=False,
    )
    p = sink._notif_path(["../../etc/passwd", "x/y"])
    assert os.path.realpath(p).startswith(os.path.realpath(str(tmp_path)))
    assert "/.." not in p and not os.path.basename(p).startswith("..")
