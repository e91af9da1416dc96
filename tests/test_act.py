"""Alert action sink, ext-window gating, mavg dump, classification naming
and class-DB rename semantics."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from xenoeye_spark.operators.classify import (
    ClassDB,
    class_name_expr,
    default_class_names,
)
from xenoeye_spark.streaming.act import AlertActionSink, ExtGate, write_mavg_dump


def _alert_df(spark, rows):
    return spark.createDataFrame(
        rows, "k string, event string, rate double, threshold double, ts_ns long"
    )


def test_alert_sink_notification_lifecycle(spark, tmp_path):
    """act.c:230-327: file on NEW, refreshed on UPDATE, deleted on GONE."""
    notif = str(tmp_path / "notif")
    gate = ExtGate(str(tmp_path / "ext"))
    sink = AlertActionSink(
        "mo1", "m1", "lim1", ["k"], notif, ext=["mo1/ext"], ext_gate=gate,
        run_scripts=False,
    )
    sink.process_batch(_alert_df(spark, [("1.2.3.4", "NEW", 99.0, 50.0, 1)]), 0)
    path = os.path.join(notif, "mo1-m1-lim1-1.2.3.4")
    assert os.path.exists(path)
    assert "99.0 50.0" in open(path).read()
    assert gate.is_active("mo1/ext")  # extended window activated

    sink.process_batch(_alert_df(spark, [("1.2.3.4", "UPDATE", 80.0, 50.0, 2)]), 1)
    assert "80.0" in open(path).read()

    sink.process_batch(_alert_df(spark, [("1.2.3.4", "GONE", 1.0, 50.0, 3)]), 2)
    assert not os.path.exists(path)
    assert not gate.is_active("mo1/ext")


def test_alert_sink_runs_action_script(spark, tmp_path):
    """act.c:120-189 argv contract: mo mavg limit file key... value thr."""
    out_file = tmp_path / "argv.txt"
    script = tmp_path / "act.sh"
    script.write_text(f"#!/bin/sh\necho \"$@\" > {out_file}\n")
    script.chmod(0o755)
    sink = AlertActionSink(
        "mo1", "m1", "lim1", ["k"], str(tmp_path / "notif"),
        action_script=str(script),
    )
    sink.process_batch(_alert_df(spark, [("10.0.0.9", "NEW", 123.5, 100.0, 1)]), 0)
    import time
    for _ in range(50):
        if out_file.exists() and out_file.read_text().strip():
            break
        time.sleep(0.1)
    argv = out_file.read_text().split()
    assert argv[0] == "mo1" and argv[1] == "m1" and argv[2] == "lim1"
    assert argv[4] == "10.0.0.9"
    assert argv[5] == "123.5" and argv[6] == "100.0"


def test_mavg_dump_format(spark, tmp_path):
    rates = spark.createDataFrame(
        [("b", 2.5), ("a", 1.25)], "k string, rate double"
    )
    path = str(tmp_path / "dump")
    write_mavg_dump(rates, path, ["k"], "mo1", "m1")
    lines = open(path).read().splitlines()
    assert lines[0].startswith("#")
    assert lines[1] == "a 1.250000"
    assert lines[2] == "b 2.500000"


def test_class_name_expr(spark):
    df = spark.createDataFrame([(6, 443, 0x12), (17, 9999, 0)],
                               "proto long, port long, fl long")
    out = df.select(
        class_name_expr("proto", F.col("proto")).alias("p"),
        class_name_expr("src port", F.col("port")).alias("s"),
        class_name_expr("tcp-flags", F.col("fl")).alias("f"),
    ).collect()
    assert out[0]["p"] == "tcp" and out[1]["p"] == "udp"
    assert out[0]["s"] == "https (443)" and out[1]["s"] == "9999"
    assert out[0]["f"] == "ACK+SYN" and out[1]["f"] == ""


def test_default_class_names_join(spark):
    model = spark.createDataFrame([(6, 80)], "proto long, dport long")
    out = default_class_names(model, ["proto", "dport"]).collect()
    # dport matched by 'port' heuristic -> service name
    assert out[0]["class_name"] == "tcp+http (80)"


def test_classdb_rename_wins(tmp_path):
    """CONFIG.md:428-435: user edits to name files survive re-cycles."""
    db = ClassDB(str(tmp_path), "mo1", 0)
    db.write_cycle([("tcp_https", "tcp+https (443)", 1000.0)])
    assert db.load_names()["tcp_https"] == "tcp+https (443)"
    # user renames
    with open(os.path.join(db.dir, "tcp_https", "name"), "w") as fh:
        fh.write("web traffic")
    db.write_cycle([("tcp_https", "tcp+https (443)", 2000.0)])
    assert db.load_names()["tcp_https"] == "web traffic"
    assert open(os.path.join(db.dir, "tcp_https", "stats")).read().strip() == "2000.0"
