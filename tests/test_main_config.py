"""Global xenoeye.conf model tests: the reference CONFIG.md's own sample
must parse, and the ch-codec option must reach ClickHouse export DDL."""

from __future__ import annotations

from xenoeye_spark.config.main import XenoeyeConfig
from xenoeye_spark.streaming.fwm_stream import fwm_sql_export

SAMPLE = """
{
    "capture": [
        {"socket": {"listen-on": "*", "port": "2055"}},
        {"pcap" : {"interface": "eth0", "filter": "udp and port 2055"}}
    ],

    "sflow-capture": [
        {"socket": {"listen-on": "*", "port": "6343"}}
    ],

    "templates": {
        "db": "/var/lib/xenoeye/templates.tkvdb"
    },

    "debug": {
        /* allowed values: "none", "syslog", "/path/to/file.txt" */
        "dump-flows": "none"
    },

    "devices": "/etc/xenoeye/devices.conf",
    "mo-dir": "/var/lib/xenoeye/mo",
    "geodb": "/var/lib/xenoeye/geoip",
    "db-type": "clickhouse",
    "db-export": "/var/lib/xenoeye/scripts/xe-dbexport-pg.sh",
    "ch-codec": "ZSTD(1)"
}
"""


def test_reference_sample_parses(tmp_path):
    p = tmp_path / "xenoeye.conf"
    p.write_text(SAMPLE)
    cfg = XenoeyeConfig.from_file(str(p))
    assert [e.kind for e in cfg.capture] == ["socket", "pcap"]
    assert cfg.capture[0].port == 2055
    assert cfg.capture[1].bpf == "udp and port 2055"
    assert cfg.socket_ports() == [2055, 6343]
    assert cfg.templates_db == "/var/lib/xenoeye/templates.tkvdb"
    assert cfg.mo_dir == "/var/lib/xenoeye/mo"
    assert cfg.db_type == "clickhouse"
    assert cfg.ch_codec == "ZSTD(1)"


def test_build_engine_from_global_config(tmp_path):
    mo = tmp_path / "mo" / "m1"
    mo.mkdir(parents=True)
    (mo / "mo.conf").write_text('{"filter": "", "fwm": []}')
    p = tmp_path / "xenoeye.conf"
    p.write_text('{"mo-dir": "%s", "db-type": "pg"}' % (tmp_path / "mo"))
    eng = XenoeyeConfig.from_file(str(p)).build_engine(
        exp_dir=str(tmp_path / "exp"), state_dir=str(tmp_path / "st")
    )
    assert [m.name for m in eng.mos] == ["m1"]
    assert eng.db_type == "pg"


def test_ch_codec_reaches_ddl(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 10), (2, 20)], "time bigint, octets bigint"
    )
    path = fwm_sql_export(
        df, "t1", str(tmp_path), epoch_id=1,
        db_type="clickhouse", ch_codec="ZSTD(1)",
    )
    text = open(path).read()
    assert "octets Nullable(Int64) CODEC(ZSTD(1))" in text
    assert "time Nullable(Int64)," in text  # time column: no codec
    assert "ENGINE = MergeTree" in text


def test_iplists_dir_reaches_filter_context(tmp_path):
    """An mo.conf filter naming an IP list resolves when the global
    config points at an iplists-dir (iplist.c:299-322)."""
    ipd = tmp_path / "iplists"
    ipd.mkdir()
    (ipd / "my-net").write_text("10.0.0.0/8\n# comment\n")
    mo = tmp_path / "mo" / "m1"
    mo.mkdir(parents=True)
    (mo / "mo.conf").write_text(
        '{"filter": "dst net my-net", "fwm": []}'
    )
    cfg = XenoeyeConfig.from_dict(
        {"mo-dir": str(tmp_path / "mo"), "iplists-dir": str(ipd)}
    )
    eng = cfg.build_engine(exp_dir=str(tmp_path / "e"),
                           state_dir=str(tmp_path / "s"))
    assert "my-net" in eng.ctx.iplists
    # compiling the MO's filter with the engine's ctx must succeed
    eng.mos[0].filter_column(eng.ctx)
