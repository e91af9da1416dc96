"""Offline tooling parity tests: xe_mkgeodb (CSV -> geodb dir,
xemkgeodb.c) and xe_moclone (mo-dir template cloning, xemoclone.c)."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from xe_mkgeodb import convert  # noqa: E402
from xe_moclone import clone, parse_replacements  # noqa: E402


def test_mkgeodb_ipapi_ranges(tmp_path):
    """ipapi range rows decompose into minimal CIDRs (the reference's
    split loop, xemkgeodb.c:113-185) and load into the geo trie."""
    src = tmp_path / "ipapi.csv"
    src.write_text(
        "ip_version,start_ip,end_ip,continent,country_code,country,state,"
        "city,zip,timezone,latitude,longitude,accuracy\n"
        # 10.0.0.0 - 10.0.0.255 = /24; 10.0.1.0 - 10.0.1.127 = /25
        "4,10.0.0.0,10.0.1.127,eu,es,Spain,Madrid,Madrid,28001,CET,"
        "40.4,-3.7,50\n"
        "6,2001:db8::,2001:db8::ffff:ffff:ffff:ffff:ffff,as,jp,Japan,,,"
        ",JST,35.6,139.7,100\n"
    )
    out = tmp_path / "geodb"
    counts = convert([str(src)], "geo", str(out))
    assert counts["rows"] >= 3
    from xenoeye_spark.enrich.geoip import load_geodb_dir
    geo, asdb = load_geodb_dir(str(out))
    assert asdb is None
    assert geo.lookup_np(np.array([0x0A000001]), "country", "?")[0] == "Spain"
    assert geo.lookup_np(np.array([0x0A000180]), "country", "?")[0] == "?"
    assert geo.lookup_np(np.array([0x0A000140]), "city", "?")[0] == "Madrid"


def test_mkgeodb_rkn_join_and_order(tmp_path):
    """RKN/MaxMind Locations must precede Blocks (EXTRA.md:52); geoname
    join fills names, blocks carry zip/lat/long."""
    loc = tmp_path / "loc.csv"
    loc.write_text(
        "geoname_id,locale_code,continent_code,continent_name,"
        "country_iso_code,country_name,subdivision_1_iso_code,"
        "subdivision_1_name,subdivision_2_iso_code,subdivision_2_name,"
        "city_name,metro_code,time_zone,is_in_european_union\n"
        "123,en,EU,Europe,DE,Germany,BE,Berlin,,,Berlin,,CET,1\n"
    )
    blocks = tmp_path / "blk.csv"
    blocks.write_text(
        "network,geoname_id,registered_country_geoname_id,"
        "represented_country_geoname_id,is_anonymous_proxy,"
        "is_satellite_provider,postal_code,latitude,longitude,"
        "accuracy_radius,is_anycast\n"
        "172.16.0.0/12,123,123,,0,0,10115,52.5,13.4,20,0\n"
    )
    out = tmp_path / "geodb"
    convert([str(loc), str(blocks)], "geo", str(out))
    from xenoeye_spark.enrich.geoip import load_geodb_dir
    geo, _ = load_geodb_dir(str(out))
    assert geo.lookup_np(np.array([0xAC100101]), "country", "?")[0] == "Germany"
    assert geo.lookup_np(np.array([0xAC100101]), "zip", "?")[0] == "10115"

    with pytest.raises(SystemExit, match="Locations"):
        convert([str(blocks)], "geo", str(tmp_path / "x"))


def test_mkgeodb_as_formats(tmp_path):
    """AS dbs: RKN header form and sapics headerless range form both
    land in as4/as6.csv and resolve via the AS trie."""
    rkn = tmp_path / "as_rkn.csv"
    rkn.write_text(
        "network,autonomous_system_number,autonomous_system_organization\n"
        "10.0.0.0/8,64512,Example Org\n"
    )
    sapics = tmp_path / "asn-ipv4.csv"
    sapics.write_text("192.0.2.0,192.0.2.255,65000,Doc Net\n")
    out = tmp_path / "geodb"
    convert([str(rkn), str(sapics)], "as", str(out))
    from xenoeye_spark.enrich.geoip import load_geodb_dir
    geo, asdb = load_geodb_dir(str(out))
    assert geo is None
    assert asdb.lookup_np(np.array([0x0A0A0A0A]), "asd", "?")[0] == "Example Org"
    # asn normalizes to int at GeoDB build (LongType UDF contract)
    assert asdb.lookup_np(np.array([0xC0000201]), "asn", 0)[0] == 65000


def test_moclone_template_semantics(tmp_path):
    """xemoclone.c parity (conf_process/line_process): the //!tmpl line
    is PRESERVED, the substituted line replaces the NEXT line, unknown
    macros warn-and-skip, ordinary ${...} is data."""
    src = tmp_path / "tmpl"
    (src / "border").mkdir(parents=True)
    (src / "border" / "mo.conf").write_text(
        '{\n'
        '//!tmpl  "filter": "dst net ${NET}",\n'
        '  "filter": "dst net 10.0.0.0/8",\n'
        '  "script": "echo ${literal}"\n'
        '}\n'
    )
    dst = tmp_path / "out"
    clone(str(src), str(dst), parse_replacements("NET=192.168.0.0/16"))
    text = (dst / "border" / "mo.conf").read_text()
    # template line survives (clone is re-clonable), substitution
    # replaces the stale value line
    assert '//!tmpl  "filter": "dst net ${NET}",' in text
    assert '"dst net 192.168.0.0/16"' in text
    assert '"dst net 10.0.0.0/8"' not in text
    # non-template ${...} copied verbatim, never an error
    assert 'echo ${literal}' in text

    # unknown macro in a template: WARN + keep the old value line
    (src / "border" / "mo.conf").write_text(
        '//!tmpl  "x": "${NOPE}",\n'
        '  "x": "old",\n'
    )
    dst2 = tmp_path / "out2"
    clone(str(src), str(dst2), {})
    t2 = (dst2 / "border" / "mo.conf").read_text()
    assert '"x": "old",' in t2 and '"${NOPE}"' in t2

    with pytest.raises(SystemExit, match="malformed"):
        parse_replacements("NOVALUE")


def test_moclone_preserves_bytes(tmp_path):
    """Non-UTF-8 content and CRLF endings survive byte-identically
    (reference copies raw bytes)."""
    src = tmp_path / "t"
    src.mkdir()
    blob = b"caf\xe9 latin-1\r\nsecond\r\n\x00\xff"
    (src / "notes.bin").write_bytes(blob)
    dst = tmp_path / "o"
    clone(str(src), str(dst), {})
    assert (dst / "notes.bin").read_bytes() == blob


def test_moclone_first_occurrence_and_malformed(tmp_path, capsys):
    """str_replace parity (xemoclone.c:51-70): each macro substitutes its
    FIRST occurrence only, so a repeated macro leaves '${...}' behind and
    the template warns-and-skips; an unclosed '${' is a malformed-macro
    warn-and-skip."""
    src = tmp_path / "t"
    src.mkdir()
    (src / "a.conf").write_text(
        '//!tmpl  "pair": "${NET} and ${NET}",\n'
        '  "pair": "old1",\n'
        '//!tmpl  "bad": "${OOPS",\n'
        '  "bad": "old2",\n'
        '//!tmpl  "ok": "${NET}",\n'
        '  "ok": "old3",\n'
    )
    dst = tmp_path / "o"
    clone(str(src), str(dst), parse_replacements("NET=n1"))
    text = (dst / "a.conf").read_text()
    err = capsys.readouterr().err
    # repeated macro: first occurrence WAS substituted in the attempted
    # line, but the leftover second occurrence skips the template —
    # the stale value line survives
    assert '"pair": "old1",' in text and '"n1 and n1"' not in text
    assert "macro ${NET} is not in replacements list" in err
    # malformed macro: warn + skip
    assert '"bad": "old2",' in text
    assert "malformed macro" in err
    # healthy template still substitutes and consumes the stale line
    assert '"ok": "n1",' in text and '"ok": "old3",' not in text
