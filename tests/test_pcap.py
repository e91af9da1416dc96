"""pcap reader tests: classic-pcap bytes built from the public file format
(24-byte global header + 16-byte record headers), frames wrapping NetFlow
v5 export datagrams, decoded end-to-end through the Spark path."""

from __future__ import annotations

import struct

import pytest

from xenoeye_spark.sources.pcap import (
    iter_pcap,
    pcap_flows_df,
    udp_from_frame,
)
from tests.test_sources import build_v5


def build_eth_ipv4_udp(src, dst, sport, dport, payload, vlan=None):
    eth = bytes(6) + bytes(6)
    if vlan is not None:
        eth += struct.pack(">HH", 0x8100, vlan)
    eth += struct.pack(">H", 0x0800)
    udp = struct.pack(">HHHH", sport, dport, 8 + len(payload), 0) + payload
    ip = struct.pack(
        ">BBHHHBBHII", 0x45, 0, 20 + len(udp), 1, 0, 64, 17, 0, src, dst
    )
    return eth + ip + udp


def build_pcap(frames_with_ts, nanos=False, little=True):
    magic = 0xA1B23C4D if nanos else 0xA1B2C3D4
    e = "<" if little else ">"
    out = struct.pack(e + "IHHiIII", magic, 2, 4, 0, 0, 65535, 1)
    mul = 1_000_000_000 if nanos else 1_000_000
    for ts, frame in frames_with_ts:
        sec = int(ts)
        frac = int(round((ts - sec) * mul))
        out += struct.pack(e + "IIII", sec, frac, len(frame), len(frame))
        out += frame
    return out


def test_iter_pcap_both_endians_and_precisions():
    f1 = build_eth_ipv4_udp(0x0A000001, 0x0A000002, 40000, 2055, b"hello")
    f2 = build_eth_ipv4_udp(0x0A000003, 0x0A000002, 40001, 2055, b"world")
    for nanos in (False, True):
        for little in (False, True):
            buf = build_pcap([(1700000000.5, f1), (1700000001.25, f2)],
                             nanos=nanos, little=little)
            got = list(iter_pcap(buf))
            assert [f for _, f in got] == [f1, f2]
            assert got[0][0] == pytest.approx(1700000000.5)
            assert got[1][0] == pytest.approx(1700000001.25)


def test_iter_pcap_truncated_tail_skipped():
    f1 = build_eth_ipv4_udp(1, 2, 1000, 2055, b"ok")
    buf = build_pcap([(10.0, f1)]) + struct.pack("<IIII", 11, 0, 100, 100) + b"\x00" * 10
    assert len(list(iter_pcap(buf))) == 1


def test_iter_pcap_rejects_garbage():
    with pytest.raises(ValueError):
        list(iter_pcap(b"\x00" * 64))


def test_udp_from_frame_vlan_and_fragments():
    pl = b"payload"
    frame = build_eth_ipv4_udp(0x01020304, 0x05060708, 9, 2055, pl, vlan=42)
    src, dst, sport, dport, payload = udp_from_frame(frame)
    assert (src, dst, sport, dport, payload) == (
        0x01020304, 0x05060708, 9, 2055, pl,
    )
    # non-first fragment: frag offset != 0 -> skipped
    frag = bytearray(build_eth_ipv4_udp(1, 2, 3, 4, pl))
    struct.pack_into(">H", frag, 14 + 6, 0x0010)
    assert udp_from_frame(bytes(frag)) is None
    # TCP frame from the sibling builder is not UDP
    from tests.test_sources import build_eth_ipv4_tcp

    assert udp_from_frame(build_eth_ipv4_tcp(1, 2, 3, 4)) is None


def test_pcap_flows_df_end_to_end(spark, tmp_path):
    v5 = build_v5(
        [
            {"src": 0x0A000001, "dst": 0x0A000002, "pkts": 3, "octets": 300,
             "sport": 1234, "dport": 80, "proto": 6},
            {"src": 0x0A000003, "dst": 0x0A000004, "pkts": 1, "octets": 40,
             "sport": 53, "dport": 5353, "proto": 17},
        ]
    )
    exporter = 0xC0A80001
    frame = build_eth_ipv4_udp(exporter, 0x0A0000FE, 30000, 2055, v5)
    noise = build_eth_ipv4_udp(exporter, 0x0A0000FE, 30000, 9999, b"x" * 20)
    path = tmp_path / "cap.pcap"
    path.write_bytes(build_pcap([(1700000000.0, frame), (1700000000.1, noise)]))

    flows = pcap_flows_df(spark, str(path), ports={2055})
    rows = {r["ip4_src_addr"]: r for r in flows.collect()}
    assert set(rows) == {0x0A000001, 0x0A000003}
    r = rows[0x0A000001]
    assert r["in_bytes"] == 300 and r["l4_dst_port"] == 80
    assert r["dev_ip"] == exporter


def test_daemon_pcap_capture_replay(spark, tmp_path):
    """A pcap capture entry whose interface is a file path replays its
    datagrams into the bridge spool (the reference runs libpcap live,
    pcapture.c; offline replay is this runtime's equivalent), honoring
    the BPF filter's port term."""
    from xenoeye_spark.__main__ import spool_pcap_captures
    from xenoeye_spark.config.main import CaptureEntry
    from xenoeye_spark.sources.netflow import decode_packets_df

    v5 = build_v5([dict(src=0x0A000001, dst=0x0A000002, pkts=4, octets=400,
                        sport=9, dport=10, proto=6)])
    f_match = build_eth_ipv4_udp(0x0A000001, 0x7F000001, 5000, 2055, v5)
    f_other = build_eth_ipv4_udp(0x0A000001, 0x7F000001, 5000, 9999, v5)
    pcap_path = tmp_path / "cap.pcap"
    pcap_path.write_bytes(build_pcap([(10.0, f_match), (11.0, f_other)]))
    spool = tmp_path / "spool"
    spool.mkdir()

    entries = [
        CaptureEntry(kind="pcap", interface=str(pcap_path),
                     bpf="udp and port 2055"),
        CaptureEntry(kind="socket", port=2055),          # skipped here
        CaptureEntry(kind="pcap", interface=str(tmp_path / "absent.pcap")),
    ]
    assert spool_pcap_captures(spark, entries, str(spool)) == 1

    raw = spark.read.parquet(str(spool))
    assert raw.count() == 1  # port filter dropped the 9999 datagram
    flows = decode_packets_df(raw).collect()
    assert len(flows) == 1 and flows[0]["in_bytes"] == 400
