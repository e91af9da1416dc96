"""Live AF_PACKET capture (pcapture.c parity): the BPF-subset filter
parser, and an end-to-end sniff on loopback — datagram in, spool row
out, decoded flow fields correct — shared-shape with the UDP bridge.
The e2e tests skip where AF_PACKET or CAP_NET_RAW is unavailable."""

from __future__ import annotations

import os
import socket
import struct
import time

import pytest
from pyspark.sql import functions as F

from xenoeye_spark.sources.live import LiveCapture, parse_bpf_ports
from tests.test_sources import build_v5


def test_parse_bpf_ports_subset():
    assert parse_bpf_ports("") is None
    assert parse_bpf_ports("udp") is None
    assert parse_bpf_ports("port 2055") == {2055}
    assert parse_bpf_ports("udp and port 2055") == {2055}
    assert parse_bpf_ports("port 2055 or port 6343") == {2055, 6343}
    assert parse_bpf_ports("udp and dst port 9") == {9}
    for bad in ("host 1.2.3.4", "tcp and port 1", "port x",
                "udp and", "not port 5", "port 1 port 2"):
        with pytest.raises(ValueError, match="BPF"):
            parse_bpf_ports(bad)


def _try_live(tmp_path, **kw):
    """LiveCapture on loopback, or skip where the runtime forbids it."""
    if not hasattr(socket, "AF_PACKET"):
        pytest.skip("AF_PACKET unavailable (non-Linux)")
    try:
        return LiveCapture(str(tmp_path / "spool"), "lo", **kw)
    except PermissionError:
        pytest.skip("CAP_NET_RAW unavailable")


def test_live_capture_end_to_end(spark, tmp_path):
    """Sniff loopback with a port filter: the matching NetFlow v5
    datagram lands in the spool with the sender's address as dev_ip and
    decodes to the right flow; the decoy on another port and all
    non-UDP loopback chatter (Spark's own TCP) are filtered out."""
    cap = _try_live(tmp_path, ports={40251}, roll_seconds=0.3)
    cap.start()
    try:
        pkt = build_v5([dict(src=0x0A000001, dst=0x0A000002, pkts=2,
                             octets=200, sport=1000, dport=80, proto=6)])
        u = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        deadline = time.time() + 30
        spool = str(tmp_path / "spool")
        # resend periodically until a roll lands: loopback delivery is
        # reliable but the capture thread may still be binding
        while time.time() < deadline:
            u.sendto(pkt, ("127.0.0.1", 40251))
            u.sendto(b"decoy-not-captured", ("127.0.0.1", 40252))
            time.sleep(0.4)
            if any(f.endswith(".parquet") for f in os.listdir(spool)):
                break
        else:
            pytest.fail("no spool file appeared within the deadline")
        time.sleep(0.5)  # let the roll finish
    finally:
        cap.stop()

    rows = spark.read.parquet(str(tmp_path / "spool")).collect()
    assert rows, "spool empty after capture"
    loopback = struct.unpack(">I", socket.inet_aton("127.0.0.1"))[0]
    assert all(bytes(r.data) == pkt for r in rows)
    assert all(r.dev_ip == loopback for r in rows)

    from xenoeye_spark.sources.netflow import decode_packets_df

    flows = decode_packets_df(
        spark.read.parquet(str(tmp_path / "spool"))
    ).select("ip4_src_addr", "in_bytes", "protocol").collect()
    assert flows and all(
        (f.ip4_src_addr, f.in_bytes, f.protocol) == (0x0A000001, 200, 6)
        for f in flows
    )


def test_live_capture_rejects_missing_interface(tmp_path):
    if not hasattr(socket, "AF_PACKET"):
        pytest.skip("AF_PACKET unavailable (non-Linux)")
    try:
        with pytest.raises(OSError):
            LiveCapture(str(tmp_path / "s"), "no-such-iface-xyz")
    except PermissionError:
        pytest.skip("CAP_NET_RAW unavailable")


def test_daemon_starts_live_capture_for_nic_entries(tmp_path):
    """start_live_captures wires a pcap config entry naming a NIC to a
    running LiveCapture (and skips file-glob entries, which the replay
    path owns); unsupported BPF is a loud skip, not a crash."""
    if not hasattr(socket, "AF_PACKET"):
        pytest.skip("AF_PACKET unavailable (non-Linux)")
    from xenoeye_spark.__main__ import start_live_captures
    from xenoeye_spark.config.main import CaptureEntry

    entries = [
        CaptureEntry(kind="pcap", interface="lo",
                     bpf="udp and port 40253"),
        CaptureEntry(kind="pcap", interface="lo",
                     bpf="host 1.2.3.4"),          # unsupported: skipped
        CaptureEntry(kind="socket", port=1),       # not a pcap entry
    ]
    try:
        caps = start_live_captures(entries, str(tmp_path / "spool"))
    except PermissionError:
        pytest.skip("CAP_NET_RAW unavailable")
    if not caps:
        pytest.skip("CAP_NET_RAW unavailable (live start refused)")
    try:
        assert len(caps) == 1
        assert caps[0].interface == "lo" and caps[0].ports == {40253}
    finally:
        for c in caps:
            c.stop()
