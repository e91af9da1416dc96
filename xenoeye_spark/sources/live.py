"""Live-interface packet capture — the pcapture.c parity path.

The reference sniffs NICs through libpcap with a BPF filter
(`pcapture.c`, config entries `{"pcap": {"interface": ..., "filter":
"udp and port 2055"}}`, xenoeye.c:180-201). This runtime has no
libpcap, but as a collector it only ever needs INBOUND UDP datagrams —
and Linux exposes exactly that through an ``AF_PACKET`` ``SOCK_RAW``
socket (CAP_NET_RAW), no native library required. Frames walk the same
Ethernet/VLAN/QinQ/IPv4/IPv6/UDP parser the pcap replay path uses
(`sources/pcap.py:udp_from_frame`), the BPF role is played by a strict
subset parser covering the reference's own filter shape ("udp and port
N", ports OR-able), and matching datagrams spool to the same rolling
parquet layout as the UDP bridge — so everything downstream
(``decode_packets_df``, the engine's standing queries, the template
journal) is byte-identical across the three front ends (socket bridge,
pcap replay, live capture).

Only ``PACKET_HOST`` frames are captured (traffic addressed TO this
host): that is the collector's direction, and it avoids the duplicate
OUTGOING+HOST delivery loopback would otherwise produce in tests.

Single-node by design, like scapture/pcapture and the UDP bridge: the
capture thread does recv + parse + append only; decode and everything
after runs distributed.
"""

from __future__ import annotations

import re
import socket
import sys
import threading
import time

from xenoeye_spark.sources.pcap import udp_from_frame
from xenoeye_spark.sources.udp_bridge import ParquetSpool

_ETH_P_ALL = 0x0003
_PACKET_HOST = 0


def parse_bpf_ports(expr: str) -> set[int] | None:
    """The BPF subset the reference's own config exemplifies: an
    optional ``udp`` term and any number of ``port N`` / ``dst port N``
    terms joined by and/or (the capture is UDP-only either way, so
    ``udp`` adds nothing and port terms compose as a destination-port
    set). Returns the port set, or None for match-everything. Anything
    outside the subset (hosts, nets, tcp, negation, parens) raises —
    a silently ignored filter term would capture traffic the operator
    explicitly excluded."""
    toks = [t for t in re.split(r"\s+", (expr or "").strip().lower()) if t]
    ports: set[int] = set()
    i = 0
    expect_term = True
    while i < len(toks):
        t = toks[i]
        if expect_term:
            if t == "udp":
                i += 1
            elif t in ("port", "dst") and i + 1 < len(toks):
                if t == "dst":
                    if toks[i + 1] != "port" or i + 2 >= len(toks):
                        raise ValueError(f"unsupported BPF filter: {expr!r}")
                    i += 1
                if not toks[i + 1].isdigit():
                    raise ValueError(f"unsupported BPF filter: {expr!r}")
                ports.add(int(toks[i + 1]))
                i += 2
            else:
                raise ValueError(
                    f"unsupported BPF filter: {expr!r} (supported subset: "
                    "'udp', 'port N', 'dst port N', joined by and/or)"
                )
            expect_term = False
        else:
            if t not in ("and", "or"):
                raise ValueError(f"unsupported BPF filter: {expr!r}")
            expect_term = True
            i += 1
    if expect_term and toks:
        raise ValueError(f"unsupported BPF filter: {expr!r} (dangling "
                         "and/or)")
    return ports or None


class LiveCapture:
    """Sniff one interface into the bridge spool.

    Rows are (data=UDP payload, dev_ip=IPv4 source address as long,
    recv_ts=wall clock) — the UdpBridge shape. ``ports`` (usually from
    ``parse_bpf_ports``) filters on UDP destination port. Construction
    raises PermissionError without CAP_NET_RAW and OSError for a
    missing interface — loudly, at startup, like pcap_open_live.
    """

    def __init__(
        self,
        out_dir: str,
        interface: str,
        ports: set[int] | None = None,
        roll_packets: int = 1000,
        roll_seconds: float = 1.0,
        template_journal=None,
    ):
        if not hasattr(socket, "AF_PACKET"):
            raise OSError("AF_PACKET unavailable (non-Linux runtime)")
        self.interface = interface
        self.ports = ports
        self.template_journal = template_journal
        self.sock = socket.socket(
            socket.AF_PACKET, socket.SOCK_RAW, socket.htons(_ETH_P_ALL)
        )
        try:
            self.sock.bind((interface, 0))
        except OSError:
            self.sock.close()
            raise
        self.sock.settimeout(0.2)
        self.roll_packets = roll_packets
        self.roll_seconds = roll_seconds
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._spool = ParquetSpool(out_dir, f"live_{interface}")

    def _loop(self) -> None:
        batch: list[tuple[bytes, int, float]] = []
        last = time.monotonic()
        while not self._stop.is_set():
            try:
                frame, addr = self.sock.recvfrom(65535)
                # addr = (iface, proto, pkttype, hatype, hwaddr)
                if addr[2] == _PACKET_HOST:
                    got = udp_from_frame(frame)
                    if got is not None:
                        src, _dst, _sport, dport, payload = got
                        if self.ports is None or dport in self.ports:
                            batch.append((payload, src, time.time()))
                            if self.template_journal is not None:
                                from xenoeye_spark.sources.netflow import (
                                    packet_has_templates,
                                )

                                if packet_has_templates(payload):
                                    self.template_journal.append_packet(
                                        payload, src
                                    )
            except socket.timeout:
                pass
            except OSError as e:
                # same contract as the UDP bridge: a socket hiccup must
                # not kill the capture thread silently
                print(f"live_capture {self.interface}: dropped frame: {e}",
                      file=sys.stderr)
            now = time.monotonic()
            if batch and (
                len(batch) >= self.roll_packets
                or now - last >= self.roll_seconds
            ):
                try:
                    self._spool.flush(batch)
                    batch = []
                except OSError as e:
                    # transient write failure: retry next roll, shed
                    # oldest past 10 rolls (UdpBridge's bound — the
                    # kernel ring would drop the same frames earlier)
                    cap = 10 * self.roll_packets
                    if len(batch) > cap:
                        del batch[: len(batch) - cap]
                    print(
                        f"live_capture {self.interface}: flush failed "
                        f"({e}); retrying next roll",
                        file=sys.stderr,
                    )
                last = now
        try:
            self._spool.flush(batch)
        except OSError:
            pass

    def start(self) -> "LiveCapture":
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)
        self.sock.close()
