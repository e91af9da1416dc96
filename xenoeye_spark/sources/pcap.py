"""Offline pcap reader — the pcapture parity path, no libpcap needed.

The reference captures live via libpcap with a BPF filter per interface
(`pcapture.c`, config `xenoeye.c:180-201`) and was benchmarked by
replaying recorded pcaps with tcpreplay (`README.md:35-51`). This module
covers the same data path for Spark: classic pcap files are a 24-byte
global header + [16-byte record header + frame]* — pure struct parsing —
and each frame's UDP payload feeds the NetFlow/IPFIX/sFlow decoders
(`sources/netflow.py`, `sources/sflow.py`).

Distributed shape: a single pcap file is inherently sequential (records
are length-prefixed with no resync markers), so the unit of parallelism
is the FILE: `spark.read.format("binaryFile")` yields (path, content)
rows and decoding runs per file inside ``mapInPandas``. Capture should
roll output into many files (as the UDP bridge does); partition count
then follows file count, which is exactly how the reference shards
routers across capture sockets (STEP-BY-STEP.md:138-156).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

_MAGIC_USEC = 0xA1B2C3D4
_MAGIC_NSEC = 0xA1B23C4D
_LINKTYPE_ETHERNET = 1


def iter_pcap(buf: bytes) -> Iterator[tuple[float, bytes]]:
    """Yield (timestamp_seconds, frame_bytes) from classic-pcap bytes.

    Handles both byte orders and the nanosecond magic. Truncated trailing
    records are skipped (a live capture cut mid-record is normal).
    """
    if len(buf) < 24:
        return
    magic = struct.unpack_from(">I", buf, 0)[0]
    if magic in (_MAGIC_USEC, _MAGIC_NSEC):
        endian = ">"
    else:
        magic = struct.unpack_from("<I", buf, 0)[0]
        if magic not in (_MAGIC_USEC, _MAGIC_NSEC):
            raise ValueError("not a classic pcap file (bad magic)")
        endian = "<"
    frac_div = 1e9 if magic == _MAGIC_NSEC else 1e6
    linktype = struct.unpack_from(endian + "I", buf, 20)[0]
    if linktype != _LINKTYPE_ETHERNET:
        raise ValueError(f"unsupported linktype {linktype} (Ethernet only)")
    off = 24
    n = len(buf)
    while off + 16 <= n:
        ts_sec, ts_frac, incl_len, _orig = struct.unpack_from(
            endian + "IIII", buf, off
        )
        off += 16
        if off + incl_len > n:
            break
        yield ts_sec + ts_frac / frac_div, buf[off : off + incl_len]
        off += incl_len


def udp_from_frame(frame: bytes) -> tuple[int, int, int, int, bytes] | None:
    """Ethernet(+VLAN/QinQ) -> IPv4/IPv6 -> UDP; returns
    (src_ip_v4_or_0, dst_ip_v4_or_0, sport, dport, payload) or None for
    non-UDP / fragments / truncated frames. IPv6 addresses report 0 here
    (dev identity for v6 exporters comes from config, like dev_ip6)."""
    if len(frame) < 14:
        return None
    off = 12
    etype = struct.unpack_from(">H", frame, off)[0]
    off += 2
    while etype in (0x8100, 0x88A8, 0x9100) and off + 4 <= len(frame):
        etype = struct.unpack_from(">H", frame, off + 2)[0]
        off += 4
    if etype == 0x0800:
        if off + 20 > len(frame):
            return None
        vihl = frame[off]
        if vihl >> 4 != 4:
            return None
        ihl = (vihl & 0xF) * 4
        proto = frame[off + 9]
        frag = struct.unpack_from(">H", frame, off + 6)[0]
        if frag & 0x1FFF:  # non-first fragment: no UDP header present
            return None
        src, dst = struct.unpack_from(">II", frame, off + 12)
        off += ihl
    elif etype == 0x86DD:
        if off + 40 > len(frame):
            return None
        proto = frame[off + 6]
        src = dst = 0
        off += 40
    else:
        return None
    if proto != 17 or off + 8 > len(frame):
        return None
    sport, dport, ulen = struct.unpack_from(">HHH", frame, off)[0:3]
    payload = frame[off + 8 : off + max(ulen, 8)]
    return src, dst, sport, dport, payload


def pcap_packets_df(
    spark: SparkSession,
    path_glob: str,
    ports: set[int] | None = None,
) -> DataFrame:
    """pcap files -> (data binary, dev_ip long, recv_ts timestamp) rows,
    one per UDP datagram — the same shape the UDP bridge produces, ready
    for ``decode_packets_df``/``parse_sflow``. ``ports`` filters on
    destination port (the BPF-prefilter role, pcapture.c's filter arg)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path_glob)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for ts, frame in iter_pcap(bytes(content)):
                    got = udp_from_frame(frame)
                    if got is None:
                        continue
                    src, _dst, _sport, dport, payload = got
                    if ports is not None and dport not in ports:
                        continue
                    rows.append(
                        (payload, src, pd.Timestamp(ts, unit="s"))
                    )
            if rows:
                yield pd.DataFrame(
                    rows, columns=["data", "dev_ip", "recv_ts"]
                )

    return files.select("content").mapInPandas(
        extract, schema="data binary, dev_ip long, recv_ts timestamp"
    )


def pcap_flows_df(
    spark: SparkSession,
    path_glob: str,
    ports: set[int] | None = None,
    seed_templates: list | None = None,
) -> DataFrame:
    """pcap replay end-to-end: files -> UDP payloads -> decoded flow rows
    (catalog schema). Repartitions by dev_ip AND sorts each partition by
    capture time: hash co-location alone does not order shuffle blocks
    from different source FILES, so a device whose template announcement
    sits in an earlier file than its data (the normal rolled-capture
    layout) could reach the decoder's fresh template store data-first —
    nondeterministically dropping those flows. Capture-time order
    restores announcement-before-data within each device."""
    from xenoeye_spark.sources.netflow import decode_packets_df

    pkts = pcap_packets_df(spark, path_glob, ports)
    return decode_packets_df(
        pkts.repartition("dev_ip").sortWithinPartitions("dev_ip", "recv_ts"),
        seed_templates=seed_templates,
    )
