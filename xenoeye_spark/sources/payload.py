"""Payload parsers: DNS responses and TLS ClientHello SNI.

Parity targets (SURVEY.md §2.1): the reference lazily parses sFlow payload
bytes into ``dns_name``/``dns_ips`` (xe-dns.h:18-207) and ``sni``
(xe-sni.h:36-145). Implemented from the public wire formats (DNS: RFC 1035,
TLS: RFC 8446 §4.1.2 + RFC 6066 §3); exposed both as plain functions and
as Arrow pandas UDF column builders.
"""

from __future__ import annotations

import struct

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ------------------------------------------------------------------ DNS

def _read_name(data: bytes, off: int, depth: int = 0) -> tuple[str, int]:
    """DNS name with compression pointers (RFC 1035 §4.1.4)."""
    labels = []
    while off < len(data):
        ln = data[off]
        if ln == 0:
            off += 1
            break
        if ln & 0xC0 == 0xC0:  # compression pointer
            if off + 2 > len(data) or depth > 8:
                return "", off + 2
            ptr = struct.unpack_from(">H", data, off)[0] & 0x3FFF
            tail, _ = _read_name(data, ptr, depth + 1)
            if tail:
                labels.append(tail)
            off += 2
            break
        off += 1
        labels.append(data[off:off + ln].decode("ascii", "replace"))
        off += ln
    return ".".join(labels), off


def parse_dns_response(payload: bytes) -> tuple[str | None, list[str]]:
    """(queried name, [answer IPs]) from a DNS response; (None, []) if not
    a parsable response with answers."""
    if len(payload) < 12:
        return None, []
    (_tid, flags, qd, an, _ns, _ar) = struct.unpack_from(">HHHHHH", payload, 0)
    if not flags & 0x8000 or an == 0:   # not a response / no answers
        return None, []
    off = 12
    qname = None
    for _ in range(qd):
        qname, off = _read_name(payload, off)
        off += 4  # qtype + qclass
    ips: list[str] = []
    for _ in range(an):
        if off >= len(payload):
            break
        _name, off = _read_name(payload, off)
        if off + 10 > len(payload):
            break
        rtype, _rclass, _ttl, rdlen = struct.unpack_from(">HHIH", payload, off)
        off += 10
        rdata = payload[off:off + rdlen]
        off += rdlen
        # sFlow captures only the packet's first N bytes, so a record
        # cut mid-rdata is NORMAL: the slice above silently shortens,
        # and without the len() checks a truncated AAAA raised
        # AddressValueError (killing the task) while a truncated A
        # emitted a malformed address like '32.1'
        if rtype == 1 and rdlen == 4 and len(rdata) == 4:        # A
            ips.append(".".join(str(b) for b in rdata))
        elif rtype == 28 and rdlen == 16 and len(rdata) == 16:   # AAAA
            import ipaddress
            ips.append(str(ipaddress.IPv6Address(rdata)))
    return qname, ips


def dns_ips_string(ips: list[str]) -> str:
    """Reference rendering: '{ip1,ip2}' (xe-dns.h:158-204, for PG
    inet[] casts)."""
    return "{" + ",".join(ips) + "}"


# ------------------------------------------------------------------ SNI

def parse_tls_sni(payload: bytes) -> str | None:
    """server_name from a TLS ClientHello (RFC 8446 §4.1.2, ext 0)."""
    try:
        if len(payload) < 5 or payload[0] != 0x16:   # handshake record
            return None
        off = 5
        if payload[off] != 0x01:                     # ClientHello
            return None
        off += 4                                     # msg type + 24-bit len
        off += 2 + 32                                # version + random
        sid_len = payload[off]; off += 1 + sid_len   # session id
        cs_len = struct.unpack_from(">H", payload, off)[0]
        off += 2 + cs_len                            # cipher suites
        cm_len = payload[off]; off += 1 + cm_len     # compression methods
        if off + 2 > len(payload):
            return None
        ext_total = struct.unpack_from(">H", payload, off)[0]
        off += 2
        end = min(off + ext_total, len(payload))
        while off + 4 <= end:
            etype, elen = struct.unpack_from(">HH", payload, off)
            off += 4
            if etype == 0:                           # server_name (RFC 6066)
                # list len(2) + type(1) + name len(2)
                if off + 5 > len(payload):
                    return None
                if payload[off + 2] != 0:
                    return None
                nlen = struct.unpack_from(">H", payload, off + 3)[0]
                name = payload[off + 5: off + 5 + nlen]
                return name.decode("ascii", "replace")
            off += elen
        return None
    except (IndexError, struct.error):
        return None


# ---------------------------------------------------------- Spark columns

def dns_columns(payload_col: Column) -> list[Column]:
    """(dns_name, dns_ips string, dns_ips_array) from a binary payload
    column, Arrow-batched."""

    @F.pandas_udf(T.StructType([
        T.StructField("dns_name", T.StringType()),
        T.StructField("dns_ips", T.StringType()),
        T.StructField("dns_ips_array", T.ArrayType(T.StringType())),
    ]))
    def dns_udf(payloads: pd.Series) -> pd.DataFrame:
        names, strs, arrs = [], [], []
        for p in payloads:
            if p is None:
                names.append(None); strs.append(None); arrs.append(None)
                continue
            name, ips = parse_dns_response(bytes(p))
            names.append(name)
            strs.append(dns_ips_string(ips) if ips else None)
            arrs.append(ips if ips else None)
        return pd.DataFrame({"dns_name": names, "dns_ips": strs,
                             "dns_ips_array": arrs})

    s = dns_udf(payload_col)
    return [s["dns_name"].alias("dns_name"), s["dns_ips"].alias("dns_ips"),
            s["dns_ips_array"].alias("dns_ips_array")]


def sni_column(payload_col: Column) -> Column:
    @F.pandas_udf(T.StringType())
    def sni_udf(payloads: pd.Series) -> pd.Series:
        return pd.Series([
            parse_tls_sni(bytes(p)) if p is not None else None
            for p in payloads
        ])
    return sni_udf(payload_col)
