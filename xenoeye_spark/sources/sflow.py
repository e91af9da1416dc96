"""sFlow v5 datagram decoder + raw packet header parser.

Written from the public sFlow v5 specification (sflow.org). Coverage
mirrors the reference (sflow.c / sflow-impl.h / rawparse.h, SURVEY.md
§2.1): flow samples (standard + expanded) carrying raw-packet-header
records; counter samples are skipped. The embedded Ethernet frame is
parsed through VLAN / QinQ to IPv4/IPv6 + TCP/UDP/ICMP.

Quirk parity: for ICMP the reference stores type*256+code in the
destination port field (sflow-impl.h:254-260 — the classic NetFlow
convention); we do the same and also fill ``icmp_type``.
"""

from __future__ import annotations

import struct

# sample formats (enterprise 0)
_FLOW_SAMPLE = 1
_COUNTER_SAMPLE = 2
_FLOW_SAMPLE_EXPANDED = 3
# flow-record formats
_RAW_PACKET_HEADER = 1
# header protocols
_H_ETHERNET = 1


def parse_ethernet(frame: bytes) -> dict:
    """Ethernet/VLAN/QinQ -> IPv4/IPv6 -> L4 fields (rawparse.h parity)."""
    row: dict = {}
    if len(frame) < 14:
        return row
    row["dst_mac"] = frame[0:6]
    row["src_mac"] = frame[6:12]
    off = 12
    etype = struct.unpack_from(">H", frame, off)[0]
    off += 2
    vlans = []
    while etype in (0x8100, 0x88A8, 0x9100) and off + 4 <= len(frame):
        tci = struct.unpack_from(">H", frame, off)[0]
        vlans.append(tci & 0x0FFF)
        etype = struct.unpack_from(">H", frame, off + 2)[0]
        off += 4
    if vlans:
        row["src_vlan"] = vlans[0]
        if len(vlans) > 1:
            row["src_dot1q_cvlan"] = vlans[1]
    if etype == 0x0800:
        row.update(_parse_ipv4(frame, off))
    elif etype == 0x86DD:
        row.update(_parse_ipv6(frame, off))
    return row


def _parse_l4(data: bytes, off: int, proto: int) -> dict:
    row: dict = {}
    if proto in (6, 17):
        if off + 4 <= len(data):
            sp, dp = struct.unpack_from(">HH", data, off)
            row["l4_src_port"] = sp
            row["l4_dst_port"] = dp
        if proto == 6 and off + 14 <= len(data):
            row["tcp_flags"] = data[off + 13]
    elif proto in (1, 58):  # ICMP / ICMPv6
        if off + 2 <= len(data):
            t, c = data[off], data[off + 1]
            row["icmp_type"] = t
            # reference parity: ICMP type/code ride in dst port
            # (sflow-impl.h:254-260)
            row["l4_src_port"] = 0
            row["l4_dst_port"] = (t << 8) | c
    return row


def _parse_ipv4(data: bytes, off: int) -> dict:
    if off + 20 > len(data):
        return {}
    vihl = data[off]
    if vihl >> 4 != 4:
        return {}
    ihl = (vihl & 0xF) * 4
    row = {
        "ip_protocol_version": 4,
        "src_tos": data[off + 1],
        "frag_id": struct.unpack_from(">H", data, off + 4)[0],
        "ip_ttl": data[off + 8],
        "protocol": data[off + 9],
        "ip4_src_addr": struct.unpack_from(">I", data, off + 12)[0],
        "ip4_dst_addr": struct.unpack_from(">I", data, off + 16)[0],
    }
    row.update(_parse_l4(data, off + ihl, row["protocol"]))
    return row


def _parse_ipv6(data: bytes, off: int) -> dict:
    if off + 40 > len(data):
        return {}
    if data[off] >> 4 != 6:
        return {}
    nxt = data[off + 6]
    row = {
        "ip_protocol_version": 6,
        "ip_ttl": data[off + 7],
        "protocol": nxt,
        "ip6_src_addr": data[off + 8: off + 24],
        "ip6_dst_addr": data[off + 24: off + 40],
    }
    row.update(_parse_l4(data, off + 40, nxt))
    return row


def _parse_raw_header_record(data: bytes) -> dict:
    """raw packet header record: protocol, frame_len, stripped, hdr_size,
    header bytes."""
    if len(data) < 16:
        return {}
    proto, frame_len, _stripped, hdr_size = struct.unpack_from(">IIII", data, 0)
    hdr = data[16:16 + hdr_size]
    if proto != _H_ETHERNET:
        return {}
    row = parse_ethernet(hdr)
    if row:
        row["in_bytes"] = frame_len
        row["in_pkts"] = 1
    return row


def parse_sflow(data: bytes) -> list[dict]:
    """One sFlow v5 datagram -> flow rows (counter samples skipped)."""
    if len(data) < 8:
        return []
    off = 0
    ver = struct.unpack_from(">I", data, off)[0]
    off += 4
    if ver != 5:
        return []
    addr_type = struct.unpack_from(">I", data, off)[0]
    off += 4
    agent_ip4 = None
    if addr_type == 1:
        if off + 4 > len(data):
            return []
        agent_ip4 = struct.unpack_from(">I", data, off)[0]
        off += 4
    elif addr_type == 2:
        off += 16
    else:
        return []
    if off + 12 > len(data):
        return []
    sub_agent, _seq, _uptime = struct.unpack_from(">III", data, off)
    off += 12
    if off + 4 > len(data):
        return []
    n_samples = struct.unpack_from(">I", data, off)[0]
    off += 4

    rows: list[dict] = []
    for _ in range(n_samples):
        if off + 8 > len(data):
            break
        stype, slen = struct.unpack_from(">II", data, off)
        off += 8
        body = data[off:off + slen]
        off += slen
        fmt = stype & 0xFFF
        if (stype >> 12) != 0:
            continue  # enterprise-specific sample
        if fmt == _FLOW_SAMPLE:
            rows.extend(_parse_flow_sample(body, expanded=False, agent=agent_ip4))
        elif fmt == _FLOW_SAMPLE_EXPANDED:
            rows.extend(_parse_flow_sample(body, expanded=True, agent=agent_ip4))
        # counter samples skipped (sflow.c parity)
    # virtual dev_id = sub-agent id (sflow-impl.h:350 + sflow_reset:275-280)
    for row in rows:
        row["dev_id"] = sub_agent
    return rows


def _parse_flow_sample(body: bytes, expanded: bool, agent: int | None) -> list[dict]:
    off = 0
    try:
        if expanded:
            (_seq, _st, _si, rate, _pool, _drops, inp_fmt, inp_val,
             out_fmt, out_val, n_rec) = struct.unpack_from(">11I", body, 0)
            off = 44
            inp, outp = inp_val, out_val
        else:
            (_seq, _src, rate, _pool, _drops, inp, outp,
             n_rec) = struct.unpack_from(">8I", body, 0)
            off = 32
    except struct.error:
        return []
    rows = []
    for _ in range(n_rec):
        if off + 8 > len(body):
            break
        rfmt, rlen = struct.unpack_from(">II", body, off)
        off += 8
        rec = body[off:off + rlen]
        off += rlen
        if (rfmt & 0xFFF) == _RAW_PACKET_HEADER and (rfmt >> 12) == 0:
            row = _parse_raw_header_record(rec)
            if row:
                row["input_snmp"] = inp
                row["output_snmp"] = outp
                row["sampling_rate"] = rate or 1
                if agent is not None:
                    row["dev_ip"] = agent
                rows.append(row)
    return rows
