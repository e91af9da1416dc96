"""Decoder robustness: flow decoders consume untrusted UDP payloads, so
no byte string may crash them — truncated, mutated, or random input must
decode to zero-or-more rows, never raise. Hypothesis drives the byte
generation; mutations of VALID packets probe the interesting branches."""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from xenoeye_spark.sources.netflow import TemplateStore, parse_packet
from xenoeye_spark.sources.pcap import iter_pcap, udp_from_frame
from xenoeye_spark.sources.payload import parse_dns_response, parse_tls_sni
from xenoeye_spark.sources.sflow import parse_ethernet, parse_sflow
from tests.test_pcap import build_eth_ipv4_udp, build_pcap
from tests.test_sources import build_ipfix, build_sflow, build_v5, build_v9

VALID = [
    build_v5([{"src": 1, "dst": 2, "pkts": 1, "octets": 10,
               "sport": 1, "dport": 2, "proto": 6}]),
    build_v9([(8, 4), (12, 4), (1, 4)], [(1, 2, 10)]),
    build_ipfix([(8, 4), (12, 4), (1, 4)], [(1, 2, 10)]),
    build_sflow([build_eth_ipv4_udp(1, 2, 3, 4, b"x" * 8)]),
]


def _decode_all(data: bytes) -> None:
    store = TemplateStore()
    rows = parse_packet(data, store)
    assert isinstance(rows, list)
    rows = parse_sflow(data)
    assert isinstance(rows, list)
    parse_ethernet(data)
    udp_from_frame(data)
    parse_dns_response(data)
    parse_tls_sni(data)


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=600))
def test_random_bytes_never_crash(data):
    _decode_all(data)


@settings(max_examples=200, deadline=None)
@given(
    st.sampled_from(VALID),
    st.integers(min_value=0, max_value=599),
    st.integers(min_value=0, max_value=255),
)
def test_mutated_valid_packets_never_crash(pkt, pos, val):
    b = bytearray(pkt)
    b[pos % len(b)] = val
    _decode_all(bytes(b))


@settings(max_examples=100, deadline=None)
@given(
    st.sampled_from(VALID),
    st.integers(min_value=0, max_value=200),
)
def test_truncated_valid_packets_never_crash(pkt, cut):
    _decode_all(pkt[: max(0, len(pkt) - cut)])


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_pcap_reader_never_crashes(data):
    # a valid header followed by arbitrary record bytes must not raise;
    # fully arbitrary bytes may raise ValueError (bad magic) but nothing else
    try:
        list(iter_pcap(data))
    except ValueError:
        pass
    hdr = struct.pack("<IHHiIII", 0xA1B2C3D4, 2, 4, 0, 0, 65535, 1)
    list(iter_pcap(hdr + data))


def test_valid_packets_still_decode():
    store = TemplateStore()
    assert parse_packet(VALID[0], store)
    assert parse_packet(VALID[1], TemplateStore())
    assert parse_packet(VALID[2], TemplateStore())
    assert parse_sflow(VALID[3])


@given(st.binary(max_size=200))
@settings(max_examples=300, deadline=None)
def test_packet_has_templates_never_crashes(data):
    from xenoeye_spark.sources.netflow import packet_has_templates
    packet_has_templates(data)  # any bytes: bool out, no exception


@given(st.binary(max_size=120), st.integers(0, 2**32 - 1))
@settings(max_examples=100, deadline=None)
def test_template_journal_survives_garbage_and_torn_tail(tmp_path_factory,
                                                         data, dev_ip):
    """Journal replay must tolerate arbitrary journaled packets and a
    torn (half-written) trailing record — the crash-at-write case."""
    from xenoeye_spark.sources.netflow import TemplateJournal
    root = tmp_path_factory.mktemp("tj")
    j = TemplateJournal(str(root / "t"))
    j.append_packet(data, dev_ip)
    j.append_packet(build_v9([(8, 4)], [(1,)], tid=260), 9)
    j.close()
    # tear the tail: append a record header promising more than exists
    with open(str(root / "t.pkts"), "ab") as fh:
        fh.write(struct.pack(">IQ", 99999, 1) + b"\x01\x02")
    seed = TemplateJournal(str(root / "t")).load()
    # the valid template always survives; garbage/torn bytes never crash
    assert any(k[3] == 260 for k, _ in seed)


def test_sflow_dispatch_fuzz_consistency():
    """parse_packet's sFlow dispatch agrees with parse_sflow directly."""
    frame = build_eth_ipv4_udp(1, 2, 3, 4, b"x")
    pkt = build_sflow([frame])
    via_dispatch = parse_packet(pkt, TemplateStore())
    direct = parse_sflow(pkt)
    assert via_dispatch == direct and len(direct) == 1
