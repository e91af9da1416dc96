"""WARC ingest (r7): record walk strictness, HTTP response split,
per-record gzip, quarantine path, and the documents composition.
Spec: ISO 28500 / WARC 1.1 (public)."""

from __future__ import annotations

import gzip
import hashlib

import pytest

from pyspark.sql import functions as F

from xenoeye_spark.datapipe.warc import (
    encode_warc,
    http_response_bytes,
    parse_http_response,
    split_warc_records,
    warc_documents,
    warc_records,
)


def _resp_rec(uri: str, body: bytes, status: int = 200):
    return (
        {"WARC-Type": "response", "WARC-Target-URI": uri},
        http_response_bytes(body, status=status),
    )


def _info_rec():
    return ({"WARC-Type": "warcinfo"}, b"software: xe-test\r\n")


def test_split_records_roundtrip_plain_and_gzip():
    recs = [_info_rec(), _resp_rec("http://a/1", b"hello world"),
            _resp_rec("http://a/2", b"\x00\xffbinary ok")]
    for gz in (False, True):
        data = encode_warc(recs, per_record_gzip=gz)
        got = list(split_warc_records(data))
        assert [h["warc-type"] for h, _ in got] == [
            "warcinfo", "response", "response"]
        status, hdrs, payload = parse_http_response(got[1][1])
        assert (status, payload) == (200, b"hello world")
        assert hdrs["content-type"] == "text/plain"
        status2, _, payload2 = parse_http_response(got[2][1])
        assert (status2, payload2) == (200, b"\x00\xffbinary ok")
    # whole-file gzip (one member) also inflates
    got = list(split_warc_records(gzip.compress(
        encode_warc(recs), mtime=0)))
    assert len(got) == 3


def test_split_records_strictness():
    good = encode_warc([_resp_rec("http://a/1", b"x" * 50)])
    with pytest.raises(ValueError, match="not a WARC record"):
        list(split_warc_records(b"HTTP/1.1 200 OK\r\n\r\n"))
    with pytest.raises(ValueError, match="truncated WARC header"):
        list(split_warc_records(b"WARC/1.0\r\nWARC-Type: response\r\n"))
    with pytest.raises(ValueError, match="past end of file"):
        list(split_warc_records(good[:len(good) - 30]))
    bad_len = good.replace(b"Content-Length: ", b"Content-Length: x")
    with pytest.raises(ValueError, match="Content-Length"):
        list(split_warc_records(bad_len))
    # truncated GZIPPED file also lands on the ValueError contract
    # (gzip raises EOFError/BadGzipFile; the walker normalizes them)
    gz = encode_warc([_resp_rec("http://a/1", b"y" * 50)],
                     per_record_gzip=True)
    with pytest.raises(ValueError, match="corrupt gzip"):
        list(split_warc_records(gz[:len(gz) - 20]))
    # non-HTTP record content passes through parse_http_response
    assert parse_http_response(b"raw resource bytes") == (
        None, {}, b"raw resource bytes")


def test_warc_records_df_and_quarantine(spark):
    files = []
    for i in range(6):
        body = f"document number {i}".encode()
        data = encode_warc(
            [_info_rec(), _resp_rec(f"http://ex/{i}", body,
                                    status=404 if i == 4 else 200)],
            per_record_gzip=(i % 2 == 0),
        )
        if i == 5:
            data = data[:40]                       # truncated file
        files.append((i, bytearray(data)))
    df = spark.createDataFrame(files, "source_id long, content binary")

    with pytest.raises(Exception):                 # strict default
        warc_records(df).count()

    out = warc_records(df, on_error="null")
    rows = {(r.source_id, r.rec_index): r for r in out.collect()}
    assert rows[(5, -1)].warc_type is None         # quarantined file
    r31 = rows[(3, 1)]
    body3 = b"document number 3"
    assert r31.warc_type == "response"
    assert r31.target_uri == "http://ex/3"
    assert r31.http_status == 200
    assert r31.payload_len == len(body3)
    assert r31.payload_md5 == hashlib.md5(body3).hexdigest()
    assert r31.payload_text == body3.decode()
    assert rows[(4, 1)].http_status == 404
    assert rows[(0, 0)].warc_type == "warcinfo"

    docs = warc_documents(df, on_error="null")
    got = {r.source_id: r for r in docs.collect()}
    assert set(got) == {0, 1, 2, 3}                # 404 + corrupt out
    assert got[2].text == "document number 2"
    # composition filters but never invents rows
    assert docs.count() == 4


def test_warc_records_validates_on_error(spark):
    df = spark.createDataFrame([(1, bytearray(b""))],
                               "source_id long, content binary")
    with pytest.raises(ValueError, match="fail|null"):
        warc_records(df, on_error="skip")


def test_warc_quarantine_discards_partial_records(spark):
    """r8 (ADVICE): a file truncated MID-WAY under on_error='null' must
    emit ONLY the quarantine row — records parsed before the failure
    point are discarded, otherwise re-routing the quarantined file
    double-ingests its leading records."""
    recs = [_resp_rec("http://ex/ok", b"leading record body"),
            _resp_rec("http://ex/cut", b"z" * 200)]
    data = encode_warc(recs)
    cut = data[:len(data) - 50]      # truncates inside record 2's body
    # sanity: the walker does yield record 1 before raising
    it = split_warc_records(cut)
    assert next(it)[0]["warc-type"] == "response"
    with pytest.raises(ValueError):
        list(it)
    df = spark.createDataFrame(
        [(1, bytearray(cut)), (2, bytearray(data))],
        "source_id long, content binary",
    )
    rows = sorted(
        (r.source_id, r.rec_index)
        for r in warc_records(df, on_error="null").collect()
    )
    # file 1: quarantine row ONLY; file 2: both records
    assert rows == [(1, -1), (2, 0), (2, 1)]


def test_warc_chunked_flush_identical_output(spark, monkeypatch):
    """r8: the CHUNK_ROWS flush (fail mode) must not change results —
    force a tiny chunk so a single file spans many flushes."""
    from xenoeye_spark.datapipe import warc as warc_mod

    recs = [_resp_rec(f"http://ex/{i}", f"body {i}".encode())
            for i in range(25)]
    df = spark.createDataFrame(
        [(1, bytearray(encode_warc(recs, per_record_gzip=True)))],
        "source_id long, content binary",
    )
    baseline = sorted(
        (r.rec_index, r.target_uri, r.payload_md5)
        for r in warc_records(df).collect()
    )
    monkeypatch.setattr(warc_mod, "CHUNK_ROWS", 4)
    chunked = sorted(
        (r.rec_index, r.target_uri, r.payload_md5)
        for r in warc_records(df).collect()
    )
    assert chunked == baseline and len(baseline) == 25


def test_warc_null_mode_chunked_two_pass(spark, monkeypatch):
    """r9: null mode no longer buffers a whole file's parsed rows — the
    two-pass walk (validate, then re-walk and emit) flushes every
    CHUNK_ROWS like fail mode. Force a tiny chunk so one good
    many-record file spans many flushes, mix in a truncated file, and
    assert rows identical to the default-chunk run: good file complete
    and ordered, bad file exactly one quarantine row."""
    from xenoeye_spark.datapipe import warc as warc_mod

    recs = [_resp_rec(f"http://ex/{i}", f"body {i}".encode())
            for i in range(25)]
    good = encode_warc(recs, per_record_gzip=True)
    bad = encode_warc([_resp_rec("http://ex/cut", b"z" * 200)])[:-60]
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(bad))],
        "source_id long, content binary",
    )
    baseline = sorted(
        (r.source_id, r.rec_index, r.target_uri, r.payload_md5)
        for r in warc_records(df, on_error="null").collect()
    )
    monkeypatch.setattr(warc_mod, "CHUNK_ROWS", 4)
    chunked = sorted(
        (r.source_id, r.rec_index, r.target_uri, r.payload_md5)
        for r in warc_records(df, on_error="null").collect()
    )
    assert chunked == baseline
    assert [(s, i) for s, i, *_ in baseline] == (
        [(1, i) for i in range(25)] + [(2, -1)]
    )


def test_warc_streaming_inflate_bounds_buffer():
    """r8: the walker's working buffer stays O(largest record), not
    O(shard): walk a many-record member-gzipped file and watch the
    buffer via the yielded record sizes (indirect: the walk completes
    and yields lazily — consuming one record at a time keeps working
    even when the full inflated size would be large relative to the
    record)."""
    big = [_resp_rec(f"http://ex/{i}", bytes(2048)) for i in range(500)]
    data = encode_warc(big, per_record_gzip=True)
    seen = 0
    for hdrs, content in split_warc_records(data):
        seen += 1
        assert len(content) <= 2048 + 200
    assert seen == 500


def test_warc_walker_roundtrip_property():
    """Property (hypothesis): arbitrary records — binary content of any
    size (including empty and CRLF-laden bodies that look like record
    separators), arbitrary header values — round-trip through
    encode_warc in all three layouts (plain, per-record gzip,
    whole-file gzip) and come back byte-identical through the streaming
    walker. Guards the r8 offset-pointer buffer arithmetic."""
    import gzip as _gzip

    from hypothesis import given, settings
    from hypothesis import strategies as st

    content = st.binary(min_size=0, max_size=4096)
    uri = st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126),
        min_size=0, max_size=40,
    )

    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.tuples(uri, content), min_size=1, max_size=8))
    def check(recs):
        encoded = [
            ({"WARC-Type": "resource", "WARC-Target-URI": u}, c)
            for u, c in recs
        ]
        for layout in ("plain", "member", "whole"):
            data = encode_warc(encoded, per_record_gzip=(layout == "member"))
            if layout == "whole":
                data = _gzip.compress(data, mtime=0)
            got = list(split_warc_records(data))
            assert [c for _, c in got] == [c for _, c in encoded]
            assert [h.get("warc-target-uri") for h, _ in got] == [
                u for u, _ in recs
            ]

    check()


def test_warc_walker_never_hangs_on_garbage():
    """Property (hypothesis): arbitrary byte soup — including inputs
    starting with the gzip magic, truncated valid files, and bit-flipped
    valid files — either walks to completion or raises ValueError;
    never any other exception, never an infinite loop (bounded by the
    input's own byte count)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    base = encode_warc(
        [({"WARC-Type": "resource"}, b"seed-content-" * 20)],
        per_record_gzip=True,
    )

    @settings(max_examples=80, deadline=None)
    @given(st.one_of(
        st.binary(min_size=0, max_size=2048),
        st.binary(min_size=0, max_size=2).map(lambda p: p + base),
        st.integers(min_value=0, max_value=len(base) - 1).map(
            lambda i: base[:i]
        ),
        st.tuples(
            st.integers(min_value=0, max_value=len(base) - 1),
            st.integers(min_value=1, max_value=255),
        ).map(lambda t: base[:t[0]] + bytes([base[t[0]] ^ t[1]])
              + base[t[0] + 1:]),
    ))
    def check(data):
        try:
            n = sum(1 for _ in split_warc_records(bytes(data)))
            assert n >= 0
        except ValueError:
            pass

    check()


def test_warc_walker_compaction_boundary():
    """r8 review fix: fill() must never compact mid-record — a record
    whose header lands just past the 1 MiB compaction threshold while
    its body needs another read used to hit stale he/body_start offsets
    and fail (or corrupt) on a perfectly valid file. Build files whose
    record boundaries straddle the threshold at many phases and assert
    every record round-trips bit-exact."""
    from xenoeye_spark.datapipe.warc import _CHUNK

    for phase in (-3, -1, 0, 1, 7, 4093):
        # one big record pushes the consumed offset near _CHUNK, then
        # many small records force repeated fills around the boundary
        big = bytes(range(256)) * ((_CHUNK + phase) // 256 // 2)
        recs = [({"WARC-Type": "resource", "WARC-Target-URI": "big"}, big)]
        for i in range(50):
            recs.append((
                {"WARC-Type": "resource", "WARC-Target-URI": f"s{i}"},
                (f"small-{i}-" * 40).encode(),
            ))
        recs.append(
            ({"WARC-Type": "resource", "WARC-Target-URI": "big2"}, big)
        )
        data = encode_warc(recs)
        got = list(split_warc_records(data))
        assert len(got) == len(recs)
        assert all(g[1] == r[1] for g, r in zip(got, recs))
        # and through member gzip (different fill cadence)
        got_gz = list(split_warc_records(
            encode_warc(recs, per_record_gzip=True)))
        assert all(g[1] == r[1] for g, r in zip(got_gz, recs))


# -------------------------------------------------- charset policy (r12)

def test_charset_policy_latin1_shiftjis_pinned(spark):
    """The pinned charset policy: a response's Content-Type charset
    decodes the body (latin-1, shift_jis); absent/unknown/non-text
    charsets fall back to UTF-8; bad bytes REPLACE, never quarantine
    — and payload_md5 still hashes the exact original bytes."""
    from xenoeye_spark.datapipe.warc import decode_payload_text

    cafe_l1 = "café".encode("latin-1")           # 0xE9: invalid UTF-8
    tokyo_sj = "東京タワー".encode("shift_jis")
    recs = [
        ({"WARC-Type": "response", "WARC-Target-URI": "http://a/l1"},
         http_response_bytes(
             cafe_l1, content_type="text/html; charset=ISO-8859-1")),
        ({"WARC-Type": "response", "WARC-Target-URI": "http://a/sj"},
         http_response_bytes(
             tokyo_sj, content_type='text/html; charset="Shift_JIS"')),
        # no charset: UTF-8 replace turns the latin-1 byte into U+FFFD
        ({"WARC-Type": "response", "WARC-Target-URI": "http://a/none"},
         http_response_bytes(cafe_l1, content_type="text/html")),
        # unknown charset name: documented UTF-8 fallback
        ({"WARC-Type": "response", "WARC-Target-URI": "http://a/unk"},
         http_response_bytes(
             b"plain", content_type="text/html; charset=x-klingon")),
    ]
    data = encode_warc(recs)
    df = spark.createDataFrame([(1, bytearray(data))],
                               "source_id long, content binary")
    rows = {r.target_uri: r for r in warc_records(df).collect()}
    assert rows["http://a/l1"].payload_text == "café"
    assert rows["http://a/sj"].payload_text == "東京タワー"
    assert rows["http://a/none"].payload_text == "caf�"
    assert rows["http://a/unk"].payload_text == "plain"
    # byte fidelity is charset-independent
    assert rows["http://a/l1"].payload_md5 == hashlib.md5(
        cafe_l1).hexdigest()
    assert rows["http://a/sj"].payload_len == len(tokyo_sj)
    # the helper alone: non-text codec smuggled into the header
    assert decode_payload_text(b"abc", "text/plain; charset=zip") == "abc"
    assert decode_payload_text(b"abc", None) == "abc"
