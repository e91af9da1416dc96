"""WARC ingest — the wire format of real web-crawl corpora.

Large-scale text pipelines start from WARC files (ISO 28500, the
Common Crawl container): a concatenation of records, each a
``WARC/1.x`` header block (CRLF-separated ``Name: value`` lines,
terminated by CRLFCRLF) followed by exactly ``Content-Length`` bytes
of record content and a CRLF CRLF record separator. ``response``
records wrap a full HTTP response (status line + headers + payload).
Files are commonly gzip-compressed with ONE GZIP MEMBER PER RECORD so
readers can split on member boundaries; the walker inflates members
INCREMENTALLY (``gzip.GzipFile`` reads across member boundaries), so
whole-file gzip works identically.

Spark shape: one ``mapInPandas`` projection over (source_id, content
binary) rows — no shuffle; per-row cost is the file's own bytes, and
peak task memory is bounded by the COMPRESSED file plus the largest
single record plus one row chunk (r8; previously the whole inflated
shard plus every parsed row was held at once — ~4-5 GB per task on a
standard 1 GB Common Crawl shard). The record walk is strict: a
malformed header or a truncated body raises (``on_error='null'``
quarantines the whole file to a NULL row instead — and discards any
records parsed before the failure, so quarantined files never
double-ingest).

This module parses the container format from its public specification
(ISO 28500 / WARC 1.1); the reference engine has no WARC surface —
this is part of the beyond-reference corpus-pipeline tier.
"""

from __future__ import annotations

import codecs
import gzip
import hashlib
import re
from typing import Iterator
from zlib import error as zlib_error

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF2 = b"\r\n\r\n"

# warc_records flushes parsed rows to Arrow every this many records
# (fail mode), bounding the rows buffer independently of shard size
CHUNK_ROWS = 10_000


_CHUNK = 1 << 20  # streaming inflate/read granularity


def split_warc_records(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield (headers, content) per WARC record. ``headers`` maps
    lower-cased names to values plus ``'warc-version'``. Strict: raises
    ValueError on a malformed header block, a missing/invalid
    Content-Length, or a body that runs past the end of the file.

    Memory (r8): the walk is STREAMING — gzip members inflate
    incrementally through ``gzip.GzipFile`` (it reads across member
    boundaries, so both record-per-member warc.gz and whole-file gzip
    work) and the working buffer holds only the current record plus one
    read chunk, never the inflated shard. Peak extra memory per task is
    O(largest record), not O(shard); the caller's compressed bytes are
    the remaining per-row footprint (the ingest source hands whole
    files as rows). Truncated/corrupt gzip raises EOFError/BadGzipFile
    from the read; normalized to the module's ValueError contract so
    the quarantine path sees one exception type."""
    import io

    if data[:2] == b"\x1f\x8b":
        fobj = gzip.GzipFile(fileobj=io.BytesIO(data))
    else:
        fobj = io.BytesIO(data)
    buf = bytearray()
    pos = 0   # consumed prefix of buf (amortized compaction: a
    eof = False   # per-record del buf[:n] would be quadratic in records)
    off = 0   # absolute offset of buf[0] in the (inflated) stream

    def compact() -> None:
        nonlocal pos, off
        if pos:
            del buf[:pos]
            off += pos
            pos = 0

    def fill(need: int) -> None:
        """Ensure >= need unconsumed bytes are buffered (or EOF).
        NEVER compacts: callers hold absolute buffer offsets (he,
        body_start) across fills — compaction happens only at the
        record-loop top, where no offsets are live."""
        nonlocal eof
        while not eof and len(buf) - pos < need:
            try:
                chunk = fobj.read(_CHUNK)
            except (EOFError, OSError, zlib_error) as e:
                raise ValueError(f"corrupt gzip WARC file: {e}") from e
            if not chunk:
                eof = True
            else:
                buf.extend(chunk)

    while True:
        if pos >= _CHUNK:
            compact()  # amortized; only here, where no offsets are live
        fill(2)
        while buf[pos:pos + 2] == b"\r\n":  # skip record separators
            pos += 2
            fill(2)
        if len(buf) - pos == 0 and eof:
            return
        fill(5)
        if bytes(buf[pos:pos + 5]) != b"WARC/":
            raise ValueError(
                f"not a WARC record header at offset {off + pos}"
            )
        while True:
            he = buf.find(_CRLF2, pos)
            if he >= 0:
                break
            if eof:
                raise ValueError("truncated WARC header block")
            fill(len(buf) - pos + _CHUNK)
        lines = bytes(buf[pos:he]).decode("utf-8", "replace").split("\r\n")
        hdrs = {"warc-version": lines[0]}
        for ln in lines[1:]:
            name, sep, val = ln.partition(":")
            if not sep:
                raise ValueError(f"malformed WARC header line: {ln!r}")
            hdrs[name.strip().lower()] = val.strip()
        try:
            clen = int(hdrs["content-length"])
        except (KeyError, ValueError):
            raise ValueError("missing or non-integer Content-Length")
        body_start = he + len(_CRLF2)
        fill(body_start - pos + clen)
        if len(buf) < body_start + clen:
            raise ValueError(
                f"record body runs past end of file "
                f"({off + body_start + clen} > {off + len(buf)})"
            )
        yield hdrs, bytes(buf[body_start:body_start + clen])
        pos = body_start + clen


def parse_http_response(content: bytes) -> tuple[int | None, dict, bytes]:
    """Split an HTTP response record's content into (status, headers,
    payload). Returns (None, {}, content) when the content does not
    start with an HTTP status line (e.g. a resource record)."""
    if not content.startswith(b"HTTP/"):
        return None, {}, content
    he = content.find(_CRLF2)
    if he < 0:
        return None, {}, content
    lines = content[:he].decode("utf-8", "replace").split("\r\n")
    parts = lines[0].split(" ", 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, {}, content
    hdrs = {}
    for ln in lines[1:]:
        name, sep, val = ln.partition(":")
        if sep:
            hdrs[name.strip().lower()] = val.strip()
    return status, hdrs, content[he + len(_CRLF2):]


_CHARSET_RE = re.compile(r'charset\s*=\s*"?([A-Za-z0-9_.:+-]+)"?', re.I)


def decode_payload_text(payload: bytes, content_type: str | None) -> str:
    """Charset policy (r12, pinned by test): honor the HTTP
    Content-Type charset parameter when present and resolvable in
    Python's codec registry (latin-1, shift_jis, euc-jp, ...);
    otherwise — absent, unknown, or a non-text codec — decode UTF-8.
    Always ``errors='replace'``: extraction REPLACES, it never
    quarantines a record over undecodable bytes, because byte
    fidelity lives in payload_md5/payload_len and a crawl row with
    some U+FFFD is still a usable dedup/quality-filter input where a
    NULL would silently shrink the corpus. HTML <meta charset> is
    deliberately NOT consulted (that is a post-extract concern for
    the html_to_text stage, not the transport layer)."""
    enc = "utf-8"
    if content_type:
        m = _CHARSET_RE.search(content_type)
        if m:
            try:
                codecs.lookup(m.group(1))
                enc = m.group(1)
            except LookupError:
                pass
    try:
        return payload.decode(enc, "replace")
    except Exception:              # non-text codec smuggled in the header
        return payload.decode("utf-8", "replace")


RECORDS_SCHEMA = T.StructType([
    T.StructField("source_id", T.LongType()),
    T.StructField("rec_index", T.LongType()),
    T.StructField("warc_type", T.StringType()),
    T.StructField("target_uri", T.StringType()),
    T.StructField("http_status", T.LongType()),
    T.StructField("payload_len", T.LongType()),
    T.StructField("payload_md5", T.StringType()),
    T.StructField("payload_text", T.StringType()),
])


def warc_records(
    files: DataFrame,
    content_col: str = "content",
    id_col: str = "source_id",
    on_error: str = "fail",
) -> DataFrame:
    """Explode (id, WARC-file binary) rows into one row per record:
    (source_id, rec_index, warc_type, target_uri, http_status,
    payload_len, payload_md5, payload_text). For ``response`` records
    the payload is the HTTP body; for others it is the raw record
    content. ``payload_text`` decodes per the pinned charset policy
    (``decode_payload_text``, r12): the response Content-Type charset
    when present and known, else UTF-8, always with replacement chars
    — never a quarantine; ``payload_md5`` hashes the exact payload
    BYTES, so binary payloads stay checkable.

    ``on_error='fail'`` (default) propagates malformed-file errors —
    a corrupt crawl shard should stop the job; ``'null'`` emits ONE
    quarantine row (rec_index = -1, everything else NULL) per bad file
    — and ONLY that row: records parsed before the failure point are
    never emitted, so a quarantined file never double-ingests when it
    is re-routed/re-fetched (the whole-file contract).

    Scale: one mapInPandas projection, no shuffle; cost per row is the
    file's own bytes. Memory: the record walk streams gzip members
    (split_warc_records, r8) and parsed rows flush every ``CHUNK_ROWS``
    — peak task memory is O(compressed file + largest record + chunk)
    in BOTH modes. ``'null'`` achieves that bound with a two-pass walk
    (r9): pass 1 validates the whole file without materializing a
    single row (the whole-file quarantine contract — no row may emit
    unless the walk completes), pass 2 re-walks and emits chunked. The
    price is a second inflate of bad-file-capable inputs on the null
    path only — CPU, not memory, and only where the caller asked for
    quarantine semantics.
    """
    if on_error not in ("fail", "null"):
        raise ValueError(f"on_error must be fail|null: {on_error!r}")
    cols = [f.name for f in RECORDS_SCHEMA.fields]

    def walk(sid: int, raw: bytes) -> Iterator[tuple]:
        for idx, (hdrs, content) in enumerate(split_warc_records(raw)):
            wtype = hdrs.get("warc-type", "")
            ctype = None
            if wtype == "response":
                status, rhdrs, payload = parse_http_response(content)
                ctype = rhdrs.get("content-type")
            else:
                status, payload = None, content
            yield (
                sid, idx, wtype, hdrs.get("warc-target-uri"),
                status, len(payload), hashlib.md5(payload).hexdigest(),
                decode_payload_text(payload, ctype),
            )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # rows accumulate into shared Arrow batches of ~CHUNK_ROWS: one
        # pandas frame per file would cost ~2ms of frame+Arrow overhead
        # per file (measured 13x on the sf0.1 many-small-shards gate
        # query). File atomicity in null mode is carried by the
        # validation pass, not by buffering — a file's rows only start
        # flowing after its walk has been PROVEN to complete.
        out_rows: list[tuple] = []

        def flush_if_full():
            nonlocal out_rows
            if len(out_rows) >= CHUNK_ROWS:
                frame = pd.DataFrame(out_rows, columns=cols)
                out_rows = []
                return frame
            return None

        for pdf in batches:
            for sid, raw in zip(pdf["_id"], pdf["_c"]):
                sid, raw = int(sid), bytes(raw)
                if on_error == "null":
                    # pass 1: validate without materializing rows. The
                    # walk is deterministic over the same bytes, so a
                    # clean pass 1 guarantees pass 2 cannot raise.
                    try:
                        for _ in split_warc_records(raw):
                            pass
                    except ValueError:
                        out_rows.append((sid, -1, None, None, None,
                                         None, None, None))
                        f = flush_if_full()
                        if f is not None:
                            yield f
                        continue
                # fail mode (an error kills the job anyway), or a
                # null-mode file whose validation pass completed:
                # emit chunked, mid-file included
                for row in walk(sid, raw):
                    out_rows.append(row)
                    f = flush_if_full()
                    if f is not None:
                        yield f
        if out_rows:
            yield pd.DataFrame(out_rows, columns=cols)

    staged = files.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(content_col).alias("_c"),
    )
    return staged.mapInPandas(run, schema=RECORDS_SCHEMA) \
        .withColumnRenamed("source_id", id_col)


def encode_warc(
    records: list[tuple[dict, bytes]],
    per_record_gzip: bool = False,
) -> bytes:
    """Minimal WARC writer (tests/gate only): each record = header
    block (WARC/1.0 + given headers + computed Content-Length), blank
    line, content, record separator. ``per_record_gzip`` emits one
    gzip member per record — the standard warc.gz layout."""
    out = bytearray()
    for hdrs, content in records:
        block = "WARC/1.0\r\n" + "".join(
            f"{k}: {v}\r\n" for k, v in hdrs.items()
        ) + f"Content-Length: {len(content)}\r\n\r\n"
        rec = block.encode("utf-8") + content + b"\r\n\r\n"
        out += gzip.compress(rec, mtime=0) if per_record_gzip else rec
    return bytes(out)


def http_response_bytes(
    body: bytes, status: int = 200, reason: str = "OK",
    content_type: str = "text/plain",
) -> bytes:
    """Wrap a payload as a minimal HTTP response (tests/gate only)."""
    return (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("utf-8") + body


def warc_documents(
    files: DataFrame,
    content_col: str = "content",
    id_col: str = "source_id",
    on_error: str = "fail",
) -> DataFrame:
    """The ingest composition: WARC files -> one row per successful
    (HTTP 2xx) response document: (id_col, target_uri, body_len,
    body_md5, text). The standard head of a crawl-corpus pipeline —
    feed the result to the quality/dedup stages."""
    recs = warc_records(files, content_col, id_col, on_error)
    return (
        recs.filter(
            (F.col("warc_type") == "response")
            & F.col("http_status").between(200, 299)
        )
        .select(
            id_col, "target_uri",
            F.col("payload_len").alias("body_len"),
            F.col("payload_md5").alias("body_md5"),
            F.col("payload_text").alias("text"),
        )
    )
