"""WARC source — Common-Crawl-style web archives -> the engine's page shape.

The north rule's input is "an Iceberg table of Common-Crawl-style web pages
with columns (url, warc_ts, html, text, lang)"; this module is the ingest
front door that PRODUCES that table from raw WARC files (ISO 28500 — the
container format Common Crawl publishes), so a user can go
`read_warc(...) -> build_index(...)` end to end.

Reference scope note: SHARE ingests via per-source harvesters
(share/harvesters/) that pull records over HTTP APIs; a web-scale corpus
arrives as WARC instead, so this is the harvester plane re-targeted at the
input_hint's payload — same position in the pipeline (raw source bytes ->
normalized page rows), different wire format.

Spark shape:
- files load WHOLE via the `binaryFile` data source (a WARC member must be
  parsed sequentially; gzipped WARCs concatenate per-record gzip members,
  which plain text-line splitting would corrupt). One file = one task —
  parallelism comes from the many-files layout Common Crawl already has
  (segment files ~1 GB); `spark.sql.files.maxPartitionBytes` does not
  split binaryFile rows, so partition count == file count.
- record split + HTTP de-chunking runs in an Arrow-batched mapInPandas —
  bytes never become JVM strings until the final page row.
- only `response` records with an HTTP payload become pages; `request` /
  `metadata` / `warcinfo` records are dropped (counted per task into an
  accumulator-free per-partition tally column if `keep_stats`).

Scale notes: a 100 TB crawl is ~10^5 segment files; whole-file tasks are
the standard Spark ingestion shape for WARC (one gzip stream is not
splittable). Memory is bounded by max_record_bytes — oversized payloads
(videos mislabeled as pages) truncate, recorded in the `truncated` column.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WARC_PAGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("truncated", T.BooleanType()),
        T.StructField("warc_file", T.StringType()),
    ]
)


def _split_warc_members(raw: bytes) -> Iterator[bytes]:
    """Yield one decompressed WARC record's bytes per gzip member (or the
    whole buffer split on record boundaries when uncompressed).

    Common Crawl gzips each record as its own member, so a plain
    gzip.decompress would already concatenate correctly — but streaming
    member-by-member bounds memory to one record at a time."""
    if raw[:2] == b"\x1f\x8b":
        import zlib

        buf = raw
        while buf[:2] == b"\x1f\x8b":
            d = zlib.decompressobj(zlib.MAX_WBITS | 16)  # gzip wrapper
            try:
                member = d.decompress(buf)
                member += d.flush()
            except zlib.error:
                return
            yield member
            if not d.unused_data or d.unused_data is buf:
                return
            buf = d.unused_data
    else:
        # uncompressed: records delimited by the version line
        pos = 0
        while True:
            nxt = raw.find(b"WARC/1.", pos + 1)
            if pos == 0 and not raw.startswith(b"WARC/1."):
                pos = raw.find(b"WARC/1.")
                if pos < 0:
                    return
                continue
            yield raw[pos : nxt if nxt > 0 else len(raw)]
            if nxt < 0:
                return
            pos = nxt


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = (
                v.strip().decode("latin-1", "replace")
            )
    return headers


def _dechunk(body: bytes) -> bytes:
    """Decode HTTP/1.1 chunked transfer encoding (sequential, stdlib)."""
    out = bytearray()
    pos = 0
    while pos < len(body):
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            break
        try:
            size = int(body[pos:eol].split(b";")[0], 16)
        except ValueError:
            break
        if size == 0:
            break
        out += body[eol + 2 : eol + 2 + size]
        pos = eol + 2 + size + 2  # skip chunk + trailing CRLF
    return bytes(out)


def parse_warc_record(member: bytes, max_record_bytes: int) -> dict | None:
    """One WARC record -> a page dict, or None for non-response records."""
    import email.utils

    head_end = member.find(b"\r\n\r\n")
    if head_end < 0:
        return None
    warc_headers = _parse_headers(member[:head_end])
    if warc_headers.get("warc-type") != "response":
        return None
    url = warc_headers.get("warc-target-uri")
    if not url:
        return None
    payload = member[head_end + 4 :]
    # the WARC Content-Length bounds the payload; without it the record's
    # trailing \r\n\r\n separator would leak into the HTTP body
    try:
        clen = int(warc_headers.get("content-length", ""))
        payload = payload[:clen]
    except ValueError:
        if payload.endswith(b"\r\n\r\n"):
            payload = payload[:-4]
    # payload = HTTP response: status line + headers + body
    http_end = payload.find(b"\r\n\r\n")
    if http_end < 0:
        return None
    status_block = payload[:http_end]
    status_line = status_block.split(b"\r\n", 1)[0]
    try:
        status = int(status_line.split()[1])
    except (IndexError, ValueError):
        return None
    http_headers = _parse_headers(status_block)
    body = payload[http_end + 4 :]
    if "chunked" in http_headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    if http_headers.get("content-encoding", "").lower() == "gzip":
        try:
            body = gzip.decompress(body)
        except OSError:
            pass  # keep raw bytes; extractor's utf-8-replace copes
    truncated = len(body) > max_record_bytes
    if truncated:
        body = body[:max_record_bytes]
    ts = None
    raw_ts = warc_headers.get("warc-date")
    if raw_ts:
        import datetime

        try:
            ts = datetime.datetime.fromisoformat(
                raw_ts.replace("Z", "+00:00")
            ).replace(tzinfo=None)
        except ValueError:
            ts = None
    ctype = http_headers.get("content-type", "").split(";")[0].strip()
    return {
        "url": url,
        "warc_ts": ts,
        "html": body,
        "http_status": status,
        "content_type": ctype,
        "truncated": truncated,
    }


def read_warc(
    spark: SparkSession,
    path: str,
    max_record_bytes: int = 4 << 20,
    html_only: bool = True,
    ok_only: bool = True,
) -> DataFrame:
    """WARC files under `path` -> pages DataFrame in the engine's input
    shape (url, warc_ts, html, text, lang, + provenance columns).

    `text` is left null and `lang` empty: extraction happens inside
    build_docs (the frozen byte-identical extractor reads the html
    column), and language id is `textops.langid` — keeping this source a
    pure container decoder with one well-defined output per record.
    Compose: `build_index(spark, read_warc(spark, path), ...)`."""
    files = spark.read.format("binaryFile").load(path)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_PAGE_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for fname, raw in zip(pdf["path"], pdf["content"]):
                for member in _split_warc_members(bytes(raw)):
                    rec = parse_warc_record(member, max_record_bytes)
                    if rec is None:
                        continue
                    if ok_only and not 200 <= rec["http_status"] < 300:
                        continue
                    if html_only and rec["content_type"] not in (
                        "text/html", "application/xhtml+xml", "",
                    ):
                        continue
                    rows.append(
                        (
                            rec["url"], rec["warc_ts"], rec["html"], None,
                            "", rec["http_status"], rec["content_type"],
                            rec["truncated"], fname,
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return files.select("path", "content").mapInPandas(
        _decode, schema=WARC_PAGE_SCHEMA
    )


def write_warc(records: list[dict], compress: bool = True) -> bytes:
    """Minimal WARC writer (tests + round-trips): each record a
    `response` member with an HTTP/1.1 200 payload. `records`:
    [{url, date_iso, body(bytes), content_type?}]."""
    out = bytearray()
    for r in records:
        body = r["body"]
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: "
            + r.get("content_type", "text/html").encode()
            + b"\r\nContent-Length: "
            + str(len(body)).encode()
            + b"\r\n\r\n"
            + body
        )
        warc = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: " + r["url"].encode() + b"\r\n"
            b"WARC-Date: " + r["date_iso"].encode() + b"\r\n"
            b"Content-Type: application/http; msgtype=response\r\n"
            b"Content-Length: " + str(len(http)).encode() + b"\r\n"
            b"\r\n" + http + b"\r\n\r\n"
        )
        out += gzip.compress(bytes(warc)) if compress else warc
    return bytes(out)


# ------------------------------------------------------------- WET variant

def parse_wet_record(member: bytes, max_record_bytes: int) -> dict | None:
    """One WET record -> a page dict, or None for non-conversion records.

    WET is Common Crawl's extracted-text sibling of WARC: `conversion`
    members whose payload is the page text directly (no HTTP envelope),
    with the source url in WARC-Target-URI. Same member framing, so the
    gzip-member splitter is shared with the WARC reader."""
    head_end = member.find(b"\r\n\r\n")
    if head_end < 0:
        return None
    warc_headers = _parse_headers(member[:head_end])
    if warc_headers.get("warc-type") != "conversion":
        return None
    url = warc_headers.get("warc-target-uri")
    if not url:
        return None
    payload = member[head_end + 4 :]
    try:
        clen = int(warc_headers.get("content-length", ""))
        payload = payload[:clen]
    except ValueError:
        if payload.endswith(b"\r\n\r\n"):
            payload = payload[:-4]
    truncated = len(payload) > max_record_bytes
    if truncated:
        payload = payload[:max_record_bytes]
    ts = None
    raw_ts = warc_headers.get("warc-date")
    if raw_ts:
        import datetime

        try:
            ts = datetime.datetime.fromisoformat(
                raw_ts.replace("Z", "+00:00")
            ).replace(tzinfo=None)
        except ValueError:
            ts = None
    return {
        "url": url,
        "warc_ts": ts,
        "text": payload.decode("utf-8", "replace"),
        "content_type": warc_headers.get("content-type", "text/plain"),
        "truncated": truncated,
    }


def read_wet(
    spark: SparkSession,
    path: str,
    max_record_bytes: int = 4 << 20,
) -> DataFrame:
    """WET files under `path` -> pages DataFrame in the engine's input
    shape. `text` carries the record payload and `html` is NULL — the
    extractor prefers html when present, so a null html column is exactly
    what routes these rows straight through as pre-extracted text.
    http_status is null (WET records never saw an HTTP envelope)."""
    files = spark.read.format("binaryFile").load(path)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_PAGE_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for fname, raw in zip(pdf["path"], pdf["content"]):
                for member in _split_warc_members(bytes(raw)):
                    rec = parse_wet_record(member, max_record_bytes)
                    if rec is None:
                        continue
                    rows.append(
                        (
                            rec["url"], rec["warc_ts"], None, rec["text"],
                            "", None, rec["content_type"],
                            rec["truncated"], fname,
                        )
                    )
            yield pd.DataFrame(rows, columns=cols).astype(
                {"http_status": "Int32"}
            )

    return files.select("path", "content").mapInPandas(
        _decode, schema=WARC_PAGE_SCHEMA
    )


def write_wet(records: list[dict], compress: bool = True) -> bytes:
    """Minimal WET writer (tests + round-trips): each record a
    `conversion` member. `records`: [{url, date_iso, text(str)}]."""
    out = bytearray()
    for r in records:
        body = r["text"].encode("utf-8")
        warc = (
            b"WARC/1.0\r\n"
            b"WARC-Type: conversion\r\n"
            + f"WARC-Target-URI: {r['url']}\r\n".encode()
            + f"WARC-Date: {r['date_iso']}\r\n".encode()
            + b"Content-Type: text/plain\r\n"
            + f"Content-Length: {len(body)}\r\n".encode()
            + b"\r\n"
        )
        member = warc + body + b"\r\n\r\n"
        out += gzip.compress(member) if compress else member
    return bytes(out)
