"""WARC (Web ARChive, ISO 28500) record writer + splitter for the
Common-Crawl-style pages pipeline.

The north-star input is "an Iceberg table of Common-Crawl-style web
pages"; the on-disk interchange format for such corpora is WARC —
concatenated `WARC/1.0` records, each carrying an HTTP response block,
optionally compressed as per-record gzip members (the Common Crawl
layout).  This module gives the engine both directions:

* ``record_bytes_udf`` / ``pack_warc``  — serialize rows of the pages
  table into genuine WARC response records and group them into archive
  blobs (one blob ≡ one .warc / .warc.gz file segment), every other blob
  gzip-member-compressed so both on-disk layouts are exercised;
* ``parse_warc_blobs``  — the reader: an Arrow-batched ``mapInPandas``
  splitter that walks raw-or-gzipped blobs record by record
  (header block → ``Content-Length`` → payload), parses the embedded
  HTTP response, and yields one row per ``WARC-Type: response`` record.

At cluster scale the same ``parse_warc_blobs`` runs unchanged over
``spark.read.format("binaryFile")`` on a 100 TB .warc.gz bucket
(see ``read_warc_dir``): blobs are processed independently per task, no
shuffle, and the emitted rows carry only narrow parsed columns so the
multi-kB payload bytes die with the task.  Determinism: record layout is
a closed form of the row (url, ts, body), so a writer→reader roundtrip
is verifiable against an arithmetic oracle (driver query
``src_warc_roundtrip``).
"""

from __future__ import annotations

import gzip
import hashlib
import zlib
from collections.abc import Iterator
from datetime import datetime, timedelta, timezone

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)
_GZIP_MAGIC = b"\x1f\x8b"

# Parsed-record schema produced by parse_warc_blobs / read_warc_dir.
PARSED_SCHEMA = (
    "url string, warc_date string, http_status int, "
    "content_length bigint, body_md5 string"
)


def doc_url(doc_id: int, n_hosts: int = 32) -> str:
    """Closed-form URL for a synthesized page (shared with the oracle)."""
    return f"https://host{doc_id % n_hosts}.example/doc/{doc_id}"


def doc_date(doc_id: int) -> str:
    """Closed-form WARC-Date (UTC, second granularity) for a page."""
    return (_EPOCH + timedelta(seconds=int(doc_id))).strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )


def build_record(url: str, warc_date: str, body: bytes) -> bytes:
    """One WARC/1.0 response record: WARC header block + HTTP response
    block, CRLF-delimited, trailed by the mandatory blank records
    separator (WARC spec §4: two CRLFs after the payload)."""
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=utf-8\r\n"
        + b"Content-Length: %d\r\n\r\n" % len(body)
        + body
    )
    rid = hashlib.md5(url.encode()).hexdigest()
    warc_hdr = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:md5:{rid}>\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {warc_date}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode()
    return warc_hdr + http + b"\r\n\r\n"


def pack_warc(docs: DataFrame, recs_per_blob: int = 64) -> DataFrame:
    """documents(doc_id, text) → (blob_id bigint, blob binary): WARC
    records serialized per row and concatenated doc_id-ascending into
    archive blobs; odd blob_ids are per-record gzip members (the
    Common Crawl .warc.gz layout), even blob_ids stay raw.

    Shuffle shape: one groupBy on blob_id (the records of a blob must
    be adjacent by definition of the file format); record bytes are
    built map-side first so the shuffle moves serialized payloads once.
    """

    def _records(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs = [
                build_record(
                    doc_url(int(i)), doc_date(int(i)), t.encode("utf-8")
                )
                for i, t in zip(pdf["doc_id"], pdf["text"])
            ]
            yield pd.DataFrame(
                {
                    "blob_id": pdf["doc_id"] // recs_per_blob,
                    "doc_id": pdf["doc_id"],
                    "rec": recs,
                }
            )

    def _pack(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        gz = int(key[0]) % 2 == 1
        if gz:
            blob = b"".join(
                gzip.compress(r, mtime=0) for r in pdf["rec"]
            )
        else:
            blob = b"".join(pdf["rec"])
        return pd.DataFrame({"blob_id": [int(key[0])], "blob": [blob]})

    recs = docs.select("doc_id", "text").mapInPandas(
        _records, "blob_id bigint, doc_id bigint, rec binary"
    )
    return recs.groupBy("blob_id").applyInPandas(
        _pack, "blob_id bigint, blob binary"
    )


def _split_records(raw: bytes) -> Iterator[tuple[dict, bytes]]:
    """Walk a raw (uncompressed) WARC stream: yield (headers, payload)
    per record, advancing strictly by Content-Length — never by
    scanning payload bytes for a magic string (payloads may embed
    anything, including 'WARC/1.0')."""
    pos, n = 0, len(raw)
    while pos < n:
        # Tolerate inter-record padding / trailing separators.
        while pos < n and raw[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            return
        end_hdr = raw.find(b"\r\n\r\n", pos)
        if end_hdr < 0:
            return  # truncated trailing garbage: stop, don't raise
        lines = raw[pos:end_hdr].decode("utf-8", "replace").split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            return
        hdrs: dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            hdrs[k.strip().lower()] = v.strip()
        try:
            clen = int(hdrs.get("content-length", "0"))
        except ValueError:
            return  # malformed length: records past it can't be located —
            # stop this stream, don't fail the task (real buckets carry
            # the occasional mangled header)
        if clen < 0:
            return  # negative length is equally mangled — and would rewind
            # pos, re-yielding the same record in an unbounded loop
        body_start = end_hdr + 4
        yield hdrs, raw[body_start : body_start + clen]
        pos = body_start + clen


def _gunzip_members(blob: bytes) -> bytes:
    """Inflate a concatenation of gzip members (Common Crawl's
    .warc.gz layout) into one raw stream."""
    out, data = [], blob
    while data[:2] == _GZIP_MAGIC:
        d = zlib.decompressobj(wbits=31)
        try:
            out.append(d.decompress(data))
        except zlib.error:
            break  # truncated/corrupt member (cut-off final member is
            # routine in real .warc.gz buckets): keep the records that
            # inflated cleanly, skip the rest of this blob
        data = d.unused_data
    return b"".join(out)


def _parse_http(payload: bytes) -> tuple[int, bytes]:
    """HTTP response block → (status, body). Body length comes from the
    header/body split, not Content-Length, so the parser also reads
    truncation honestly."""
    split = payload.find(b"\r\n\r\n")
    if split < 0:
        return 0, b""
    status_line = payload[: payload.find(b"\r\n")].decode("ascii", "replace")
    parts = status_line.split(" ")
    status = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else 0
    return status, payload[split + 4 :]


def parse_warc_blobs(blobs: DataFrame, blob_col: str = "blob") -> DataFrame:
    """(… blob binary …) → one row per WARC response record.

    mapInPandas, no shuffle: each archive blob is split and parsed
    inside its task; only PARSED_SCHEMA's narrow columns leave."""

    def _parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for blob in pdf[blob_col]:
                raw = bytes(blob)
                if raw[:2] == _GZIP_MAGIC:
                    raw = _gunzip_members(raw)
                for hdrs, payload in _split_records(raw):
                    if hdrs.get("warc-type") != "response":
                        continue
                    status, body = _parse_http(payload)
                    rows.append(
                        (
                            hdrs.get("warc-target-uri", ""),
                            hdrs.get("warc-date", ""),
                            status,
                            len(body),
                            hashlib.md5(body).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "url",
                    "warc_date",
                    "http_status",
                    "content_length",
                    "body_md5",
                ],
            )

    return blobs.select(blob_col).mapInPandas(_parse, PARSED_SCHEMA)


def read_warc_dir(spark, path: str) -> DataFrame:
    """Read a directory of .warc / .warc.gz files the cluster way:
    binaryFile source (splittable listing, one task per file) into the
    same splitter that parses synthetic blobs."""
    files = spark.read.format("binaryFile").load(path)
    return parse_warc_blobs(files.select(F.col("content").alias("blob")))


# -------------------------------------------------------------- MIME sniff

# ASCII-only magics so UTF-8 encode() yields identical bytes in both
# engines (multi-byte magic like PNG's \\x89 would re-encode differently
# than the on-wire byte).
_MAGICS = [
    ("application/pdf", "%PDF-"),
    ("image/gif", "GIF89a"),
    ("application/zip", "PK\x03\x04"),
    ("text/html", "<!DOCTYPE"),
    ("application/xml", "<?xml"),
]


def mime_sniff(pages: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Magic-number MIME sniffing over opaque fetched bytes — the
    content-type triage a fetcher runs BEFORE routing to parsers (the
    reference trusts the server's Content-Type header and its two
    verticals; real crawls meet lying servers, so sniff bytes).  The
    whole classifier is hex-prefix CASE arms on the binary column:
    JVM-side, shuffle-free, no decode of the payload body."""
    # hex ONLY the magic-length binary prefix — substring works on binary,
    # so hex() never materializes a 2x-size string copy of a multi-MB
    # payload just to compare <10 chars
    max_len = max(len(m) for _, m in _MAGICS)
    h = F.hex(F.substring(F.col(payload_col), 1, max_len))
    expr = F.lit("text/plain")
    for mime, magic in reversed(_MAGICS):
        mh = magic.encode("utf-8").hex().upper()
        expr = F.when(F.substring(h, 1, len(mh)) == mh, F.lit(mime)).otherwise(
            expr
        )
    return pages.select(
        *[c for c in pages.columns if c != payload_col],
        expr.alias("mime"),
        F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
    )


def mime_sniff_sql(pages_sql: str, payload_col: str = "payload") -> str:
    # DuckDB has no BLOB substr, so the oracle hexes the whole payload —
    # fine at oracle scale (sf0.01); only the Spark side is the scale path
    arms = []
    for mime, magic in _MAGICS:
        mh = magic.encode("utf-8").hex().upper()
        arms.append(
            f"WHEN substr(hex({payload_col}), 1, {len(mh)}) = '{mh}'"
            f" THEN '{mime}'"
        )
    case = "CASE " + " ".join(arms) + " ELSE 'text/plain' END"
    return f"""
    SELECT * EXCLUDE ({payload_col}), {case} AS mime,
           octet_length({payload_col})::BIGINT AS n_bytes
    FROM ({pages_sql})
    """


# ---------------------------------------------------------------- CDX/SURT


def cdx_index(captures: DataFrame) -> DataFrame:
    """CDX-style capture index rows with SURT keys (Sort-friendly URL
    Reordering Transform: host labels reversed and comma-joined, so one
    sorted file clusters every capture of a domain and its subdomains
    together — the layout the Wayback/pywb ecosystem queries by prefix).
    Input: (url, host, path, ts_s, digest); output adds ``surt``.
    Pure string/array expressions, shuffle-free; the sort itself is the
    consumer's write-time ORDER BY."""
    surt = F.concat(
        F.array_join(F.reverse(F.split(F.col("host"), "\\.")), ","),
        F.lit(")"),
        F.col("path"),
    )
    return captures.select(
        surt.alias("surt"),
        "url",
        F.col("ts_s").cast("long").alias("ts_s"),
        "digest",
    )


def cdx_index_sql(captures_sql: str) -> str:
    return f"""
    SELECT array_to_string(list_reverse(string_split(host, '.')), ',')
             || ')' || path AS surt,
           url, ts_s::BIGINT AS ts_s, digest
    FROM ({captures_sql})
    """


# ------------------------------------------------------------- WET channel

WET_SCHEMA = (
    "url string, warc_date string, refers_to string, "
    "text_len bigint, text_md5 string"
)


def build_wet_record(url: str, warc_date: str, text: bytes) -> bytes:
    """One WARC/1.0 `conversion` record — the WET (extracted-text)
    sibling Common Crawl publishes next to every .warc.gz.  The
    WARC-Refers-To header links back to the response record it was
    derived from (WARC spec §6.7)."""
    rid = hashlib.md5(url.encode() + b"/wet").hexdigest()
    ref = hashlib.md5(url.encode()).hexdigest()
    hdr = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        f"WARC-Record-ID: <urn:md5:{rid}>\r\n"
        f"WARC-Refers-To: <urn:md5:{ref}>\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {warc_date}\r\n"
        "Content-Type: text/plain\r\n"
        f"Content-Length: {len(text)}\r\n\r\n"
    ).encode()
    return hdr + text + b"\r\n\r\n"


def pack_wet(blobs: DataFrame, blob_col: str = "blob") -> DataFrame:
    """WARC response blobs → WET conversion blobs, blob-for-blob: each
    task splits its archive, derives one `conversion` record per
    `response` record (text/plain bodies pass through; an HTML corpus
    would route through functions/extract first), and re-concatenates —
    the exact shape of a production WET-generation job: ZERO shuffle,
    100 TB of archives stream through map tasks and only same-sized
    text blobs come out."""

    def _conv(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for bid, blob in zip(pdf["blob_id"], pdf[blob_col]):
                raw = bytes(blob)
                if raw[:2] == _GZIP_MAGIC:
                    raw = _gunzip_members(raw)
                recs = []
                for hdrs, payload in _split_records(raw):
                    if hdrs.get("warc-type") != "response":
                        continue
                    _, body = _parse_http(payload)
                    recs.append(
                        build_wet_record(
                            hdrs.get("warc-target-uri", ""),
                            hdrs.get("warc-date", ""),
                            body,
                        )
                    )
                out.append((int(bid), b"".join(recs)))
            yield pd.DataFrame(out, columns=["blob_id", "blob"])

    return blobs.select("blob_id", blob_col).mapInPandas(
        _conv, "blob_id bigint, blob binary"
    )


def parse_wet_blobs(blobs: DataFrame, blob_col: str = "blob") -> DataFrame:
    """(… blob binary …) → one row per WET conversion record; narrow
    columns only, no shuffle (same reader pattern as parse_warc_blobs)."""

    def _parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for blob in pdf[blob_col]:
                raw = bytes(blob)
                if raw[:2] == _GZIP_MAGIC:
                    raw = _gunzip_members(raw)
                for hdrs, payload in _split_records(raw):
                    if hdrs.get("warc-type") != "conversion":
                        continue
                    rows.append(
                        (
                            hdrs.get("warc-target-uri", ""),
                            hdrs.get("warc-date", ""),
                            hdrs.get("warc-refers-to", ""),
                            len(payload),
                            hashlib.md5(payload).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "warc_date", "refers_to", "text_len", "text_md5",
                ],
            )

    return blobs.select(blob_col).mapInPandas(_parse, WET_SCHEMA)
