"""WARC writer/splitter: byte-level roundtrips, both compression
layouts, non-response records, truncation, and the binaryFile dir path."""

import gzip
import hashlib

import pytest

from bingcrawler_spark import warc as W


def test_build_record_layout():
    body = "héllo page".encode("utf-8")
    rec = W.build_record("https://h.example/x", "2024-01-01T00:00:07Z", body)
    assert rec.startswith(b"WARC/1.0\r\nWARC-Type: response\r\n")
    assert rec.endswith(b"\r\n\r\n")
    # WARC Content-Length covers exactly the HTTP block.
    hdr_end = rec.find(b"\r\n\r\n") + 4
    clen = int(
        [
            ln.split(b":")[1]
            for ln in rec[: hdr_end - 4].split(b"\r\n")
            if ln.lower().startswith(b"content-length")
        ][0]
    )
    http = rec[hdr_end : hdr_end + clen]
    assert http.startswith(b"HTTP/1.1 200 OK\r\n")
    assert http.endswith(body)


def _parse_raw(raw: bytes):
    return [
        (h.get("warc-target-uri"), W._parse_http(p))
        for h, p in W._split_records(raw)
    ]


def test_split_respects_content_length_not_magic_scan():
    # A body that EMBEDS a fake record header must not split the stream.
    evil = b"before WARC/1.0\r\nWARC-Type: response\r\n\r\n after"
    raw = W.build_record("https://a.example/1", "2024-01-01T00:00:00Z", evil)
    raw += W.build_record("https://a.example/2", "2024-01-01T00:00:01Z", b"x")
    out = _parse_raw(raw)
    assert [u for u, _ in out] == ["https://a.example/1", "https://a.example/2"]
    assert out[0][1] == (200, evil)


def test_split_skips_non_response_and_tolerates_truncation():
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nabcd\r\n\r\n"
    )
    good = W.build_record("https://a.example/9", "2024-01-01T00:00:09Z", b"ok")
    raw = info + good + b"WARC/1.0\r\nWARC-Type: resp"  # truncated tail
    recs = list(W._split_records(raw))
    assert [h["warc-type"] for h, _ in recs] == ["warcinfo", "response"]


def test_split_rejects_negative_content_length():
    """A negative Content-Length would rewind the scan position onto the
    record's own header — without the guard the parser re-yields the same
    record forever.  Mangled-length streams stop cleanly instead."""
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: -66\r\n\r\nbody"
    )
    assert list(W._split_records(bad)) == []
    good = W.build_record("https://a.example/1", "2024-01-01T00:00:00Z", b"ok")
    # records BEFORE the mangled one still parse; the stream stops there
    recs = list(W._split_records(good + bad))
    assert [h["warc-type"] for h, _ in recs] == ["response"]


def test_gzip_members_roundtrip():
    r1 = W.build_record("https://g.example/1", "2024-01-01T00:00:00Z", b"one")
    r2 = W.build_record("https://g.example/2", "2024-01-01T00:00:01Z", b"two")
    blob = gzip.compress(r1, mtime=0) + gzip.compress(r2, mtime=0)
    assert W._gunzip_members(blob) == r1 + r2


@pytest.mark.usefixtures("spark")
def test_pack_parse_roundtrip_spark(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    expected = {
        (
            W.doc_url(r["doc_id"]),
            W.doc_date(r["doc_id"]),
            200,
            len(r["text"].encode("utf-8")),
            hashlib.md5(r["text"].encode("utf-8")).hexdigest(),
        )
        for r in docs.select("doc_id", "text").collect()
    }
    parsed = W.parse_warc_blobs(W.pack_warc(docs, recs_per_blob=16))
    got = {tuple(r) for r in parsed.collect()}
    assert got == expected


def test_read_warc_dir_binary_files(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    blobs = W.pack_warc(docs, recs_per_blob=32).collect()
    for r in blobs:
        ext = ".warc.gz" if bytes(r["blob"])[:2] == W._GZIP_MAGIC else ".warc"
        (tmp_path / f"part-{r['blob_id']:05d}{ext}").write_bytes(
            bytes(r["blob"])
        )
    n_docs = docs.count()
    out = W.read_warc_dir(spark, str(tmp_path))
    assert out.count() == n_docs
    assert set(out.columns) == {
        "url",
        "warc_date",
        "http_status",
        "content_length",
        "body_md5",
    }
    assert out.where("http_status != 200").count() == 0


# -------------------------------------------------------------- MIME sniff


def test_mime_sniff_magics(spark):
    from bingcrawler_spark import warc as WARC

    rows = [
        (0, b"%PDF-1.7\nxx"),
        (1, b"GIF89a...."),
        (2, b"PK\x03\x04zipdata"),
        (3, b"<!DOCTYPE html><html>"),
        (4, b'<?xml version="1.0"?><r/>'),
        (5, b"just some text"),
        (6, b"GIF89"),  # truncated magic -> plain
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: (r["mime"], r["n_bytes"])
           for r in WARC.mime_sniff(df).collect()}
    assert got[0] == ("application/pdf", 11)
    assert got[1][0] == "image/gif"
    assert got[2][0] == "application/zip"
    assert got[3][0] == "text/html"
    assert got[4][0] == "application/xml"
    assert got[5][0] == "text/plain"
    assert got[6][0] == "text/plain"


# ---------------------------------------------------------------- CDX/SURT


def test_cdx_surt_reverses_host_labels(spark):
    from bingcrawler_spark import warc as WARC

    df = spark.createDataFrame(
        [("https://a.b.example.com/x/y", "a.b.example.com", "/x/y", 5, "d1"),
         ("http://example.org/", "example.org", "/", 6, "d2")],
        "url string, host string, path string, ts_s long, digest string",
    )
    got = {r["url"]: r["surt"] for r in WARC.cdx_index(df).collect()}
    assert got["https://a.b.example.com/x/y"] == "com,example,b,a)/x/y"
    assert got["http://example.org/"] == "org,example)/"


def test_wet_record_layout_and_linkage():
    rec = W.build_wet_record("https://h.example/d/1", "2024-01-01T00:00:01Z",
                             b"hello text")
    hdrs, payload = next(W._split_records(rec))
    assert hdrs["warc-type"] == "conversion"
    assert payload == b"hello text"
    assert hdrs["warc-refers-to"] == (
        "<urn:md5:" + hashlib.md5(b"https://h.example/d/1").hexdigest() + ">"
    )
    # refers-to must equal the response record's WARC-Record-ID
    resp = W.build_record("https://h.example/d/1", "2024-01-01T00:00:01Z", b"x")
    rh, _ = next(W._split_records(resp))
    assert hdrs["warc-refers-to"] == rh["warc-record-id"]


def test_wet_convert_roundtrip_spark(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    expected = {
        (
            W.doc_url(r["doc_id"]),
            W.doc_date(r["doc_id"]),
            "<urn:md5:"
            + hashlib.md5(W.doc_url(r["doc_id"]).encode()).hexdigest()
            + ">",
            len(r["text"].encode("utf-8")),
            hashlib.md5(r["text"].encode("utf-8")).hexdigest(),
        )
        for r in docs.select("doc_id", "text").collect()
    }
    wet = W.parse_wet_blobs(W.pack_wet(W.pack_warc(docs, recs_per_blob=16)))
    got = {tuple(r) for r in wet.collect()}
    assert got == expected


def test_corrupt_gzip_member_keeps_clean_records():
    """A corrupt/truncated member mid-archive (routine in real .warc.gz
    buckets) must yield the records that inflated cleanly, not raise."""
    r1 = W.build_record("https://g.example/1", "2024-01-01T00:00:00Z", b"one")
    r2 = W.build_record("https://g.example/2", "2024-01-01T00:00:01Z", b"two")
    bad = bytearray(gzip.compress(r2, mtime=0))
    bad[10:-8] = b"\xff" * (len(bad) - 18)  # mangle the whole deflate body
    raw = W._gunzip_members(gzip.compress(r1, mtime=0) + bytes(bad))
    assert raw == r1
    assert [h["warc-target-uri"] for h, _ in W._split_records(raw)] == [
        "https://g.example/1"
    ]


def test_malformed_content_length_stops_stream_not_task():
    good = W.build_record("https://g.example/3", "2024-01-01T00:00:02Z", b"ok")
    bad = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: abc\r\n\r\nbody"
    recs = list(W._split_records(good + bad))
    assert [h["warc-target-uri"] for h, _ in recs] == ["https://g.example/3"]
