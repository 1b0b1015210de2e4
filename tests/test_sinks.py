"""JSONL corpus sink: escaping torture cases vs the DuckDB twin, plus
the written shard files byte-verified against the manifest checksums."""

import glob
import hashlib
import json
import os
import tempfile

import duckdb

from bingcrawler_spark import sinks as SK

# text designed to break naive escaping: quotes, backslashes, newlines,
# tabs, CR, already-escaped-looking sequences
_DOCS = [
    (1, 'plain words here'),
    (2, 'a "quoted" phrase'),
    (3, 'back\\slash and \\n literal'),
    (4, 'real\nnewline and\ttab'),
    (5, 'carriage\rreturn'),
    (6, 'mix: "\\" then \n then \\"'),
    (7, ''),
    (8, '  padded  '),
    # RFC 8259: raw C0 control chars are illegal inside JSON strings —
    # these rows break json.loads unless escaped as \u00XX in BOTH engines
    (9, 'form\x0cfeed and back\x08space'),
    (10, 'bell\x07 escape\x1b unit-sep\x1f vtab\x0b'),
]


def _df(spark):
    return spark.createDataFrame(_DOCS, "doc_id long, text string")


def test_jsonl_lines_are_valid_json(spark):
    rows = SK.jsonl_lines(_df(spark), n_shards=4).collect()
    assert len(rows) == len(_DOCS)
    docs = dict(_DOCS)
    for r in rows:
        obj = json.loads(r["line"])  # escaping must be round-trippable
        assert obj["id"] == r["doc_id"]
        assert obj["text"] == docs[r["doc_id"]]
        assert 0 <= r["shard_id"] < 4


def test_manifest_matches_duckdb(spark):
    got = sorted(tuple(r) for r in SK.jsonl_manifest(_df(spark), 4).collect())
    con = duckdb.connect()
    con.register("docs", _df(spark).toPandas())
    want = sorted(
        tuple(r)
        for r in con.sql(
            SK.jsonl_manifest_sql("SELECT doc_id, text FROM docs", 4)
        ).fetchall()
    )
    assert got == want


def test_written_shards_verify_against_manifest(spark):
    out = os.path.join(tempfile.mkdtemp(), "corpus")
    # chunk_docs=2 forces multiple Merkle chunks per shard so the
    # two-level consumer derivation below is exercised for real
    manifest = {
        r["shard_id"]: r
        for r in SK.write_jsonl_corpus(
            _df(spark), out, n_shards=4, chunk_docs=2
        ).collect()
    }
    total = 0
    for shard_dir in glob.glob(os.path.join(out, "shard_id=*")):
        sid = int(shard_dir.rsplit("=", 1)[1])
        lines = []
        for f in sorted(glob.glob(os.path.join(shard_dir, "part-*"))):
            with open(f, "rb") as fh:
                lines += fh.read().decode().splitlines()
        total += len(lines)
        m = manifest[sid]
        assert m["n_docs"] == len(lines)
        # consumer-side verification: re-chunk the downloaded file on the
        # ids embedded in each line, md5 per chunk (doc-id order), then
        # md5 the chunk hashes (chunk order) — the manifest's two-level
        # Merkle contract
        by_chunk: dict[int, list[tuple[int, str]]] = {}
        for ln in lines:
            did = json.loads(ln)["id"]
            by_chunk.setdefault(did // 2, []).append((did, ln))
        chunk_md5s = [
            hashlib.md5(
                "\n".join(ln for _, ln in sorted(by_chunk[c])).encode()
            ).hexdigest()
            for c in sorted(by_chunk)
        ]
        assert m["content_md5"] == hashlib.md5(
            "\n".join(chunk_md5s).encode()
        ).hexdigest()
        # shard files round-trip to the original docs
        docs = dict(_DOCS)
        for ln in lines:
            obj = json.loads(ln)
            assert obj["text"] == docs[obj["id"]]
    assert total == len(_DOCS)
