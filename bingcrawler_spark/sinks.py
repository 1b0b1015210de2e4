"""Training-corpus export sinks.

The reference emits its analysis results as driver-side text reports
(`CommonAnalysis.textToFile`, `BingDataAnalysis` report loop) — a shape
that cannot leave one machine.  The web-scale equivalent is the sharded
JSONL corpus: the interchange format LLM training stacks consume (one
JSON object per line, fixed shard count, a manifest with per-shard
counts and checksums so a 100 TB export is verifiable without re-reading
it).

Design for scale:
* shard assignment is a pure column expression on the doc id (md5-based,
  engine-independent) — no shuffle beyond the final shard-aligned write;
* `write_jsonl_corpus` repartitions BY SHARD and streams each shard
  through Spark's text writer — no driver collection, no per-row Python;
* the manifest aggregates (count, token sum, content hash) per shard —
  the hash is a two-level chunked (Merkle) md5 fold, so no task ever
  materializes a whole shard's bytes: chunk width bounds task memory,
  shard count bounds the serial work;
* `jsonl_manifest_sql` re-derives every byte in DuckDB, so the whole
  serialize→shard→checksum path is cross-engine hash-verified.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# JSON string-escape table, applied in this exact order in both engines
# (backslash first, or later rules would double-escape its output).
_ESCAPES = [("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t")]
# RFC 8259 forbids RAW control chars inside JSON strings; the remaining
# C0 set (rare in web text, but one \x0c form-feed breaks a consumer's
# json.loads on the whole shard line) escapes as \u00XX.
_CTRL_ESCAPES = [
    (chr(c), "\\u%04x" % c) for c in range(0x20) if chr(c) not in "\n\r\t"
]
_CTRL_RE = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"
# token split: an EXPLICIT class, not \s — Java's \s includes \x0B,
# RE2's (DuckDB's) does not, so \s silently diverges on vertical tabs
_WS_RE = "[ \\t\\n\\r\\f\\x0B]+"


def _json_escape(col: Column) -> Column:
    fast = col
    for raw, esc in _ESCAPES:
        fast = F.replace(fast, F.lit(raw), F.lit(esc))
    # the 27-replace control-char chain costs ~27 string passes, so gate
    # it behind one regex test — clean rows (virtually all of a 100 TB
    # corpus) pay a single scan, dirty rows pay the full chain
    slow = fast
    for raw, esc in _CTRL_ESCAPES:
        slow = F.replace(slow, F.lit(raw), F.lit(esc))
    return F.when(col.rlike(_CTRL_RE), slow).otherwise(fast)


def _shard_col(id_col: Column, n_shards: int) -> Column:
    """Deterministic md5-derived shard id — identical in Spark and
    DuckDB, uniform across ids (first md5 byte mod n_shards)."""
    return (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 2), 16, 10).cast("int")
        % n_shards
    )


def jsonl_lines(
    docs: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, text) → (doc_id, shard_id, n_tokens, line) where `line` is
    the serialized training record `{"id":<id>,"text":"<escaped>"}`.
    Pure column expressions — serialization never leaves the JVM."""
    did = F.col(id_col)
    text = F.col(text_col)
    line = F.concat(
        F.lit('{"id":'),
        did.cast("string"),
        F.lit(',"text":"'),
        _json_escape(text),
        F.lit('"}'),
    )
    n_tokens = F.size(F.split(F.trim(text), _WS_RE))
    return docs.select(
        did.alias("doc_id"),
        _shard_col(did, n_shards).alias("shard_id"),
        n_tokens.alias("n_tokens"),
        line.alias("line"),
    )


CHUNK_DOCS = 1024  # manifest Merkle-chunk width (docs per chunk)


def _manifest_from_lines(lines: DataFrame, chunk_docs: int = CHUNK_DOCS) -> DataFrame:
    """Two-level Merkle fold over pre-serialized (doc_id, shard_id,
    n_tokens, line) rows — see :func:`jsonl_manifest`."""
    ordered = F.transform(
        F.sort_array(F.collect_list(F.struct("doc_id", "line"))),
        lambda x: x["line"],
    )
    chunked = lines.groupBy(
        "shard_id", F.expr(f"div(doc_id, {chunk_docs})").alias("chunk")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.md5(F.array_join(ordered, "\n")).alias("chunk_md5"),
    )
    ordered_chunks = F.transform(
        F.sort_array(F.collect_list(F.struct("chunk", "chunk_md5"))),
        lambda x: x["chunk_md5"],
    )
    return chunked.groupBy("shard_id").agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.md5(F.array_join(ordered_chunks, "\n")).alias("content_md5"),
    )


def jsonl_manifest(
    docs: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_docs: int = CHUNK_DOCS,
) -> DataFrame:
    """Per-shard manifest: (shard_id, n_docs, n_tokens, content_md5).

    content_md5 is a TWO-LEVEL Merkle fold: md5 of the newline-joined
    lines within each ``div(doc_id, chunk_docs)`` chunk (doc-id order),
    then md5 of the newline-joined chunk hashes (chunk order).  A
    consumer verifies a downloaded shard by re-chunking on the ids
    embedded in each line and re-deriving both levels.  A single flat
    md5-of-all-lines would need one task to materialize the WHOLE shard
    (~TBs at corpus scale); here task memory is bounded by chunk_docs
    and the level-2 fold sees only 32-byte hashes — shard count bounds
    the serial work, chunk width bounds the memory."""
    return _manifest_from_lines(
        jsonl_lines(docs, n_shards, id_col, text_col), chunk_docs
    )


def jsonl_manifest_sql(
    docs_sql: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_docs: int = CHUNK_DOCS,
) -> str:
    """DuckDB twin of :func:`jsonl_manifest` — same escapes, same shard
    math, same two-level chunked md5 fold."""
    # DuckDB single-quoted literals take backslashes verbatim; control
    # chars are spelled chr(); only ' needs doubling.
    def lit(s: str) -> str:
        if len(s) == 1 and ord(s) < 0x20:
            return f"chr({ord(s)})"
        return "'" + s.replace("'", "''") + "'"

    def chain(expr: str, table: list[tuple[str, str]]) -> str:
        for raw, out in table:
            expr = f"replace({expr}, {lit(raw)}, {lit(out)})"
        return expr

    fast = chain(text_col, _ESCAPES)
    # same fast/slow gate as the Spark side (identical output either way;
    # the gate only matters for cost, but keeping the shapes twinned makes
    # the cross-engine contract auditable)
    esc = (
        f"CASE WHEN regexp_matches({text_col}, '{_CTRL_RE}') "
        f"THEN {chain(fast, _CTRL_ESCAPES)} ELSE {fast} END"
    )
    return f"""
    WITH lines AS (
      SELECT {id_col} AS doc_id,
             ('0x' || substr(md5({id_col}::VARCHAR), 1, 2))::INT % {n_shards}
               AS shard_id,
             len(regexp_split_to_array(trim({text_col}), '{_WS_RE}')) AS n_tokens,
             '{{"id":' || {id_col}::VARCHAR || ',"text":"' || {esc} || '"}}'
               AS line
      FROM ({docs_sql})
    ), chunks AS (
      SELECT shard_id, doc_id // {chunk_docs} AS chunk,
             count(*)::BIGINT AS n_docs,
             sum(n_tokens)::BIGINT AS n_tokens,
             md5(string_agg(line, chr(10) ORDER BY doc_id)) AS chunk_md5
      FROM lines GROUP BY shard_id, chunk
    )
    SELECT shard_id, sum(n_docs)::BIGINT AS n_docs,
           sum(n_tokens)::BIGINT AS n_tokens,
           md5(string_agg(chunk_md5, chr(10) ORDER BY chunk)) AS content_md5
    FROM chunks GROUP BY shard_id
    """


def write_jsonl_corpus(
    docs: DataFrame,
    path: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_docs: int = CHUNK_DOCS,
) -> DataFrame:
    """Write the corpus as `path/shard_id=K/*.txt` JSONL shard dirs and
    return the manifest.  One shuffle (repartition by shard), then each
    shard streams through the text writer sorted by doc id — at 100 TB
    this is the standard export plan: shard files land in parallel, and
    the manifest is the only thing a consumer must read to verify.

    The serialized lines persist across the two consumers (shard write
    + manifest fold) so the escape/serialize chain — the most expensive
    transformation in the export — runs over the corpus once, not
    twice; the manifest (n_shards rows) materializes eagerly so the
    cache releases before returning."""
    lines = jsonl_lines(docs, n_shards, id_col, text_col).persist()
    (
        lines.repartition(n_shards, "shard_id")
        .sortWithinPartitions("shard_id", "doc_id")
        .select("shard_id", "line")
        .write.partitionBy("shard_id")
        .mode("overwrite")
        .text(path)
    )
    manifest = _manifest_from_lines(lines, chunk_docs).localCheckpoint(eager=True)
    lines.unpersist()
    return manifest
