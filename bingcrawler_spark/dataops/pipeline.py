"""The composed webtext training-corpus pipeline — the end-to-end flow a
user of this engine actually runs over a crawled pages table:

    quality gate (Gopher/C4 rules) → exact dedup (md5 canonical)
    → near-dup drop (MinHash-LSH pairs, keep-smallest-id)
    → domain-mixture sampling → token accounting per source.

Each stage is the already-oracle-verified operator from this package;
this module chains them into ONE DataFrame plan (and one matching
DuckDB CTE chain), which is the real contract: stages compose without
materialization barriers, Catalyst sees the whole plan, and the narrow
manifests (doc_id-only semi-joins) keep the full text from shuffling
through any stage that doesn't read it.

Scale notes: the only text-shuffling stage is the LSH band join inside
``minhash_lsh_pairs`` (band keys only; shingle arrays move only for
verified candidates).  The quality gate and mixture are shuffle-free;
exact dedup shuffles 16-byte keys; the final rollup is a tiny
per-source aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bingcrawler_spark.dataops.dedup import (
    exact_dedup,
    exact_dedup_sql,
    minhash_lsh_pairs,
    minhash_lsh_pairs_sql,
)
from bingcrawler_spark.dataops.sampling import domain_mixture, domain_mixture_sql
from bingcrawler_spark.dataops.textstats import (
    quality_filters,
    quality_filters_sql,
    token_stats,
    token_stats_sql,
)


def webtext_corpus(
    docs: DataFrame,
    rates: dict[str, int],
    default_rate: int = 0,
) -> DataFrame:
    """documents(doc_id, text, source) → per-source corpus ledger
    (source, n_docs, ws_tokens, bpe_tokens) after the full gate →
    dedup → near-dup → mixture chain.  Near-dup policy is
    keep-smallest-id: any doc that is the larger member of a verified
    LSH pair is dropped — deterministic, engine-independent."""
    passed = quality_filters(docs).where(F.col("keep") == 1).select("doc_id")
    filtered = docs.join(passed, "doc_id")
    canon = exact_dedup(filtered).where(F.col("is_dup") == 0).select("doc_id")
    survivors = filtered.join(canon, "doc_id").persist()
    dominated = (
        minhash_lsh_pairs(survivors)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    kept = survivors.join(dominated, "doc_id", "left_anti")
    manifest = domain_mixture(kept, rates, default_rate).select("doc_id")
    final = kept.join(manifest, "doc_id")
    ts = token_stats(final)
    out = (
        final.select("doc_id", "source")
        .join(ts, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("ws_tokens").cast("long").alias("ws_tokens"),
            F.sum("bpe_tokens").cast("long").alias("bpe_tokens"),
        )
        .localCheckpoint(eager=True)  # materialize, then release the cache
    )
    survivors.unpersist()
    return out


def webtext_corpus_sql(
    docs_sql: str,
    rates: dict[str, int],
    default_rate: int = 0,
) -> str:
    """DuckDB twin: the same chain as nested CTEs, each stage emitted by
    the stage operator's own _sql builder."""
    return f"""
    WITH docs0 AS ({docs_sql}),
    q AS ({quality_filters_sql("SELECT * FROM docs0")}),
    filtered AS (
      SELECT d.* FROM docs0 d JOIN q ON q.doc_id = d.doc_id AND q.keep = 1),
    e AS ({exact_dedup_sql("SELECT * FROM filtered")}),
    surv AS (
      SELECT f.* FROM filtered f JOIN e ON e.doc_id = f.doc_id AND e.is_dup = 0),
    pairs AS ({minhash_lsh_pairs_sql("SELECT * FROM surv")}),
    kept AS (
      SELECT * FROM surv
      WHERE doc_id NOT IN (SELECT doc_b FROM pairs)),
    mix AS ({domain_mixture_sql("SELECT * FROM kept", rates, default_rate)}),
    fin AS (SELECT k.* FROM kept k JOIN mix ON mix.doc_id = k.doc_id),
    ts AS ({token_stats_sql("SELECT * FROM fin")})
    SELECT fin.source, count(*)::BIGINT AS n_docs,
           sum(ts.ws_tokens)::BIGINT AS ws_tokens,
           sum(ts.bpe_tokens)::BIGINT AS bpe_tokens
    FROM fin JOIN ts ON ts.doc_id = fin.doc_id
    GROUP BY fin.source
    """
