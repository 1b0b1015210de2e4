"""Deterministic sampling operators for training-data mixture control.

A 100 TB corpus is never trained on uniformly: the pipeline assigns each
source/domain a target inclusion rate (e.g. wikipedia x3 oversample,
common-crawl 30%) and materializes the mixture.  Random sampling is
non-reproducible across runs and engines; these operators sample by a
deterministic content-derived bucket (md5 of the doc id → [0, 1000)), so

* the same doc always lands in the same bucket — resumable, auditable,
  and identical on Spark and the DuckDB oracle (cross-engine md5 parity
  via :mod:`bingcrawler_spark.xhash`);
* rate changes are monotone: raising a source's rate only ADDS docs
  (bucket < rate keeps being true), never churns the kept set.

Scale shape: pure per-row column expressions — no shuffle, no UDF, no
driver round-trip; the rates table broadcasts (it is a handful of rows
per source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from bingcrawler_spark import xhash as X

BUCKETS = 1000  # per-mille rates: rate=125 keeps 12.5% of a source


def sample_bucket_col(id_col: str = "doc_id"):
    """Deterministic per-doc bucket in [0, BUCKETS): 32-bit md5 prefix of
    the id, reduced mod 1000 — uniform enough for rate control and exactly
    reproducible in ANSI SQL."""
    return (X.h32_col(F.col(id_col)) % F.lit(BUCKETS)).cast("int")


def sample_bucket_sql(id_col: str = "doc_id") -> str:
    # cast to VARCHAR: h32_col stringifies the id on the Spark side, and
    # DuckDB's md5 only accepts strings
    return f"(({X.h32_sql(f'{id_col}::VARCHAR')}) % {BUCKETS})::INT"


def domain_mixture(
    docs: DataFrame,
    rates: dict[str, int],
    default_rate: int = 0,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Stratified mixture sampling: keep a doc iff its deterministic bucket
    falls under its source's per-mille rate.  ``rates`` maps source name →
    rate in [0, 1000]; sources absent from the map use ``default_rate``.

    Returns the KEPT rows as (id_col, source_col, bucket) — the mixture
    manifest.  Joining the manifest back to the full table recovers the
    text; the manifest itself is narrow so downstream shuffles stay cheap.
    """
    rate_map = F.create_map(
        *[x for s, r in sorted(rates.items()) for x in (F.lit(s), F.lit(int(r)))]
    )
    bucket = sample_bucket_col(id_col)
    rate = F.coalesce(
        rate_map.getItem(F.col(source_col)), F.lit(int(default_rate))
    )
    return (
        docs.select(F.col(id_col), F.col(source_col), bucket.alias("bucket"))
        .where(F.col("bucket") < rate)
    )


def domain_mixture_sql(
    docs_sql: str,
    rates: dict[str, int],
    default_rate: int = 0,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> str:
    cases = " ".join(
        f"WHEN '{s}' THEN {int(r)}" for s, r in sorted(rates.items())
    )
    return f"""
    SELECT {id_col}, {source_col}, {sample_bucket_sql(id_col)} AS bucket
    FROM ({docs_sql})
    WHERE {sample_bucket_sql(id_col)} <
          (CASE {source_col} {cases} ELSE {int(default_rate)} END)
    """
