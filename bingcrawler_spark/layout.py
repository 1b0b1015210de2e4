"""Physical data layout for repeated joins at scale — bucketing and
skew salting.

At 100 TB the dominant cost of `fact ⨝ dim-that-is-too-big-to-
broadcast` is the exchange: every repeated join on the same key
re-shuffles the fact table.  Bucketing pays that shuffle ONCE at write
time — both sides stored pre-hashed into the same number of buckets on
the join key (and sorted within buckets) join with a SortMergeJoin that
has NO Exchange and NO Sort in the plan; Spark's bucket metadata proves
co-location to Catalyst.  `tests/test_layout.py` asserts the
Exchange-free plan, not just the answer.

Salting handles the other failure mode: one hot key (the
www.google.com of the dataset) lands an entire join partition on one
task.  `salted_join` spreads each big-side key over `n_salt` synthetic
sub-keys derived deterministically from a unique column, and replicates
the small side once per salt — the result set is EXACTLY the plain
join's (asserted in tests), but the widest partition shrinks ~n_salt×.
The frontier's politeness pop uses the same trick for hot hosts
(`frontier.py`); this is the reusable, any-join form.

Reference context: the reference is single-node (`BingCrawlerTask.java`
iterates one WebDriver); layout is pure scale engineering the brief
requires, not reference parity.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist df as a bucketed (and in-bucket sorted) parquet table in
    the session catalog.  Buckets on `key` → later equi-joins between
    tables bucketed the same way need no exchange; sorting within
    buckets removes the SMJ sort too."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a crashed previous run can leave the managed location behind with no
    # catalog entry; saveAsTable refuses to reuse it, so clear it explicitly
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(wh.removeprefix("file:"), table.lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc)
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    w = w.sortBy(*(sort_cols or [key]))
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    force_merge: bool = False,
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys.  With
    bucketing enabled (Spark default) the shuffle-join path is a
    SortMergeJoin over the bucket scans directly — zero Exchange.
    Catalyst still broadcasts a small enough side (also exchange-free);
    force_merge pins the SMJ so tests can assert bucket co-location —
    at real scale neither side fits a broadcast and SMJ is what runs."""
    lt, rt = spark.table(left_table), spark.table(right_table)
    if force_merge:
        rt = rt.hint("merge")
    return lt.join(rt, lt[left_key] == rt[right_key])


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    unique_col: str,
    n_salt: int = 8,
) -> DataFrame:
    """Skew-safe inner equi-join: the big side gets a deterministic salt
    in [0, n_salt) from `unique_col` (any column unique-ish per row —
    NOT the join key, which is exactly what's skewed), the small side is
    replicated n_salt times, and the join runs on (key, salt).  Same
    rows out as big.join(small, key); hot keys split across n_salt
    partitions instead of one."""
    b = big.withColumn("_salt", F.pmod(F.xxhash64(F.col(unique_col)), F.lit(n_salt)))
    s = small.withColumn(
        "_salt", F.explode(F.array([F.lit(i).cast("bigint") for i in range(n_salt)]))
    )
    return b.join(s, [key, "_salt"]).drop("_salt")
