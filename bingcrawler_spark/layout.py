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


# ---------------------------------------------------------------- Z-order


def z_value_terms(x_expr: str, y_expr: str, bits: int) -> str:
    """The bit-interleave as a SQL-ish expression string valid in BOTH
    engines (only >>, <<, &, |, parentheses): z = ⋁ᵢ ((x>>i & 1) << 2i)
    | ((y>>i & 1) << (2i+1)).  Generated from one Python loop so Spark
    and DuckDB evaluate literally the same arithmetic."""
    # every term fully parenthesized: DuckDB gives <<, & and | ONE
    # precedence level (left-assoc), so `a << 0 | b << 1` would parse
    # as `((a << 0) | b) << 1`
    terms = []
    for i in range(bits):
        terms.append(f"(((({x_expr}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({y_expr}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def zorder_file_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 5,
    cell_shift: int = 4,
    box: tuple[int, int, int, int] = (4, 11, 9, 20),
) -> DataFrame:
    """Z-order (Morton) clustering demonstration — the layout that makes
    multi-dimensional data skipping work (Delta/Iceberg OPTIMIZE ZORDER
    BY): interleave the bits of two cluster keys, assign rows to files
    by z-range (`file_id = z >> cell_shift`), and emit per-file min/max
    column stats plus `scan_needed` — whether the file's (x, y)
    envelope intersects the query box (x_lo, x_hi, y_lo, y_hi).

    Because z-adjacent rows are xy-adjacent, each file's min/max
    envelope is TIGHT in both dimensions, so a box query prunes most
    files from footer stats alone; linear (row-order) layout gives every
    file a full-range envelope in the non-sort dimension and prunes
    nothing.  tests assert the pruned-file fraction, not just values.

    Scale shape: one narrow projection (the interleave is pure integer
    codegen), one groupBy(file_id) over ≤ 2^(2·bits-cell_shift) groups
    with map-side combine.  The real write path would
    repartitionByRange(z) before writing — same stats, same pruning."""
    x_lo, x_hi, y_lo, y_hi = box
    z = F.expr(f"({z_value_terms(x_col, y_col, bits)}) >> {cell_shift}")
    per_file = (
        df.select(
            F.col(x_col).alias("x"),
            F.col(y_col).alias("y"),
            z.cast("long").alias("file_id"),
        )
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("x").cast("long").alias("x_min"),
            F.max("x").cast("long").alias("x_max"),
            F.min("y").cast("long").alias("y_min"),
            F.max("y").cast("long").alias("y_max"),
        )
    )
    scan = (
        (F.col("x_max") >= x_lo)
        & (F.col("x_min") <= x_hi)
        & (F.col("y_max") >= y_lo)
        & (F.col("y_min") <= y_hi)
    ).cast("int")
    return per_file.select(
        "file_id", "n_rows", "x_min", "x_max", "y_min", "y_max",
        scan.alias("scan_needed"),
    )


def zorder_file_stats_sql(
    xy_sql: str,
    bits: int = 5,
    cell_shift: int = 4,
    box: tuple[int, int, int, int] = (4, 11, 9, 20),
) -> str:
    """DuckDB twin over a `(x, y)` relation."""
    x_lo, x_hi, y_lo, y_hi = box
    zt = z_value_terms("x", "y", bits)
    return f"""
    WITH pts AS (SELECT x, y, ({zt}) >> {cell_shift} AS file_id
                 FROM ({xy_sql}))
    SELECT file_id::BIGINT AS file_id,
           count(*)::BIGINT AS n_rows,
           min(x)::BIGINT AS x_min, max(x)::BIGINT AS x_max,
           min(y)::BIGINT AS y_min, max(y)::BIGINT AS y_max,
           CASE WHEN max(x) >= {x_lo} AND min(x) <= {x_hi}
                 AND max(y) >= {y_lo} AND min(y) <= {y_hi}
                THEN 1 ELSE 0 END::INT AS scan_needed
    FROM pts GROUP BY file_id
    """


# --------------------------------------------------- rendezvous sharding


def rendezvous_assign(
    hosts: DataFrame, n_a: int = 8, n_b: int = 12
) -> DataFrame:
    """Rendezvous (highest-random-weight) hashing of hosts onto crawler
    fetch shards, at two fleet sizes — the topology layer of a sharded
    frontier: every worker computes its own assignment from (host,
    shard) hashes alone, no coordination table, and growing the fleet
    n_a -> n_b moves only the hosts whose new-shard score wins
    (expected (n_b-n_a)/n_b of them), vs ~100% for `hash(host) mod n`.

    Scores are the top 60 bits of md5(host|shard) (15 hex chars, so the
    BIGINT parse is overflow-safe in both engines).  Scale shape: the
    candidate relation is |hosts| x n_shards narrow rows; the winner
    per host is a size-n window group, never a global sort."""
    from pyspark.sql.window import Window as W

    def _best(n: int, out: str) -> DataFrame:
        ex = hosts.select(
            "host", F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("s")
        )
        scored = ex.select(
            "host",
            "s",
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", F.col("host"), F.col("s"))), 1, 15
                ),
                16,
                10,
            )
            .cast("long")
            .alias("score"),
        )
        w = W.partitionBy("host").orderBy(F.col("score").desc(), F.col("s").asc())
        return (
            scored.withColumn("r", F.row_number().over(w))
            .where(F.col("r") == 1)
            .select("host", F.col("s").cast("int").alias(out))
        )

    a = _best(n_a, "shard_a")
    b = _best(n_b, "shard_b")
    return a.join(b, "host").select(
        "host",
        "shard_a",
        "shard_b",
        (F.col("shard_a") != F.col("shard_b")).cast("int").alias("moved"),
    )


def rendezvous_assign_sql(hosts_sql: str, n_a: int = 8, n_b: int = 12) -> str:
    """DuckDB twin of rendezvous_assign."""

    def _best(n: int, out: str) -> str:
        return f"""(
      SELECT host, s::INT AS {out} FROM (
        SELECT host, s,
               row_number() OVER (
                 PARTITION BY host
                 ORDER BY ('0x' || substr(md5(host || '|' || s::VARCHAR),
                                          1, 15))::BIGINT DESC, s ASC) AS r
        FROM (SELECT host FROM ({hosts_sql})), range(0, {n}) t(s))
      WHERE r = 1)"""

    return f"""
    SELECT a.host, a.shard_a, b.shard_b,
           (a.shard_a <> b.shard_b)::INT AS moved
    FROM {_best(n_a, "shard_a")} a JOIN {_best(n_b, "shard_b")} b
      ON a.host = b.host
    """
