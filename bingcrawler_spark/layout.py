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
