"""Distributed cardinality / frequency sketches — HyperLogLog and
Count-Min — built so the SAME sketch is computable bit-for-bit on Spark
and on DuckDB (the correctness oracle), which is what makes them
driver-checkable at all.

Why these exist: at 100 TB, `count(DISTINCT …)` over a high-cardinality
key and "how often does term X occur" are both shuffle monsters if done
exactly — the distinct needs a full key shuffle, the frequency table is
as large as the vocabulary.  The sketches bound both:

* **HyperLogLog** (`hll_distinct`): one narrow shuffle of
  (register, rho) pairs — at most m=2^p distinct groups regardless of
  input size, with map-side partial max, so the exchange is O(m) per
  mapper.  Flajolet et al. 2007; the small-range linear-counting
  correction is included.
* **Count-Min** (`cms_build` / `cms_point`): d×w counters (a few
  thousand groups), map-side combinable; point queries are a broadcast
  join of literal (seed, idx) keys against the counter table.
  Cormode & Muthukrishnan 2005.

Cross-engine determinism, the hard part, is all integer/string math:

* hashes come from `md5(value)` hex — identical in Spark, DuckDB, and
  Python's hashlib (used to precompute probe indexes);
* HLL's rho (leading-zero count of a 60-bit tail) is computed from the
  HEX STRING — strip leading '0' digits, CASE on the first nonzero
  nibble — no floats, no log2 near power-of-two boundaries;
* the harmonic sum Σ 2^(61−rho) is an EXACT integer sum
  (decimal(38,0) on Spark, HUGEINT on DuckDB) cast to double only once
  at the end, so summation order cannot change the result;
* the one constant `alpha·m²·2^61` is precomputed in Python and inlined
  as the same literal into both engines.

The only libm call left is `ln` in the linear-counting branch; a
last-ulp difference there changes the ROUNDED estimate only if the true
value sits within ~1e-10 of a .5 boundary (the same accepted argument
as BM25's e4 fixed-point scores).

Reference context: the reference engine has no sketches — it counts
exactly at single-node scale (`CommonAnalysis.java` report queries);
these are the scale path those counts need at 100 TB.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, functions as F

HLL_P = 12  # 4096 registers; relative error ~1.04/sqrt(m) = 1.6%
CMS_D = 4
CMS_W = 1024
_TAIL_HEX = 15  # 60-bit rho tail (fits a signed 64-bit shift)


def _alpha_m2_p61(m: int) -> float:
    """alpha_m * m^2 * 2^61 — the HLL numerator, one literal constant."""
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return alpha * m * m * float(1 << 61)


# ---------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------
def hll_distinct(df: DataFrame, col: str, p: int = HLL_P) -> DataFrame:
    """df[col] → one row (m, nonzero_regs, hll_est, exact_distinct).
    exact_distinct rides along so the output self-documents the sketch's
    error; at real scale you'd drop it (it is the expensive one)."""
    m = 1 << p
    reg_hex = (p + 3) // 4  # hex digits covering ≥ p bits
    const = _alpha_m2_p61(m)
    h = df.where(F.col(col).isNotNull()).select(
        F.md5(F.col(col).cast("string")).alias("h")
    )
    t = h.select(
        (F.conv(F.substring("h", 1, reg_hex), 16, 10).cast("long") % m).alias("reg"),
        F.expr(f"trim(LEADING '0' FROM substring(h, {reg_hex + 1}, {_TAIL_HEX}))").alias(
            "s"
        ),
    )
    nib = F.substring("s", 1, 1)
    rho = (
        F.when(F.length("s") == 0, F.lit(61))
        .otherwise(
            (F.lit(_TAIL_HEX) - F.length("s")) * 4
            + F.when(nib >= F.lit("8"), 0)
            .when(nib >= F.lit("4"), 1)
            .when(nib >= F.lit("2"), 2)
            .otherwise(3)
            + 1
        )
        .alias("rho")
    )
    regs = t.select("reg", rho).groupBy("reg").agg(F.max("rho").alias("r"))
    agg = regs.agg(
        F.count(F.lit(1)).cast("long").alias("nonzero_regs"),
        F.sum(
            F.expr("cast(shiftleft(cast(1 as bigint), 61 - r) as decimal(38,0))")
        ).alias("s_exact"),
    )
    exact = df.agg(F.countDistinct(col).cast("long").alias("exact_distinct"))
    zeros = F.lit(m) - F.col("nonzero_regs")
    # empty registers have rho=0 and contribute 2^61 each to the exact sum;
    # coalesce: on EMPTY input sum() is NULL and would poison the estimate
    # (the linear-counting branch then correctly reports 0)
    s_total = F.coalesce(
        F.col("s_exact"), F.lit(0).cast("decimal(38,0)")
    ) + zeros.cast("decimal(38,0)") * F.lit(1 << 61).cast("decimal(38,0)")
    raw = F.lit(const) / s_total.cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.crossJoin(exact).select(
        F.lit(m).cast("long").alias("m"),
        "nonzero_regs",
        F.round(est).cast("long").alias("hll_est"),
        "exact_distinct",
    )


def hll_sql(from_sql: str, col: str, p: int = HLL_P) -> str:
    """DuckDB twin of hll_distinct — same hash, same hex-string rho,
    same exact integer harmonic sum (HUGEINT), same inlined constant."""
    m = 1 << p
    reg_hex = (p + 3) // 4
    const = _alpha_m2_p61(m)
    return f"""
    WITH hll_src AS (SELECT {col} AS v FROM ({from_sql}) WHERE {col} IS NOT NULL),
    hll_map AS (
      SELECT ('0x' || substr(md5(v::VARCHAR), 1, {reg_hex}))::BIGINT % {m} AS reg,
             ltrim(substr(md5(v::VARCHAR), {reg_hex + 1}, {_TAIL_HEX}), '0') AS s
      FROM hll_src
    ),
    hll_rho AS (
      SELECT reg,
             CASE WHEN length(s) = 0 THEN 61
                  ELSE ({_TAIL_HEX} - length(s)) * 4
                       + (CASE WHEN substr(s,1,1) >= '8' THEN 0
                               WHEN substr(s,1,1) >= '4' THEN 1
                               WHEN substr(s,1,1) >= '2' THEN 2
                               ELSE 3 END) + 1
             END AS rho
      FROM hll_map
    ),
    hll_regs AS (SELECT reg, max(rho) AS r FROM hll_rho GROUP BY reg),
    hll_agg AS (
      SELECT count(*)::BIGINT AS nonzero_regs,
             coalesce(sum((1::BIGINT << (61 - r)))::HUGEINT, 0::HUGEINT)
               + ({m} - count(*))::HUGEINT * (1::HUGEINT << 61) AS s_total
      FROM hll_regs
    ),
    hll_ex AS (SELECT count(DISTINCT {col})::BIGINT AS exact_distinct FROM ({from_sql}))
    SELECT {m}::BIGINT AS m,
           nonzero_regs,
           round(CASE WHEN ({const!r} / s_total::DOUBLE) <= {2.5 * m!r}
                       AND ({m} - nonzero_regs) > 0
                      THEN {float(m)!r} * ln({float(m)!r} / ({m} - nonzero_regs)::DOUBLE)
                      ELSE {const!r} / s_total::DOUBLE
                 END)::BIGINT AS hll_est,
           exact_distinct
    FROM hll_agg, hll_ex
    """


# ---------------------------------------------------------------------
# Count-Min
# ---------------------------------------------------------------------
def _toks_col() -> F.Column:
    from bingcrawler_spark.indexing import _toks_col as ix_toks

    return ix_toks()


def cms_idx(seed: int, term: str, w: int = CMS_W) -> int:
    """Python twin of the counter index — used to precompute literal
    probe keys so point queries need no hash evaluation at all."""
    return int(hashlib.md5(f"{seed}:{term}".encode()).hexdigest()[:5], 16) % w


def _terms(docs: DataFrame) -> DataFrame:
    return docs.select(F.explode(_toks_col()).alias("term"))


def cms_build(docs: DataFrame, d: int = CMS_D, w: int = CMS_W) -> DataFrame:
    """documents(text) → (seed, idx, cnt) counter table, d·w cells max.
    One explode, one (seed, idx)-keyed aggregation with map-side
    combine — the counter table is tiny and bounded regardless of corpus
    size, which is the whole point of the sketch."""
    terms = _terms(docs)
    seeded = terms.select(
        F.explode(F.array([F.lit(s) for s in range(d)])).alias("seed"), "term"
    )
    idx = (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", "seed", "term")), 1, 5), 16, 10
        ).cast("long")
        % w
    )
    return (
        seeded.select("seed", idx.alias("idx"))
        .groupBy("seed", "idx")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


# the Spark side reuses indexing._toks_col for tokenizer parity, so the
# DuckDB side must reuse indexing's SQL constant too — a re-declared
# copy would silently desynchronize when the regex is tweaked
from bingcrawler_spark.indexing import (  # noqa: E402
    _TOKENIZE as _CMS_TOKENIZE,
    sql_lit,
)


def cms_sql(from_docs: str, d: int = CMS_D, w: int = CMS_W) -> str:
    return f"""
    WITH toks AS (
      SELECT unnest({_CMS_TOKENIZE}) AS term FROM ({from_docs})
    ),
    seeded AS (
      SELECT seed, term FROM toks, unnest([{', '.join(str(s) for s in range(d))}]) u(seed)
    )
    SELECT seed::INT AS seed,
           ('0x' || substr(md5(seed::VARCHAR || ':' || term), 1, 5))::BIGINT % {w} AS idx,
           count(*)::BIGINT AS cnt
    FROM seeded
    GROUP BY 1, 2
    """


def cms_point(
    docs: DataFrame, probes: list[str], d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """Frequency estimates for fixed probe terms: est = min over the d
    rows of the counter at the term's precomputed index (left join +
    coalesce 0 so unseen terms estimate honestly).  true_cnt rides along
    to self-document the one-sided error (est ≥ true always)."""
    spark = docs.sparkSession
    counters = cms_build(docs, d, w)
    keys = spark.createDataFrame(
        [(t, s, cms_idx(s, t, w)) for t in probes for s in range(d)],
        "term string, seed int, idx long",
    )
    est = (
        keys.join(F.broadcast(counters), ["seed", "idx"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("est_cnt"))
    )
    true = (
        _terms(docs)
        .where(F.col("term").isin(probes))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("true_cnt"))
    )
    return est.join(true, "term", "left").select(
        "term", "est_cnt", F.coalesce("true_cnt", F.lit(0).cast("long")).alias("true_cnt")
    )


def cms_point_sql(
    from_docs: str, probes: list[str], d: int = CMS_D, w: int = CMS_W
) -> str:
    key_rows = ", ".join(
        f"({sql_lit(t)}, {s}, {cms_idx(s, t, w)})" for t in probes for s in range(d)
    )
    return f"""
    WITH counters AS ({cms_sql(from_docs, d, w)}),
    keys AS (SELECT * FROM (VALUES {key_rows}) k(term, seed, idx)),
    est AS (
      SELECT k.term, min(coalesce(c.cnt, 0))::BIGINT AS est_cnt
      FROM keys k LEFT JOIN counters c ON c.seed = k.seed AND c.idx = k.idx
      GROUP BY k.term
    ),
    toks AS (
      SELECT unnest({_CMS_TOKENIZE}) AS term FROM ({from_docs})
    ),
    tru AS (
      SELECT term, count(*)::BIGINT AS true_cnt FROM toks
      WHERE term IN ({', '.join(sql_lit(t) for t in probes)})
      GROUP BY term
    )
    SELECT e.term, e.est_cnt, coalesce(t.true_cnt, 0)::BIGINT AS true_cnt
    FROM est e LEFT JOIN tru t USING (term)
    """


# ------------------------------------------------------- histogram quantiles


def hist_quantiles(
    vals: DataFrame,
    lo: int,
    hi: int,
    n_bins: int = 64,
    ps: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """Mergeable fixed-bin histogram quantiles — the sketch a 100 TB
    percentile dashboard runs on.  Input is a one-column relation
    `v: long` (cents / any int64 measure).  Unlike percentile_disc (a
    global sort or single-partition shuffle at scale), the histogram is
    one groupBy over ≤ n_bins keys with map-side combine, and
    per-partition histograms MERGE by addition, so executors, days, or
    clusters combine without re-reading data.  Estimates are bin UPPER
    bounds (conservative: true quantile ≤ estimate < quantile + bin
    width), all int64 — cross-engine exact.

    bin = clamp((v - lo) · n_bins div (hi - lo), 0, n_bins-1); quantile
    p = upper bound of the first bin where cum·100 ≥ p·total.  The
    cumulative window runs over the ≤ n_bins-row SKETCH, not the data,
    so its single-partition sort is O(n_bins) anywhere."""
    from pyspark.sql.window import Window

    binc = F.greatest(
        F.lit(0),
        F.least(
            F.lit(n_bins - 1),
            F.expr(f"div((v - {lo}) * {n_bins}, {hi - lo})"),
        ),
    )
    hist = (
        vals.select(binc.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    total = hist.agg(F.sum("n").cast("long").alias("total"))
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        hist.select("bin", F.sum("n").over(w).cast("long").alias("cum"))
        .crossJoin(F.broadcast(total))
        .persist()
    )
    out = None
    for p in ps:
        q = (
            cum.where(F.col("cum") * 100 >= F.col("total") * p)
            .orderBy("bin")
            .limit(1)
            .select(
                F.lit(p).cast("int").alias("p"),
                F.col("bin").cast("long").alias("bin"),
                # EXACT bin upper bound via ceiling division — a truncated
                # shared width would sit BELOW the boundary whenever
                # (hi-lo) % n_bins != 0, breaking the conservative
                # "true quantile <= estimate" guarantee
                (
                    F.lit(lo)
                    + F.expr(
                        f"div((bin + 1) * {hi - lo} + {n_bins - 1}, {n_bins})"
                    )
                )
                .cast("long")
                .alias("est_cents"),
                F.col("cum").cast("long").alias("cum_n"),
                F.col("total").cast("long").alias("total_n"),
            )
        )
        out = q if out is None else out.unionByName(q)
    out = out.localCheckpoint(eager=True)  # materialize, release the cache
    cum.unpersist()
    return out


def hist_quantiles_sql(
    cents_sql: str,
    lo: int,
    hi: int,
    n_bins: int = 64,
    ps: tuple[int, ...] = (50, 90, 99),
) -> str:
    """DuckDB twin over a relation exposing one BIGINT column `v`."""
    p_rows = ", ".join(f"({p})" for p in ps)
    return f"""
    WITH __hq_vals AS (SELECT v FROM ({cents_sql})),
    hist AS (
      SELECT greatest(0, least({n_bins - 1},
               ((v - {lo}) * {n_bins}) // ({hi - lo}))) AS bin,
             count(*)::BIGINT AS n
      FROM __hq_vals GROUP BY 1
    ),
    cum AS (
      SELECT bin, n,
             sum(n) OVER (ORDER BY bin)::BIGINT AS cum,
             sum(n) OVER ()::BIGINT AS total
      FROM hist
    )
    SELECT p::INT AS p, bin::BIGINT AS bin,
           ({lo} + ((bin + 1) * {hi - lo} + {n_bins - 1}) // {n_bins})::BIGINT
             AS est_cents,
           cum::BIGINT AS cum_n, total::BIGINT AS total_n
    FROM (SELECT p, bin, cum, total,
                 row_number() OVER (PARTITION BY p ORDER BY bin) AS rn
          FROM (VALUES {p_rows}) ps(p)
          JOIN cum ON cum.cum * 100 >= cum.total * ps.p)
    WHERE rn = 1
    """
