"""HLL + Count-Min vs pure-Python twins and the DuckDB oracle SQL."""

import hashlib
import math

from bingcrawler_spark import sketches as SK


# ------------------------------------------------------------- twins
def _hll_py(values, p=SK.HLL_P):
    m = 1 << p
    reg_hex = (p + 3) // 4
    regs = {}
    for v in values:
        if v is None:
            continue
        h = hashlib.md5(str(v).encode()).hexdigest()
        reg = int(h[:reg_hex], 16) % m
        s = h[reg_hex : reg_hex + SK._TAIL_HEX].lstrip("0")
        if not s:
            rho = 61
        else:
            c = s[0]
            nib = 0 if c >= "8" else 1 if c >= "4" else 2 if c >= "2" else 3
            rho = (SK._TAIL_HEX - len(s)) * 4 + nib + 1
        regs[reg] = max(regs.get(reg, 0), rho)
    zeros = m - len(regs)
    s_total = sum(1 << (61 - r) for r in regs.values()) + zeros * (1 << 61)
    raw = SK._alpha_m2_p61(m) / float(s_total)
    if raw <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    else:
        est = raw
    return m, len(regs), round(est)


def _cms_py(tokens, probes, d=SK.CMS_D, w=SK.CMS_W):
    counters = {}
    for t in tokens:
        for s in range(d):
            k = (s, SK.cms_idx(s, t, w))
            counters[k] = counters.get(k, 0) + 1
    return {
        q: min(counters.get((s, SK.cms_idx(s, q, w)), 0) for s in range(d))
        for q in probes
    }


def test_hll_matches_python_twin_small(spark):
    vals = [f"user{i}" for i in range(200)] * 3  # dups must not count
    df = spark.createDataFrame([(v,) for v in vals] + [(None,)], "uid string")
    row = SK.hll_distinct(df, "uid").collect()[0]
    m, nz, est = _hll_py(vals)
    assert (row["m"], row["nonzero_regs"], row["hll_est"]) == (m, nz, est)
    assert row["exact_distinct"] == 200
    # linear-counting regime: estimate should be close
    assert abs(row["hll_est"] - 200) <= 10


def test_hll_harmonic_branch(spark):
    # cardinality >> 2.5m for p=6 (m=64) forces the harmonic estimator
    vals = list(range(20_000))
    df = spark.createDataFrame([(v,) for v in vals], "uid long")
    row = SK.hll_distinct(df, "uid", p=6).collect()[0]
    m, nz, est = _hll_py(vals, p=6)
    assert (row["m"], row["nonzero_regs"], row["hll_est"]) == (m, nz, est)
    assert abs(row["hll_est"] - 20_000) / 20_000 < 0.35  # ~13% stderr at m=64


def test_hll_sql_matches_spark(spark):
    import duckdb

    vals = [f"u{i % 333}" for i in range(1000)]
    df = spark.createDataFrame([(v,) for v in vals], "uid string")
    got = tuple(SK.hll_distinct(df, "uid").collect()[0])
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"('{v}')" for v in vals)
        + ") v(uid)"
    )
    ref = con.execute(SK.hll_sql("SELECT uid FROM t", "uid")).fetchone()
    assert got == tuple(ref)
    # harmonic branch too: m=64 saturates (zeros=0) at 333 distinct
    got6 = tuple(SK.hll_distinct(df, "uid", p=6).collect()[0])
    ref6 = con.execute(SK.hll_sql("SELECT uid FROM t", "uid", p=6)).fetchone()
    assert got6 == tuple(ref6)
    assert got6 == _hll_py(vals, p=6) + (333,)


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog the fox"),
    (1, "pack my box with five dozen liquor jugs, the box"),
    (2, "fox fox fox dog dog the"),
]
PROBES = ["fox", "the", "dog", "absentterm"]


def test_cms_point_vs_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["term"]: (r["est_cnt"], r["true_cnt"]) for r in SK.cms_point(df, PROBES).collect()}
    toks = [t for _, txt in DOCS for t in txt.replace(",", " ").lower().split() if t]
    ref = _cms_py(toks, PROBES)
    true = {q: toks.count(q) for q in PROBES}
    for q in PROBES:
        assert got[q] == (ref[q], true[q])
        assert got[q][0] >= got[q][1]  # CMS error is one-sided


def test_cms_point_sql_matches_spark(spark):
    import duckdb

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = sorted(tuple(r) for r in SK.cms_point(df, PROBES).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t.replace(chr(39), chr(39)*2)}')" for i, t in DOCS)
        + ") v(doc_id, text)"
    )
    ref = sorted(
        tuple(r)
        for r in con.execute(
            SK.cms_point_sql("SELECT text FROM documents", PROBES)
        ).fetchall()
    )
    assert got == ref


# ------------------------------------------------------- histogram quantiles


def test_hist_quantiles_uniform(spark):
    from pyspark.sql import functions as F

    from bingcrawler_spark import sketches as SK

    # v = 0..999 uniform, lo=0 hi=1000, 10 bins of width 100
    vals = spark.range(1000).select(F.col("id").cast("long").alias("v"))
    got = {
        r["p"]: (r["bin"], r["est_cents"], r["cum_n"], r["total_n"])
        for r in SK.hist_quantiles(vals, 0, 1000, n_bins=10, ps=(50, 90, 99)).collect()
    }
    # p50: first bin with cum*100 >= 50*1000 -> bin 4 (cum 500)
    assert got[50] == (4, 500, 500, 1000)
    assert got[90] == (8, 900, 900, 1000)
    assert got[99] == (9, 1000, 1000, 1000)


def test_hist_quantiles_clamps_and_matches_duckdb(spark):
    import duckdb

    from pyspark.sql import functions as F

    from bingcrawler_spark import sketches as SK

    # values outside [lo, hi) clamp into edge bins on both engines
    data = [-50, 0, 10, 120, 999, 1000, 2500]
    vals = spark.createDataFrame([(v,) for v in data], "v long")
    got = sorted(
        tuple(r) for r in SK.hist_quantiles(vals, 0, 1000, n_bins=10).collect()
    )
    con = duckdb.connect()
    con.register("vals", vals.toPandas())
    want = sorted(
        tuple(r)
        for r in con.sql(
            SK.hist_quantiles_sql("SELECT v FROM vals", 0, 1000, n_bins=10)
        ).fetchall()
    )
    assert got == want


def test_hist_quantiles_conservative_when_width_truncates(spark):
    """(hi-lo) not divisible by n_bins: the bin upper bound must use
    CEILING division so the estimate stays >= the true quantile.
    Regression: a truncated shared width put p99 ~4% BELOW the truth."""
    import duckdb

    from pyspark.sql import functions as F

    from bingcrawler_spark import sketches as SK

    # lo=0, hi=1000, 64 bins: width 15.625 — truncation would give 15
    vals = spark.range(1000).select(F.col("id").cast("long").alias("v"))
    rows = {
        r["p"]: r
        for r in SK.hist_quantiles(vals, 0, 1000, n_bins=64, ps=(50, 99)).collect()
    }
    for p, r in rows.items():
        true_q = p * 1000 // 100 - 1  # uniform 0..999
        assert r["est_cents"] >= true_q, (p, r)
        # and still within one bin width of the truth
        assert r["est_cents"] - true_q <= (1000 + 63) // 64, (p, r)
    con = duckdb.connect()
    con.register("vals", vals.toPandas())
    want = sorted(
        tuple(x)
        for x in con.sql(
            SK.hist_quantiles_sql("SELECT v FROM vals", 0, 1000, 64, (50, 99))
        ).fetchall()
    )
    got = sorted(tuple(x) for x in rows.values())
    assert got == want


def test_hll_empty_input_reports_zero(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from bingcrawler_spark import sketches as SK

    empty = spark.createDataFrame([], "u string")
    r = SK.hll_distinct(empty, "u").collect()[0]
    assert (r["nonzero_regs"], r["hll_est"], r["exact_distinct"]) == (0, 0, 0)


def test_cms_point_sql_survives_quoted_probe(spark):
    """A probe containing a single quote must produce VALID oracle SQL
    (sql_lit doubles the quote) and agree with the Spark side."""
    import duckdb

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    probes = ["o'brien", "fox"]
    got = sorted(tuple(r) for r in SK.cms_point(df, probes).collect())
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    ref = sorted(
        tuple(r)
        for r in con.execute(
            SK.cms_point_sql("SELECT text FROM documents", probes)
        ).fetchall()
    )
    assert got == ref
