"""Cross-engine hash parity: every xhash primitive must produce EXACTLY
the same values in Spark and DuckDB — that equality is what makes the
fingerprint operators oracle-checkable (driver gate)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from bingcrawler_spark import xhash as X


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").limit(80)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    return con.sql(sql).fetchall()


def test_h32_h60_match(spark, sf_dir, docs):
    got = {
        r.doc_id: (r.h32, r.h60)
        for r in docs.select(
            "doc_id",
            X.h32_col(F.col("text")).alias("h32"),
            X.h60_col(F.col("text")).alias("h60"),
        ).collect()
    }
    want = dict(
        (i, (a, b))
        for i, a, b in _duck(
            sf_dir,
            f"SELECT doc_id, {X.h32_sql('text')}, {X.h60_sql('text')} "
            "FROM documents WHERE doc_id < 80",
        )
    )
    assert got == want


def test_minhash_and_fingerprint_match(spark, sf_dir, docs):
    sh = X.shingles_col(F.col("text"))
    got = {
        r.doc_id: (list(r.sig), r.fp)
        for r in docs.select(
            "doc_id",
            X.minhash_sig_col(sh, 8).alias("sig"),
            X.fingerprint_col(F.col("text")).alias("fp"),
        ).collect()
    }
    want = dict(
        (i, (list(s), f))
        for i, s, f in _duck(
            sf_dir,
            f"SELECT doc_id, {X.minhash_sig_sql(X.shingles_sql('text'), 8)}, "
            f"{X.fingerprint_sql('text')} FROM documents WHERE doc_id < 80",
        )
    )
    assert got == want


def test_minhash_from_hashes_sql_twin(spark, sf_dir, docs):
    """The pre-hashed oracle form (hash shingles once, then k affine
    mins) must equal BOTH the inline DuckDB form and Spark's
    minhash_sig_from_hashes — the equivalence the dedup oracles rely on
    after the hash-once restructure."""
    prehashed = _duck(
        sf_dir,
        "SELECT doc_id, "
        f"{X.minhash_sig_from_hashes_sql(X.hashed_shingles_sql(X.shingles_sql('text')), 8)} "
        "FROM documents WHERE doc_id < 80",
    )
    inline = _duck(
        sf_dir,
        f"SELECT doc_id, {X.minhash_sig_sql(X.shingles_sql('text'), 8)} "
        "FROM documents WHERE doc_id < 80",
    )
    assert dict(prehashed) == dict(inline)
    spark_side = {
        r.doc_id: list(r.sig)
        for r in docs.select(
            "doc_id",
            X.minhash_sig_from_hashes(
                F.transform(X.shingles_col(F.col("text")), X.h32_col), 8
            ).alias("sig"),
        ).collect()
    }
    assert spark_side == {i: list(s) for i, s in prehashed}
    # prefix property the ngram blocking key depends on: the first band of
    # a k-signature IS the rows-length signature
    assert X.minhash_params(16)[:4] == X.minhash_params(4)


def test_simhash60_match_and_neardup_property(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(12)
    got = {
        r.doc_id: r.sh
        for r in docs.select(
            "doc_id", X.simhash60_col(F.col("text")).alias("sh")
        ).collect()
    }
    want = dict(
        _duck(
            sf_dir,
            f"SELECT doc_id, {X.simhash60_sql('text')} FROM documents "
            "WHERE doc_id < 12",
        )
    )
    assert got == want
    # near-identical texts → small hamming distance (bit-vote property)
    row = docs.select(
        X.simhash60_col(F.col("text")).alias("a"),
        X.simhash60_col(F.concat(F.col("text"), F.lit(" tail"))).alias("b"),
    ).first()
    assert bin(row.a ^ row.b).count("1") <= 12


def test_minhash_params_fixed():
    p = X.minhash_params(16)
    assert len(p) == 16 and len(set(p)) == 16
    assert all(0 < a < X.MERSENNE_P and 0 <= b < X.MERSENNE_P for a, b in p)
    assert p == X.minhash_params(16)  # deterministic


def test_simhash60_df_equals_column_form(spark, sf_dir):
    from bingcrawler_spark.xhash import simhash60_df

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    via_col = {
        r.doc_id: r.sh
        for r in docs.select(
            "doc_id", X.simhash60_col(F.col("text")).alias("sh")
        ).collect()
    }
    via_df = {r.doc_id: r.simhash60 for r in simhash60_df(docs).collect()}
    assert via_col == via_df


def test_simhash128_matches_pure_python_reference_math(spark, sf_dir):
    """P13: xhash.simhash128_df vs an independent pure-Python twin of
    Simhash.java:52-92 — md5 per raw token (NO dedup, repeats vote),
    sign bit i from hash byte i/8 bit i%8 (little-endian in the byte),
    bit = 1 iff vote > 0, packed into four 32-bit words."""
    import hashlib

    def py_simhash128_words(tokens):
        sign = [0] * 128
        for tok in tokens:
            h = hashlib.md5(tok.encode("utf-8")).digest()
            for i in range(128):
                sign[i] += 1 if h[i // 8] & (1 << (i % 8)) else -1
        words = [0, 0, 0, 0]
        for i in range(128):
            if sign[i] > 0:
                words[i // 32] |= 1 << (i % 32)
        return words

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(25)
    got = {
        r.doc_id: [r.fp0, r.fp1, r.fp2, r.fp3]
        for r in X.simhash128_df(docs).collect()
    }
    want = {
        r.doc_id: py_simhash128_words(r.text.split(" "))
        for r in docs.select("doc_id", "text").collect()
    }
    assert got == want


def test_simhash_pandas_forms_equal_agg_forms(spark, sf_dir):
    """The registered map-only pandas-UDF fingerprints must be
    bit-identical to the JVM explode-aggregate cross-check forms —
    three-way agreement with the DuckDB CTE oracle is what lets the
    shuffle-free path replace the aggregate path (VERDICT r2 tasks 1/7)."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(60)
    )
    p128 = {
        r.doc_id: (r.fp0, r.fp1, r.fp2, r.fp3)
        for r in X.simhash128_df(docs).collect()
    }
    a128 = {
        r.doc_id: (r.fp0, r.fp1, r.fp2, r.fp3)
        for r in X.simhash128_df_agg(docs).collect()
    }
    assert p128 == a128 and len(p128) == 60
    p60 = {r.doc_id: r.simhash60 for r in X.simhash60_df(docs).collect()}
    a60 = {r.doc_id: r.simhash60 for r in X.simhash60_df_agg(docs).collect()}
    assert p60 == a60 and len(p60) == 60


def test_simhash128_votes_count_repeats():
    """getSign iterates the raw token list — 'a a a b' must differ from
    'a b' whenever the repeat flips a majority (unlike the deduped 60-bit
    variant)."""
    import hashlib

    def words(tokens):
        sign = [0] * 128
        for tok in tokens:
            h = hashlib.md5(tok.encode()).digest()
            for i in range(128):
                sign[i] += 1 if h[i // 8] & (1 << (i % 8)) else -1
        return [sum(1 << (i % 32) for i in range(128) if sign[i] > 0 and i // 32 == k) for k in range(4)]

    assert words(["a", "a", "a", "b"]) != words(["a", "b"])
