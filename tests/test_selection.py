"""DSIR importance resampling + CCNet-style LM fluency: hand-built
corpora where the right answer is obvious, plus the DuckDB twins."""

import duckdb
import pytest

from bingcrawler_spark.dataops import selection as SEL


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_dsir_prefers_target_like_docs(spark):
    # Target (en) docs speak "alpha beta"; the de docs speak "gamma delta"
    # except doc 10, which speaks pure target language — it must outrank
    # the gamma-delta docs despite its non-target label.
    rows = [(i, "alpha beta alpha beta alpha", "en") for i in range(5)]
    rows += [(i + 5, "gamma delta gamma delta gamma", "de") for i in range(5)]
    rows += [(10, "alpha beta alpha beta alpha", "de")]
    out = SEL.dsir_select(_docs(spark, rows), k=11).collect()
    score = {r["doc_id"]: r["dsir_score"] for r in out}
    assert score[10] == score[0]  # identical text → identical score
    assert score[10] > score[5]  # target-like beats off-target


def test_dsir_topk_is_deterministic_tiebreak(spark):
    rows = [(i, "same text here", "en") for i in range(6)]
    out = SEL.dsir_select(_docs(spark, rows), k=3).collect()
    assert [r["doc_id"] for r in out] == [0, 1, 2]  # score ties → id ASC


def test_lm_fluency_likes_in_model_bigrams(spark):
    # LM trained on en docs; doc 5 repeats the trained bigram, doc 6 is
    # out-of-vocabulary — doc 5 must score strictly higher.
    rows = [(i, "red green red green red", "en") for i in range(5)]
    rows += [(5, "red green red", "fr"), (6, "blue yellow blue", "fr")]
    out = {
        r["doc_id"]: r["fluency_e6"]
        for r in SEL.lm_fluency(_docs(spark, rows)).collect()
    }
    assert out[5] > out[6]
    assert out[0] > out[6]


def test_lm_fluency_drops_docs_without_bigrams(spark):
    rows = [(0, "one two three", "en"), (1, "single", "en")]
    got = {r["doc_id"] for r in SEL.lm_fluency(_docs(spark, rows)).collect()}
    assert got == {0}


@pytest.mark.parametrize(
    "fn,sql_fn",
    [
        (SEL.dsir_select, SEL.dsir_select_sql),
        (SEL.lm_fluency, SEL.lm_fluency_sql),
    ],
)
def test_matches_duckdb_twin(spark, sf_dir, fn, sql_fn):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(tuple(r) for r in fn(docs).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            sql_fn("SELECT doc_id, text, lang FROM documents")
        ).fetchall()
    )
    assert got == want


def test_lm_buckets_all_populated(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    buckets = {
        r["ppl_bucket"]: r["count"]
        for r in SEL.lm_fluency(docs).groupBy("ppl_bucket").count().collect()
    }
    assert set(buckets) == {"head", "middle", "tail"}
