"""Inverted-index + BM25 vs a pure-Python reference implementation."""

import math
import re

from bingcrawler_spark import indexing as IX

DOCS = [
    (0, "Spark joins tables; the JOIN is hash-based. join join"),
    (1, "merge sort beats hash merge when spilling, merge!"),
    (2, "customer rows join customer dims"),
    (3, "vector scan"),
    (4, ""),
]
TERMS = ["join", "merge", "customer"]


def _tok(text):
    return [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split(" ") if t]


def _bm25_py(docs, terms, k1=IX.K1, b=IX.B):
    toks = {i: _tok(t) for i, t in docs}
    dl = {i: len(ts) for i, ts in toks.items()}
    n = len(docs)
    avgdl = sum(dl.values()) / n
    out = {}
    for i in toks:
        s, hit = 0.0, 0
        for q in terms:
            tf = toks[i].count(q)
            hit += tf
            df = sum(1 for j in toks if q in toks[j])
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            s += idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl[i] / avgdl))
        if hit:
            out[i] = round(s * 10_000)
    return out


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_bm25_matches_pure_python(spark):
    got = {
        r["doc_id"]: r["score_e4"]
        for r in IX.bm25_scores(_docs_df(spark), TERMS).collect()
    }
    assert got == _bm25_py(DOCS, TERMS)


def test_bm25_ordering_and_limit(spark):
    rows = IX.bm25_scores(_docs_df(spark), TERMS, limit=2).collect()
    ref = sorted(_bm25_py(DOCS, TERMS).items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert [(r["doc_id"], r["score_e4"]) for r in rows] == ref


def test_postings_stats(spark):
    rows = {
        r["term"]: (r["df"], r["cf"])
        for r in IX.postings_stats(_docs_df(spark), min_len=4, min_df=2).collect()
    }
    # 'join' appears in docs 0 (3x, case-folded; 'joins' is a distinct
    # token) and 2 (1x); 'merge' only in doc 1.
    assert rows["join"] == (2, 4)
    assert "merge" not in rows  # df 1 < min_df
    assert all(len(t) >= 4 for t in rows)


def test_bm25_oracle_sql_matches_duckdb(spark):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in [(i, t.replace("'", "''")) for i, t in DOCS])
        + ") v(doc_id, text)"
    )
    got = con.execute(
        IX.bm25_sql("SELECT doc_id, text FROM documents", TERMS)
    ).fetchall()
    ref = sorted(_bm25_py(DOCS, TERMS).items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(int(a), int(b)) for a, b in got] == ref


# ------------------------------------------------------------ phrase search


def test_phrase_match_positions_and_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "big data table big data table x"),   # 2 matches at 0, 3
            (2, "big table data big"),                # words present, no run
            (3, "say big data now"),                  # 1 match at 1
            (4, "nothing here"),
            (5, "big data"),                          # exact-length doc
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in IX.phrase_match(docs, ["big", "data"]).collect()
    }
    assert got == {1: (2, 0), 3: (1, 1), 5: (1, 0)}


def test_phrase_match_three_terms_and_duckdb_twin(spark):
    import duckdb

    docs = [
        (1, "a b c a b c a b"),
        (2, "a b x c a b c"),
        (3, "c b a"),
        (4, "a"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(tuple(r) for r in IX.phrase_match(df, ["a", "b", "c"]).collect())
    assert got == [(1, 2, 0), (2, 1, 4)]
    con = duckdb.connect()
    con.register("docs", df.toPandas())
    want = sorted(
        tuple(r)
        for r in con.sql(
            IX.phrase_match_sql("SELECT doc_id, text FROM docs", ["a", "b", "c"])
        ).fetchall()
    )
    assert got == want


# ---------------------------------------------------------------- snippets


def test_snippet_window_and_edges(spark):
    from bingcrawler_spark import indexing as IX

    df = spark.createDataFrame(
        [(0, "hit a b c d e f"),        # term at pos 1: left-clamped
         (1, "a b c hit d e f"),        # centered
         (2, "a b c d e f"),            # absent
         (3, "a b c d e hit")],         # right-clamped
        "doc_id long, text string",
    )
    got = {(r["doc_id"], r["term"]): (r["pos"], r["snippet"])
           for r in IX.snippet_extract(df, ["hit"]).collect()}
    assert got == {
        (0, "hit"): (1, "hit a b c"),
        (1, "hit"): (4, "a b c hit d e f"),
        (3, "hit"): (6, "c d e hit"),
    }


# ------------------------------------------------------- spell candidates


def test_spell_candidates_rank_and_verify(spark):
    from bingcrawler_spark import indexing as IX

    # vocab: 'window' x6, 'winnow' x3, 'query' x3 (len 5, too short to
    # spawn a typo but a valid candidate), 'of' (too short for vocab)
    text = " ".join(["window"] * 6 + ["winnow"] * 3 + ["query"] * 3 + ["of"] * 9)
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    got = {}
    for r in IX.spell_candidates(df).collect():
        got.setdefault(r["query"], []).append(
            (r["rank"], r["cand"], r["dist"], r["freq"])
        )
    # typo of 'window' -> 'widow'; 'winnow' -> 'winow'
    # 'widow': deletes share with 'window' (dist 1); 'winnow' is dist 2
    #   -> verify kills it
    assert got["widow"] == [(1, "window", 1, 6)]
    # 'winow' is deletion-1 of BOTH window and winnow: freq ranks window first
    assert got["winow"] == [(1, "window", 1, 6), (2, "winnow", 1, 3)]


def test_tfidf_keywords_pinned_and_twin(spark):
    import duckdb
    from bingcrawler_spark import indexing as IX

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple cherry"),
            (2, "banana cherry cherry dates"),
            (3, "apple apple apple zebra"),
            (4, "common common common common"),
        ],
        "doc_id long, text string",
    )
    out = IX.tfidf_keywords(docs, top_k=2, min_len=4).collect()
    got = {(r["doc_id"], r["rank"]): (r["term"], r["tf"], r["df"]) for r in out}
    # doc 3: 'zebra' df=1 beats 'apple' df=2 only if tf*idf says so:
    # apple tf=3 idf=ln(4/2)=.693 -> 2.079; zebra tf=1 idf=ln(4)=1.386
    assert got[(3, 1)][0] == "apple" and got[(3, 2)][0] == "zebra"
    # doc 4: 'common' df=1 tf=4 is its only keyword
    assert got[(4, 1)] == ("common", 4, 1)
    assert (4, 2) not in got
    con = duckdb.connect()
    con.register("docs", docs.toPandas())
    want = sorted(
        tuple(r)
        for r in con.sql(
            IX.tfidf_keywords_sql("SELECT doc_id, text FROM docs", 2, 4)
        ).fetchall()
    )
    assert sorted(tuple(r) for r in out) == want
