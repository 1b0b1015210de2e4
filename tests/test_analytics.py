"""Analytics layer (R2-R16) parity: each derived table computed by
bingcrawler_spark.analytics over the synthetic profiles corpus must equal
a DuckDB SQL oracle over the SAME parquet export (SURVEY.md §5.3)."""

import tempfile

import duckdb
import pytest

from bingcrawler_spark import analytics as A
from bingcrawler_spark.synth import synth_profiles_df

N = 400


@pytest.fixture(scope="module")
def profiles(spark):
    df = synth_profiles_df(spark, N).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def duck(spark, profiles):
    d = tempfile.mkdtemp(prefix="profiles_pq_")
    profiles.write.mode("overwrite").parquet(d)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW profiles AS SELECT * FROM '{d}/*.parquet'")
    return con


def _cmp(df, con, sql, cols):
    got = sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())
    want = sorted(tuple(r) for r in con.sql(sql).fetchall())
    assert got == want


def test_r2_author_counts(profiles, duck):
    _cmp(
        A.author_counts(profiles),
        duck,
        """SELECT author, count(DISTINCT title)::BIGINT FROM
           (SELECT title, unnest(authors) AS author FROM profiles) GROUP BY author""",
        ["author", "weight"],
    )


def test_r5_timeline(profiles, duck):
    _cmp(
        A.timeline(profiles),
        duck,
        """SELECT year, count(DISTINCT title)::BIGINT, sum(cited_by)::BIGINT,
                  sum(len(cited_papers))::BIGINT
           FROM profiles GROUP BY year""",
        ["year", "n_profiles", "total_cited_by", "total_linked_cited_by"],
    )


def test_r6_buckets(profiles, duck):
    _cmp(
        A.five_year_buckets(profiles),
        duck,
        """WITH b AS (SELECT *, (floor(year/5)*5)::INT AS bucket FROM profiles),
           pb AS (SELECT bucket, count(DISTINCT title)::BIGINT np,
                         sum(cited_by)::BIGINT tc FROM b GROUP BY bucket),
           kc AS (SELECT bucket, keyword, count(*)::BIGINT kc FROM
                   (SELECT bucket, unnest(keywords) AS keyword FROM b)
                  GROUP BY 1,2),
           tk AS (SELECT *, row_number() OVER (PARTITION BY bucket
                    ORDER BY kc DESC, keyword DESC) rk FROM kc)
           SELECT pb.bucket, pb.np, pb.tc, tk.keyword, tk.kc, tk.rk::INT
           FROM pb JOIN tk USING (bucket) WHERE rk <= 5""",
        ["bucket", "n_profiles", "total_cited_by", "keyword", "kw_count", "kw_rank"],
    )


def test_r7_r8_rankings(profiles, duck):
    _cmp(
        A.rank_profiles_3way(profiles, k=25),
        duck,
        """WITH m AS (
             SELECT 'cited_by' ranking, title, cited_by::BIGINT weight FROM profiles
             UNION ALL SELECT 'linked_cited_by', title, len(cited_papers)::BIGINT FROM profiles
             UNION ALL SELECT 'sources', title,
               (len(download_urls)+len(source_urls))::BIGINT FROM profiles)
           SELECT ranking, title, weight, rank::INT FROM
             (SELECT *, row_number() OVER (PARTITION BY ranking
                ORDER BY weight DESC, title DESC) rank FROM m)
           WHERE rank <= 25""",
        ["ranking", "title", "weight", "rank"],
    )


def test_r9_author_rollup_int_division(profiles, duck):
    _cmp(
        A.author_rollup(profiles),
        duck,
        """WITH e AS (SELECT title, unnest(authors) author, cited_by,
                        len(cited_papers) nl, journal, year FROM profiles)
           SELECT author, count(DISTINCT title)::BIGINT, sum(cited_by)::BIGINT,
                  sum(nl)::BIGINT, count(DISTINCT journal)::BIGINT,
                  count(DISTINCT year)::BIGINT,
                  (CASE WHEN sum(CASE WHEN cited_by>0 THEN 1 ELSE 0 END) > 0
                        THEN sum(cited_by) // sum(CASE WHEN cited_by>0 THEN 1 ELSE 0 END)
                        ELSE 0 END)::BIGINT
           FROM e GROUP BY author""",
        [
            "author", "n_profiles", "total_cited_by", "total_linked_cited_by",
            "n_journals", "n_years", "avg_cited_by",
        ],
    )


def test_r10_cooccurrence(profiles, duck):
    _cmp(
        A.keyword_cooccurrence(profiles),
        duck,
        """WITH e AS (SELECT DISTINCT * FROM
             (SELECT title, unnest(keywords) kw FROM profiles))
           SELECT a.kw, b.kw, count(*)::BIGINT,
                  any_value(lc.n)
           FROM e a JOIN e b ON a.title=b.title AND a.kw < b.kw
           JOIN (SELECT kw, count(DISTINCT title)::BIGINT n FROM e GROUP BY kw) lc
             ON lc.kw = a.kw
           GROUP BY a.kw, b.kw""",
        ["kw_a", "kw_b", "pair_count", "n_left"],
    )


def test_r11_journal_rollup(profiles, duck):
    _cmp(
        A.journal_rollup(profiles),
        duck,
        """WITH e AS (SELECT title, unnest(authors) author, cited_by FROM profiles),
           at AS (SELECT author, sum(cited_by)::BIGINT tc FROM e GROUP BY author),
           je AS (SELECT DISTINCT * FROM
             (SELECT journal, unnest(authors) author FROM profiles)),
           top AS (SELECT journal, author FROM
             (SELECT je.journal, je.author, at.tc,
                     row_number() OVER (PARTITION BY je.journal
                       ORDER BY at.tc DESC, je.author DESC) rn
              FROM je JOIN at USING (author)) WHERE rn = 1)
           SELECT p.journal, count(DISTINCT p.title)::BIGINT,
                  sum(p.cited_by)::BIGINT, count(DISTINCT p.year)::BIGINT,
                  any_value(top.author)
           FROM profiles p LEFT JOIN top ON top.journal = p.journal
           GROUP BY p.journal""",
        ["journal", "n_profiles", "total_cited_by", "n_years", "top_author"],
    )


def test_r12_allpairs_report(spark, profiles):
    from pyspark.sql import functions as F

    from bingcrawler_spark import xhash as X

    fps = profiles.limit(60).select(
        "title", X.simhash60_col(F.col("introduction")).alias("simhash")
    ).persist()
    fps.count()
    out = {
        (r.t_a, r.nn_rank): (r.t_b, r.distance)
        for r in A.allpairs_simhash_report(fps, nearest=3).collect()
    }
    rows = fps.collect()
    import itertools

    for a in rows:
        dists = sorted(
            (bin(a.simhash ^ b.simhash).count("1"), b.title)
            for b in rows
            if b.title != a.title
        )[:3]
        for rank, (d, t) in enumerate(dists, start=1):
            assert out[(a.title, rank)] == (t, d)


def test_r16_search_gate(spark, profiles, duck):
    expected = profiles.limit(8)
    out = A.search_gate(profiles, expected)
    got = {(r.cand_title, r.exp_title) for r in out.collect()}
    cands = profiles.collect()
    exps = expected.collect()
    want = {
        (c.title, e.title)
        for c in cands
        for e in exps
        if c.title[:40].lower() == e.title[:40].lower()
        or set(c.authors) & set(e.authors)
    }
    assert got == want


def test_r14_counters(spark, profiles):
    out = {r.counter: r.value for r in A.counters(profiles).collect()}
    assert out["profiles"] == profiles.select("title").distinct().count()


# ----------------------------------------------------------------- funnel


def test_funnel_strict_order(spark):
    from datetime import datetime as DT
    from bingcrawler_spark import analytics as A

    t = lambda s: DT(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        # u1 converts fully in order
        (1, t(1), "view"), (1, t(2), "click"), (1, t(3), "purchase"),
        # u2 clicks BEFORE viewing -> stops at view
        (2, t(5), "click"), (2, t(6), "view"),
        # u3 views only
        (3, t(1), "view"),
        # u4 purchase at the same ts as click -> strict > excludes it
        (4, t(1), "view"), (4, t(2), "click"), (4, t(2), "purchase"),
        # u5 never views -> counts nowhere
        (5, t(1), "click"), (5, t(2), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r["stage"]: r["n_users"]
           for r in A.funnel_stages(df, ["view", "click", "purchase"]).collect()}
    assert got == {"view": 4, "click": 2, "purchase": 1}


# -------------------------------------------------------------- retention


def test_retention_matrix_hand(spark):
    from datetime import datetime as DT
    from bingcrawler_spark import analytics as A

    rows = [
        (1, DT(2024, 1, 1, 5)), (1, DT(2024, 1, 1, 9)),  # same day dedups
        (1, DT(2024, 1, 3, 1)),
        (2, DT(2024, 1, 2, 0)), (2, DT(2024, 1, 3, 0)),
        (3, DT(2024, 1, 1, 0)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {(r["cohort_day"], r["day_offset"]): r["n_users"]
           for r in A.retention_matrix(df).collect()}
    assert got == {(0, 0): 2, (0, 2): 1, (1, 0): 1, (1, 1): 1}


# --------------------------------------------------------- spike detection


def test_error_spikes_integer_threshold(spark):
    from datetime import datetime as DT
    from bingcrawler_spark import analytics as A

    rows = []
    # hours 0..7: 10 errors each; hour 8: 20 (spike); hour 9: 12 (not)
    for h, n in [(i, 10) for i in range(8)] + [(8, 20), (9, 12)]:
        rows += [(DT(2024, 1, 1, h, 0, s), "error") for s in range(n)]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string")
    got = {r["hour_idx"]: r for r in A.error_spikes(df).collect()}
    assert got[0]["spike"] == 0 and got[0]["prev_n"] == 0
    # hour 5 has only 5 prior hours -> below min_prev, never a spike
    assert got[5]["prev_n"] == 5 and got[5]["spike"] == 0
    # hour 8: 20 * 8 * 100 = 16000 > 150 * 80 = 12000 -> spike
    assert got[8]["prev_n"] == 8 and got[8]["spike"] == 1
    # hour 9: prev includes the spike (sum 90, n 9):
    # 12 * 9 * 100 = 10800 <= 150 * 90 = 13500 -> calm
    assert got[9]["spike"] == 0


# --------------------------------------------------------------- as-of join


def test_asof_join_semantics(spark):
    from datetime import datetime as DT
    from bingcrawler_spark import analytics as A

    t = lambda s: DT(2024, 1, 1, 0, 0, s)  # noqa: E731
    quotes = spark.createDataFrame(
        [(1, t(10), 100), (1, t(20), 200), (2, t(15), 900)],
        "key long, ts timestamp, val long",
    )
    events = spark.createDataFrame(
        [
            (0, 1, t(5)),    # before any quote -> NULL
            (1, 1, t(10)),   # exactly at quote ts -> <= includes it
            (2, 1, t(15)),   # between -> earlier quote
            (3, 1, t(25)),   # after both -> latest
            (4, 2, t(16)),   # other key isolated
            (5, 3, t(50)),   # key with no quotes -> NULL
        ],
        "event_id long, key long, ts timestamp",
    )
    got = {r["event_id"]: r["asof_val"]
           for r in A.asof_join(events, quotes).collect()}
    assert got == {0: None, 1: 100, 2: 100, 3: 200, 4: 900, 5: None}


# ------------------------------------------------- r12 banded fused tail


def _old_banded_tail(cand, nearest):
    """The pre-r4 tail of banded_nn_report: explicit dropDuplicates on the
    directional pair then row_number over (distance, t_b).  Kept here as
    the specification the fused lag+running-sum tail must reproduce."""
    from pyspark.sql import Window, functions as F

    w = Window.partitionBy("t_a").orderBy(F.col("distance").asc(), F.col("t_b").asc())
    return (
        cand.dropDuplicates(["t_a", "t_b"])
        .withColumn("nn_rank", F.row_number().over(w).cast("int"))
        .where(F.col("nn_rank") <= nearest)
        .select("t_a", "t_b", "distance", "nn_rank")
    )


def _fps_multiband(spark):
    """Fingerprint corpus engineered for HEAVY multi-band duplicates:
    clusters of identical hashes (pairs share all 4 bands -> 4 candidate
    copies) plus 1-bit perturbations (share 3 bands -> 3 copies), so the
    fused dedup actually has duplicates to collapse, plus distance ties
    across several t_b to exercise the (distance, t_b) tie order."""
    base = 0x0ABCDEF12345678
    rows = []
    for i in range(6):
        rows.append((f"c{i:02d}", base))               # identical cluster
    for i in range(6):
        rows.append((f"p{i:02d}", base ^ (1 << i)))    # 1-bit flips, dist 2 pairs
    for i in range(4):
        rows.append((f"q{i:02d}", base ^ (0b11 << (15 * i))))  # per-band 2-bit flips
    return spark.createDataFrame(rows, "title string, simhash long")


def test_r12_banded_fused_tail_vs_old_tail(spark):
    fps = _fps_multiband(spark)
    cand = A.banded_candidates(fps).persist()
    cand.count()
    # sanity: the corpus really produces multi-band duplicate pairs
    n_all = cand.count()
    n_distinct = cand.dropDuplicates(["t_a", "t_b"]).count()
    assert n_all > n_distinct
    for nearest in (1, 3, 5):
        got = sorted(map(tuple, A.banded_nn_report(fps, nearest=nearest).collect()))
        want = sorted(map(tuple, _old_banded_tail(cand, nearest).collect()))
        assert got == want
    cand.unpersist()


def test_r12_banded_equals_allpairs_within_pigeonhole(spark):
    """On a corpus where every pairwise hamming distance < n_bands, the
    pigeonhole guarantee makes the banded candidate set complete, so the
    scale path must equal the exact all-pairs report row for row."""
    base = 0x7777777777777777 & ((1 << 60) - 1)
    rows = [("t%02d" % i, base ^ (1 << i) if i else base) for i in range(10)]
    fps = spark.createDataFrame(rows, "title string, simhash long")
    got = sorted(map(tuple, A.banded_nn_report(fps, nearest=4).collect()))
    want = sorted(map(tuple, A.allpairs_simhash_report(fps, nearest=4).collect()))
    assert got == want
