"""Host PageRank: hand-computed fixed points, dangling mass, and the
DuckDB chained-CTE twin."""

import duckdb
import pytest

from bingcrawler_spark import graph as G


def _ranks(spark, edges, n_iter=5):
    df = spark.createDataFrame(edges, "s long, d long")
    return {
        r["host"]: (r["rank_fp"], r["out_w"])
        for r in G.host_pagerank(df, n_iter=n_iter).collect()
    }


def test_cycle_is_fixed_point(spark):
    # Symmetric cycle: damped update maps 1.0 -> 0.15 + 0.85 = 1.0 exactly.
    got = _ranks(spark, [(0, 1), (1, 2), (2, 0)])
    assert got == {0: (1_000_000, 1), 1: (1_000_000, 1), 2: (1_000_000, 1)}


def test_multiplicity_cancels_out_weight(spark):
    # Two parallel 0->1 edges split rank/2 each; total contribution equal
    # to the single-edge case, so the cycle fixed point survives.
    got = _ranks(spark, [(0, 1), (0, 1), (1, 0)])
    assert got[0][0] == 1_000_000 and got[1][0] == 1_000_000
    assert got[0][1] == 2 and got[1][1] == 1


def test_dangling_sink_converges(spark):
    # 0 -> 1, nothing back: 0 settles at teleport mass, 1 at
    # 150000 + floor(150000*85/100) = 277500 from iteration 2 on.
    got = _ranks(spark, [(0, 1)])
    assert got == {0: (150_000, 1), 1: (277_500, 0)}


def _hits(spark, edges, n_iter=3):
    df = spark.createDataFrame(edges, "s long, d long")
    return {
        r["host"]: (r["hub_fp"], r["auth_fp"])
        for r in G.host_hits(df, n_iter=n_iter).collect()
    }


def test_hits_star(spark):
    # Three hubs pointing at one authority: the textbook separation.
    got = _hits(spark, [(1, 0), (2, 0), (3, 0)])
    assert got[0] == (0, 1_000_000)
    assert got[1] == got[2] == got[3] == (1_000_000, 0)


def test_hits_chain_fixed_point(spark):
    # 0 -> 1 -> 2: divide-by-max makes both ends saturate at 1.0.
    got = _hits(spark, [(0, 1), (1, 2)])
    assert got == {
        0: (1_000_000, 0),
        1: (1_000_000, 1_000_000),
        2: (0, 1_000_000),
    }


def test_hits_multiplicity_weights_hub(spark):
    # Host 0 links twice to the lone authority, host 2 once: 0 earns
    # exactly double the hub mass before normalization.
    got = _hits(spark, [(0, 1), (0, 1), (2, 1)])
    assert got[0][0] == 1_000_000 and got[2][0] == 500_000
    assert got[1][1] == 1_000_000


@pytest.mark.parametrize("n_iter", [1, 3])
def test_hits_matches_duckdb_twin(spark, sf_dir, n_iter):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(
        tuple(r)
        for r in G.host_hits(
            G.doc_host_edges(docs.select("doc_id", "text")), n_iter=n_iter
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            G.host_hits_sql("SELECT doc_id, text FROM documents", n_iter)
        ).fetchall()
    )
    assert got == want


@pytest.mark.parametrize("n_iter", [1, 5])
def test_matches_duckdb_twin(spark, sf_dir, n_iter):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(
        tuple(r)
        for r in G.host_pagerank(
            G.doc_host_edges(docs.select("doc_id", "text")), n_iter=n_iter
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            G.host_pagerank_sql("SELECT doc_id, text FROM documents", n_iter)
        ).fetchall()
    )
    assert got == want


# --------------------------------------------------------------- anchor text


def test_anchor_text_topk_counts_and_tiebreak(spark):
    # host is the first md5(text) byte mod 32; pin texts whose anchors
    # collide and check count-desc, anchor-asc ordering within a host.
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["x y tail", "x y other", "b b pad", "a a pad"]
        )],
        "doc_id long, text string",
    )
    rows = G.anchor_text_topk(docs, topk=3).collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(
            (r["rank"], r["anchor"], r["n_links"])
        )
    # every host's ranks are 1..n in order, counts non-increasing,
    # ties broken by anchor ascending
    for anchors in by_host.values():
        anchors.sort()
        for i, (rank, anchor, n) in enumerate(anchors, start=1):
            assert rank == i
        for (r1, a1, n1), (r2, a2, n2) in zip(anchors, anchors[1:]):
            assert n1 > n2 or (n1 == n2 and a1 < a2)
    assert sum(n for v in by_host.values() for _, _, n in v) == 4


def test_anchor_text_matches_duckdb(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i % 3} q{i % 2} body text {i}") for i in range(40)],
        "doc_id long, text string",
    )
    got = sorted(tuple(r) for r in G.anchor_text_topk(docs).collect())
    con = duckdb.connect()
    con.register("docs", docs.toPandas())
    want = sorted(
        tuple(r)
        for r in con.sql(
            G.anchor_text_sql("SELECT doc_id, text FROM docs")
        ).fetchall()
    )
    assert got == want


# ----------------------------------------------------------------- link spam


def test_link_spam_reciprocal_and_self(spark):
    # 0<->1 reciprocal pair (weights 2 and 1), 2->2 self loop, 3->0 one-way.
    edges = spark.createDataFrame(
        [(0, 1), (0, 1), (1, 0), (2, 2), (3, 0)], "s long, d long"
    )
    got = {r["host"]: r.asDict() for r in G.link_spam_signals(edges).collect()}
    assert got[0]["out_w"] == 2 and got[0]["in_w"] == 2
    assert got[0]["recip_w"] == 1  # min(cnt(0->1)=2, cnt(1->0)=1)
    assert got[0]["recip_ppm"] == 500_000
    assert got[1]["recip_w"] == 1 and got[1]["recip_ppm"] == 1_000_000
    assert got[2]["self_w"] == 1 and got[2]["recip_w"] == 0
    assert got[3]["out_w"] == 1 and got[3]["in_w"] == 0 and got[3]["recip_ppm"] == 0


# ------------------------------------------------------- seed distance


def _dists(spark, edges, n_iter=5, seed_mod=8):
    df = spark.createDataFrame(edges, "s long, d long")
    return {
        r["host"]: r["dist"]
        for r in G.seed_distance(df, seed_mod=seed_mod, n_iter=n_iter).collect()
    }


def test_seed_distance_chain_and_unreached(spark):
    # 0 is the only seed (host % 8 == 0); 5->6 is a disconnected island.
    got = _dists(spark, [(0, 1), (1, 2), (2, 3), (5, 6)])
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 5: -1, 6: -1}


def test_seed_distance_min_over_paths(spark):
    # Two paths 0->3: direct (1 hop) and via 1,2 (3 hops) -> min wins.
    got = _dists(spark, [(0, 3), (0, 1), (1, 2), (2, 3)])
    assert got == {0: 0, 1: 1, 2: 2, 3: 1}


def test_seed_distance_bounded_by_n_iter(spark):
    # 4-hop tail with only 2 iterations: hosts past the horizon stay -1.
    got = _dists(spark, [(0, 1), (1, 2), (2, 3), (3, 4)], n_iter=2)
    assert got == {0: 0, 1: 1, 2: 2, 3: -1, 4: -1}


def test_seed_distance_matches_duckdb_twin(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(
        tuple(r)
        for r in G.seed_distance(
            G.doc_host_edges(docs.select("doc_id", "text"))
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            G.seed_distance_sql("SELECT doc_id, text FROM documents")
        ).fetchall()
    )
    assert got == want


# ----------------------------------------------------------- trustrank


def test_trustrank_cycle_seed_masses(spark):
    # Cycle 0->1->2->0, seed {0}: uniform PR is the 1.0 fixed point;
    # the seed-teleport chain is hand-iterable integer arithmetic.
    df = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "s long, d long")
    got = {
        r["host"]: (r["rank_fp"], r["trust_fp"], r["spam_mass_ppm"])
        for r in G.host_trustrank(df, n_iter=2).collect()
    }
    # t0 = (1e6, 0, 0); t1 = (150000, 850000, 0); t2 = (150000+0,
    # 0+127500, 0+722500) where 850000*85//100 = 722500.
    assert got[0] == (1_000_000, 150_000, 850_000)
    assert got[1] == (1_000_000, 127_500, 872_500)
    assert got[2] == (1_000_000, 722_500, 277_500)


def test_trustrank_all_seeds_equals_pagerank(spark):
    # seed_mod=1 makes every host a seed: trust == rank, spam mass 0.
    df = spark.createDataFrame([(0, 1), (1, 0), (1, 2)], "s long, d long")
    for r in G.host_trustrank(df, seed_mod=1, n_iter=4).collect():
        assert r["trust_fp"] == r["rank_fp"] and r["spam_mass_ppm"] == 0


def test_trustrank_matches_duckdb_twin(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(
        tuple(r)
        for r in G.host_trustrank(
            G.doc_host_edges(docs.select("doc_id", "text"))
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            G.host_trustrank_sql("SELECT doc_id, text FROM documents")
        ).fetchall()
    )
    assert got == want
