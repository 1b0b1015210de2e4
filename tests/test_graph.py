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
