"""Physical-plan contracts for the scale-path queries: the shapes that
must never regress silently.  A CartesianProduct in a pair-generating
query is the difference between a banded near-dup pass and an O(n²)
explosion at 10^10 docs; these assertions pin the plan class, not the
timing, so they hold on any host.

BroadcastNestedLoopJoin is allowed only where the design calls for a
crossJoin against a broadcast 1-row aggregate or a tiny centroid/stats
table (BM25's corpus stats, TF-IDF's N, IVF's centroids) — those are
listed explicitly; the banded dedup paths must be pure equi-joins."""

import pytest

from bingcrawler_spark import driver_queries as DQ

# pair-generating / heavy queries: equi-join-only contract
EQUI_ONLY = [
    "dd_minhash_lsh",
    "dd_simhash_neardup",
    "dd_containment",
    "dd_ngram_jaccard",
    "r12_banded_nn",
    "f18_dust_rules",
    "ds_split_leakage",
    "dd_embedding_clones",
    "ann_lsh_topk",
]

# broadcast-crossJoin-by-design (1-row aggregates / tiny broadcast dims)
BROADCAST_OK = [
    "ix_tfidf_keywords",
    "ix_bm25_search",
    "ann_ivf_topk",
    "ann_bruteforce_topk",
    "f1_frontier_pop",
    "f10_politeness_pop",
    "p9_tender_pipeline",
]


def _plan(spark, sf_dir, name):
    df = DQ.QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", EQUI_ONLY)
def test_no_cartesian_or_nested_loop(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


@pytest.mark.parametrize("name", BROADCAST_OK)
def test_no_cartesian(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, name
