"""Host-graph PageRank — the crawl-priority signal BingCrawler proxies
with its static per-URL weight field (`UrlNode.weight`, popped
weight-DESC by `BingCrawlerTask.java`'s frontier loop).  A web-scale
frontier ranks hosts by link authority instead; this module computes
that signal the distributed way: iterated (join ranks ⨝ edges →
groupBy dst → sum), the textbook Spark PageRank shape, with two
engineering choices that matter at 10^10-URL scale:

* **Fixed-point integer arithmetic.**  Ranks are int64 micro-units
  (1.0 ≡ 1_000_000); the damping step is `cnt * ((rank * 85) div
  (100 * out_w))`.  Integer sums are associative-exact, so the result
  is bit-identical regardless of partitioning / aggregation order —
  float PageRank differs in the last ulp between any two engines (or
  two runs), which would poison both the DuckDB oracle hash and
  cross-cluster reproducibility of the priority signal.
* **Aggregated edges.**  The multigraph collapses to (src, dst, cnt)
  once; each iteration shuffles only |hosts| rank rows and the grouped
  edge list — never the document corpus.  Iterations localCheckpoint
  every other round to keep Catalyst re-planning a leaf, not a
  5-deep join tree (the same lineage-cut the wave loop uses).

The driver query derives a deterministic host graph from `documents`
(src = doc_id mod H, dst = first md5(text) byte mod H) so DuckDB can
replay the identical graph; `host_pagerank_sql` emits the matching
chained-CTE oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TELEPORT_FP = 150_000  # 0.15 in micro-units
INIT_FP = 1_000_000  # 1.0


def doc_host_edges(docs: DataFrame, n_hosts: int = 32) -> DataFrame:
    """documents(doc_id, text) → one directed host edge per doc:
    src = doc_id mod H, dst = first byte of md5(text) mod H (a
    deterministic stand-in for 'this page links to the host its
    content hashes to' that both engines can derive)."""
    return docs.select(
        (F.col("doc_id") % n_hosts).cast("long").alias("s"),
        (
            F.conv(F.substring(F.md5(F.col("text").cast("binary")), 1, 2), 16, 10)
            .cast("long")
            % n_hosts
        ).alias("d"),
    )


def host_pagerank(
    edges: DataFrame, n_iter: int = 5, checkpoint_every: int = 2
) -> DataFrame:
    """(s, d) edge multigraph → (host, rank_fp, out_w) after n_iter
    damped iterations (d=0.85) in int64 fixed point.

    Scale shape per iteration: one shuffle keyed by src (ranks ⨝
    grouped edges) + one keyed by dst (contribution sum) — both over
    |hosts|-sized relations, corpus never re-read.  Dangling hosts
    (no outlinks) keep contributing nothing; hosts with no inlinks
    settle at the teleport mass, exactly as the SQL oracle defines."""
    g = edges.groupBy("s", "d").agg(F.count(F.lit(1)).alias("cnt"))
    ow = g.groupBy("s").agg(F.sum("cnt").alias("out_w"))
    ge = g.join(ow, "s").persist()
    hosts = (
        edges.select(F.col("s").alias("host"))
        .union(edges.select(F.col("d").alias("host")))
        .distinct()
        .persist()
    )
    ranks = hosts.withColumn("r", F.lit(INIT_FP).cast("long"))
    for i in range(n_iter):
        contrib = (
            ge.join(ranks, ge["s"] == ranks["host"])
            .select(
                F.col("d"),
                (
                    F.col("cnt")
                    * F.expr("div(r * 85, 100 * out_w)")
                ).alias("c"),
            )
            .groupBy("d")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            hosts.join(contrib, hosts["host"] == contrib["d"], "left")
            .select(
                "host",
                (F.lit(TELEPORT_FP) + F.coalesce(F.col("c"), F.lit(0)))
                .cast("long")
                .alias("r"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            ranks = ranks.localCheckpoint(eager=False)
    out = (
        ranks.join(ow, ranks["host"] == ow["s"], "left")
        .select(
            F.col("host").cast("int").alias("host"),
            F.col("r").alias("rank_fp"),
            F.coalesce(F.col("out_w"), F.lit(0)).cast("long").alias("out_w"),
        )
    )
    return out


def host_hits(
    edges: DataFrame, n_iter: int = 3, checkpoint_every: int = 2
) -> DataFrame:
    """HITS hubs/authorities over the same (s, d) host multigraph —
    PageRank's companion signal (Kleinberg 1999): a good hub links to
    good authorities and vice versa.  The crawl frontier uses hub
    scores to prioritize link-rich index pages and authority scores to
    prioritize content hosts.

    Same engineering contract as host_pagerank: int64 fixed point
    (1.0 ≡ 1_000_000), with the paper's L2 normalization replaced by
    divide-by-max each half-step (`v·10⁶ div max(v)`) so every value
    stays in [0, 10⁶] — bounded (no overflow at any scale while
    Σ edge-multiplicities < 9·10¹²), associative-exact, bit-identical
    across partitionings and engines.  Per half-iteration: one shuffle
    keyed by the joined endpoint + one max() reduce broadcast back —
    all over |hosts|-sized relations."""
    g = edges.groupBy("s", "d").agg(F.count(F.lit(1)).alias("cnt")).persist()
    hosts = (
        edges.select(F.col("s").alias("host"))
        .union(edges.select(F.col("d").alias("host")))
        .distinct()
        .persist()
    )

    def _norm(df: DataFrame, col: str) -> DataFrame:
        # df is referenced twice (max reduce + the divide); persist so the
        # raw half-step computes once — unpersisted, each half-step would
        # recompute its whole ancestry per reference (2^half-steps blowup).
        df = df.persist()
        m = df.agg(F.greatest(F.max(col), F.lit(1)).alias("m"))
        return df.crossJoin(F.broadcast(m)).select(
            "host", F.expr(f"div({col} * {INIT_FP}, m)").alias(col)
        )

    hub = hosts.withColumn("h", F.lit(INIT_FP).cast("long"))
    auth = hosts.withColumn("a", F.lit(0).cast("long"))
    for i in range(n_iter):
        araw = (
            g.join(hub.withColumnRenamed("host", "sh"), F.col("sh") == g["s"])
            .select(F.col("d"), (F.col("cnt") * F.col("h")).alias("x"))
            .groupBy("d")
            .agg(F.sum("x").alias("x"))
        )
        auth = _norm(
            hosts.join(araw, hosts["host"] == araw["d"], "left").select(
                "host", F.coalesce(F.col("x"), F.lit(0)).cast("long").alias("a")
            ),
            "a",
        )
        hraw = (
            g.join(auth.withColumnRenamed("host", "ah"), F.col("ah") == g["d"])
            .select(F.col("s"), (F.col("cnt") * F.col("a")).alias("x"))
            .groupBy("s")
            .agg(F.sum("x").alias("x"))
        )
        hub = _norm(
            hosts.join(hraw, hosts["host"] == hraw["s"], "left").select(
                "host", F.coalesce(F.col("x"), F.lit(0)).cast("long").alias("h")
            ),
            "h",
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            # eager: materialize now so Catalyst plans the next iteration
            # from a leaf (|hosts|-sized) instead of the full join history.
            hub = hub.localCheckpoint(eager=True)
            auth = auth.localCheckpoint(eager=True)
    return hub.join(auth, "host").select(
        F.col("host").cast("int").alias("host"),
        F.col("h").alias("hub_fp"),
        F.col("a").alias("auth_fp"),
    )


def host_hits_sql(docs_sql: str, n_iter: int = 3, n_hosts: int = 32) -> str:
    """Chained-CTE DuckDB twin of doc_host_edges → host_hits."""
    # AS MATERIALIZED: every iteration CTE is referenced twice (the value
    # column and the max() normalizer); DuckDB would otherwise inline each
    # reference, recomputing the whole chain 2^half-steps times.
    ctes = [
        f"e AS MATERIALIZED (SELECT doc_id % {n_hosts} AS s,"
        f" ('0x' || substr(md5(text), 1, 2))::BIGINT % {n_hosts} AS d"
        f" FROM ({docs_sql}))",
        "g AS MATERIALIZED (SELECT s, d, count(*)::BIGINT AS cnt"
        " FROM e GROUP BY s, d)",
        "hosts AS MATERIALIZED (SELECT DISTINCT s AS host FROM e"
        " UNION SELECT DISTINCT d FROM e)",
        f"h0 AS (SELECT host, {INIT_FP}::BIGINT AS h FROM hosts)",
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            f"a{i}r AS MATERIALIZED (SELECT hs.host,"
            f" coalesce(sum(g.cnt * hb.h), 0)::BIGINT AS a"
            f" FROM hosts hs LEFT JOIN g ON g.d = hs.host"
            f" LEFT JOIN h{i - 1} hb ON hb.host = g.s GROUP BY hs.host)"
        )
        ctes.append(
            f"a{i} AS MATERIALIZED (SELECT host, (a * {INIT_FP}"
            f" // greatest((SELECT max(a) FROM a{i}r), 1))::BIGINT AS a"
            f" FROM a{i}r)"
        )
        ctes.append(
            f"h{i}r AS MATERIALIZED (SELECT hs.host,"
            f" coalesce(sum(g.cnt * au.a), 0)::BIGINT AS h"
            f" FROM hosts hs LEFT JOIN g ON g.s = hs.host"
            f" LEFT JOIN a{i} au ON au.host = g.d GROUP BY hs.host)"
        )
        ctes.append(
            f"h{i} AS MATERIALIZED (SELECT host, (h * {INIT_FP}"
            f" // greatest((SELECT max(h) FROM h{i}r), 1))::BIGINT AS h"
            f" FROM h{i}r)"
        )
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT hs.host::INT AS host,"
        f" h.h AS hub_fp, a.a AS auth_fp"
        f" FROM hosts hs JOIN h{n_iter} h ON h.host = hs.host"
        f" JOIN a{n_iter} a ON a.host = hs.host"
    )


def host_pagerank_sql(
    docs_sql: str, n_iter: int = 5, n_hosts: int = 32
) -> str:
    """Chained-CTE DuckDB twin of doc_host_edges → host_pagerank."""
    ctes = [
        f"e AS (SELECT doc_id % {n_hosts} AS s,"
        f" ('0x' || substr(md5(text), 1, 2))::BIGINT % {n_hosts} AS d"
        f" FROM ({docs_sql}))",
        "g AS (SELECT s, d, count(*)::BIGINT AS cnt FROM e GROUP BY s, d)",
        "ow AS (SELECT s, sum(cnt)::BIGINT AS out_w FROM g GROUP BY s)",
        "hosts AS (SELECT DISTINCT s AS host FROM e"
        " UNION SELECT DISTINCT d FROM e)",
        f"it0 AS (SELECT host, {INIT_FP}::BIGINT AS r FROM hosts)",
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            f"it{i} AS (SELECT h.host,"
            f" ({TELEPORT_FP} + coalesce(sum(g.cnt *"
            f" ((r.r * 85) // (100 * ow.out_w))), 0))::BIGINT AS r"
            f" FROM hosts h LEFT JOIN g ON g.d = h.host"
            f" LEFT JOIN it{i - 1} r ON r.host = g.s"
            f" LEFT JOIN ow ON ow.s = g.s GROUP BY h.host)"
        )
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT h.host::INT AS host,"
        f" r.r AS rank_fp, coalesce(ow.out_w, 0)::BIGINT AS out_w"
        f" FROM hosts h JOIN it{n_iter} r ON r.host = h.host"
        f" LEFT JOIN ow ON ow.s = h.host"
    )
