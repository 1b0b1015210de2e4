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
    ge, ow, hosts = _grouped_edges(edges)
    ranks = _damped_loop(ge, hosts, n_iter, checkpoint_every, None)
    out = (
        ranks.join(ow, ranks["host"] == ow["s"], "left")
        .select(
            F.col("host").cast("int").alias("host"),
            F.col("r").alias("rank_fp"),
            F.coalesce(F.col("out_w"), F.lit(0)).cast("long").alias("out_w"),
        )
        # eager: materialize the |hosts|-row result so the grouped-edge /
        # host caches can be released NOW instead of leaking into the
        # session (a long-lived driver running the suite would otherwise
        # accumulate orphaned storage per query)
        .localCheckpoint(eager=True)
    )
    for c in (ge, ow, hosts):
        c.unpersist()
    return out


def _grouped_edges(edges: DataFrame):
    """Collapse the multigraph ONCE into the three relations every
    iterative chain consumes: grouped edges with folded out-weight
    (s, d, cnt, out_w), per-src out-weight (s, out_w), and the host
    universe.  All persisted; callers unpersist after eager-checkpointing
    their |hosts|-row result."""
    g = edges.groupBy("s", "d").agg(F.count(F.lit(1)).alias("cnt"))
    ow = g.groupBy("s").agg(F.sum("cnt").alias("out_w")).persist()
    ge = g.join(ow, "s").persist()
    hosts = (
        edges.select(F.col("s").alias("host"))
        .union(edges.select(F.col("d").alias("host")))
        .distinct()
        .persist()
    )
    return ge, ow, hosts


def _damped_loop(
    ge: DataFrame,
    hosts: DataFrame,
    n_iter: int,
    checkpoint_every: int,
    seed_mod: int | None,
) -> DataFrame:
    if seed_mod is None:
        init = F.lit(INIT_FP)
        tele = F.lit(TELEPORT_FP)
    else:
        is_seed = F.col("host") % seed_mod == 0
        init = F.when(is_seed, F.lit(INIT_FP)).otherwise(F.lit(0))
        tele = F.when(is_seed, F.lit(TELEPORT_FP)).otherwise(F.lit(0))
    ranks = hosts.withColumn("r", init.cast("long"))
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
                (tele + F.coalesce(F.col("c"), F.lit(0)))
                .cast("long")
                .alias("r"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


UNREACHED_FP = 1 << 30  # internal BFS sentinel, far above any k-hop dist


def seed_distance(
    edges: DataFrame,
    seed_mod: int = 8,
    n_iter: int = 5,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Bounded BFS hop distance from seed hosts over the (s, d) host
    multigraph — the crawl-depth signal a tiered frontier budgets with
    (pages k hops from trusted seeds get tier-k politeness/recrawl
    budgets; the reference tracks per-URL `depth` linearly from its own
    parent chain, UrlsDbManager putUrl depth+1, but never graph distance
    from the seed SET, which is what actually bounds spam exposure).

    Distributed shape per iteration: one shuffle keyed by src (dist ⨝
    distinct edges) + one min-reduce keyed by dst — |hosts|-sized
    relations only, corpus never re-read.  Distances are exact small
    ints (associative min), so the result is bit-identical across
    partitionings.  Hosts unreached within n_iter hops report -1.

    Same double-reference trap as HITS: each iteration's dist feeds both
    the relax join and the keep-old-value leg, so persist each round and
    eagerly localCheckpoint every `checkpoint_every` to keep Catalyst
    planning from a leaf."""
    g = edges.select("s", "d").distinct().persist()
    hosts = (
        edges.select(F.col("s").alias("host"))
        .union(edges.select(F.col("d").alias("host")))
        .distinct()
        .persist()
    )
    rounds: list[DataFrame] = []  # per-round caches, released on exit
    dist = hosts.select(
        "host",
        F.when(F.col("host") % seed_mod == 0, F.lit(0))
        .otherwise(F.lit(UNREACHED_FP))
        .cast("long")
        .alias("dist"),
    )
    for i in range(n_iter):
        dist = dist.persist()
        rounds.append(dist)
        relax = (
            g.join(dist.withColumnRenamed("host", "sh"), F.col("sh") == g["s"])
            .select(F.col("d"), (F.col("dist") + 1).alias("nd"))
            .groupBy("d")
            .agg(F.min("nd").alias("nd"))
        )
        dist = (
            dist.join(relax, dist["host"] == relax["d"], "left")
            .select(
                "host",
                F.least(
                    F.col("dist"),
                    F.coalesce(F.col("nd"), F.lit(UNREACHED_FP)),
                )
                .cast("long")
                .alias("dist"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            dist = dist.localCheckpoint(eager=True)
    out = dist.select(
        F.col("host").cast("int").alias("host"),
        F.when(F.col("dist") >= UNREACHED_FP, F.lit(-1))
        .otherwise(F.col("dist"))
        .cast("long")
        .alias("dist"),
    ).localCheckpoint(eager=True)
    for c in (g, hosts, *rounds):
        c.unpersist()
    return out


def seed_distance_sql(
    docs_sql: str, seed_mod: int = 8, n_iter: int = 5, n_hosts: int = 32
) -> str:
    """Chained-CTE DuckDB twin of doc_host_edges → seed_distance.
    Each iteration CTE is referenced twice (keep-old + relax legs), so
    AS MATERIALIZED prevents the 2^n inline recompute (the HITS lesson)."""
    inf = UNREACHED_FP
    ctes = [
        f"e AS (SELECT doc_id % {n_hosts} AS s,"
        f" ('0x' || substr(md5(text), 1, 2))::BIGINT % {n_hosts} AS d"
        f" FROM ({docs_sql}))",
        "g AS MATERIALIZED (SELECT DISTINCT s, d FROM e)",
        "hosts AS MATERIALIZED (SELECT DISTINCT s AS host FROM e"
        " UNION SELECT DISTINCT d FROM e)",
        f"d0 AS (SELECT host, (CASE WHEN host % {seed_mod} = 0 THEN 0"
        f" ELSE {inf} END)::BIGINT AS dist FROM hosts)",
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            f"d{i} AS MATERIALIZED (SELECT h.host,"
            f" least(p.dist, coalesce(min(q.dist + 1), {inf}))::BIGINT AS dist"
            f" FROM hosts h JOIN d{i - 1} p ON p.host = h.host"
            f" LEFT JOIN g ON g.d = h.host"
            f" LEFT JOIN d{i - 1} q ON q.host = g.s"
            f" GROUP BY h.host, p.dist)"
        )
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT host::INT AS host,"
        f" (CASE WHEN dist >= {inf} THEN -1 ELSE dist END)::BIGINT AS dist"
        f" FROM d{n_iter}"
    )


def host_trustrank(
    edges: DataFrame,
    seed_mod: int = 8,
    n_iter: int = 5,
    checkpoint_every: int = 2,
) -> DataFrame:
    """TrustRank (Gyöngyi et al. 2004): PageRank with teleport mass
    restricted to a trusted seed set, plus the derived spam-mass
    estimate — the frontier-hygiene upgrade of gr_link_spam's local
    signals (spam mass looks at where a host's RANK comes from, not just
    its own degree profile).

    Runs the same damped int64 fixed-point loop as host_pagerank twice
    (uniform teleport, then seed-only teleport) and reports
    `spam_mass_ppm` = max(rank − trust, 0)·10⁶ div rank.  rank_fp ≥
    teleport mass > 0 always, so the divide is safe; everything stays
    integer and therefore partition- and engine-exact.  Scale shape:
    identical to host_pagerank (|hosts|-sized shuffles per iteration,
    corpus read once into the grouped edge list)."""
    # the grouped edge list and host universe are built ONCE and shared
    # by both damped chains — calling host_pagerank twice here would
    # re-aggregate the edge multigraph per chain
    ge, ow, hosts = _grouped_edges(edges)
    pr = _damped_loop(ge, hosts, n_iter, checkpoint_every, None).select(
        "host", F.col("r").alias("rank_fp")
    )
    tr = _damped_loop(ge, hosts, n_iter, checkpoint_every, seed_mod).select(
        "host", F.col("r").alias("trust_fp")
    )
    out = (
        pr.join(tr, "host")
        .select(
            F.col("host").cast("int").alias("host"),
            "rank_fp",
            "trust_fp",
            F.expr(
                "div(greatest(rank_fp - trust_fp, 0) * 1000000, rank_fp)"
            ).alias("spam_mass_ppm"),
        )
        .localCheckpoint(eager=True)
    )
    for c in (ge, ow, hosts):
        c.unpersist()
    return out


def host_trustrank_sql(
    docs_sql: str, seed_mod: int = 8, n_iter: int = 5, n_hosts: int = 32
) -> str:
    """Chained-CTE DuckDB twin of doc_host_edges → host_trustrank:
    two damped chains (uniform it*, seed-teleport tt*) over one shared
    grouped edge list."""
    ctes = [
        f"e AS (SELECT doc_id % {n_hosts} AS s,"
        f" ('0x' || substr(md5(text), 1, 2))::BIGINT % {n_hosts} AS d"
        f" FROM ({docs_sql}))",
        "g AS MATERIALIZED (SELECT s, d, count(*)::BIGINT AS cnt"
        " FROM e GROUP BY s, d)",
        "ow AS MATERIALIZED (SELECT s, sum(cnt)::BIGINT AS out_w"
        " FROM g GROUP BY s)",
        "hosts AS MATERIALIZED (SELECT DISTINCT s AS host FROM e"
        " UNION SELECT DISTINCT d FROM e)",
        f"it0 AS (SELECT host, {INIT_FP}::BIGINT AS r FROM hosts)",
        f"tt0 AS (SELECT host, (CASE WHEN host % {seed_mod} = 0"
        f" THEN {INIT_FP} ELSE 0 END)::BIGINT AS r FROM hosts)",
    ]
    for i in range(1, n_iter + 1):
        for pfx, tele in (
            ("it", str(TELEPORT_FP)),
            ("tt", f"CASE WHEN h.host % {seed_mod} = 0"
                   f" THEN {TELEPORT_FP} ELSE 0 END"),
        ):
            ctes.append(
                f"{pfx}{i} AS MATERIALIZED (SELECT h.host,"
                f" ({tele} + coalesce(sum(g.cnt *"
                f" ((r.r * 85) // (100 * ow.out_w))), 0))::BIGINT AS r"
                f" FROM hosts h LEFT JOIN g ON g.d = h.host"
                f" LEFT JOIN {pfx}{i - 1} r ON r.host = g.s"
                f" LEFT JOIN ow ON ow.s = g.s GROUP BY h.host)"
            )
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT h.host::INT AS host,"
        f" it.r AS rank_fp, tt.r AS trust_fp,"
        f" (greatest(it.r - tt.r, 0) * 1000000 // it.r)::BIGINT"
        f" AS spam_mass_ppm"
        f" FROM hosts h JOIN it{n_iter} it ON it.host = h.host"
        f" JOIN tt{n_iter} tt ON tt.host = h.host"
    )


def host_hits(
    edges: DataFrame, n_iter: int = 3, checkpoint_every: int = 0
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
    # persist the raw edge list FIRST: g and hosts both scan it, and when
    # the caller derives edges from a pandas-UDF link extraction the two
    # unshared scans would each pay the full Python/Arrow pass.  If the
    # caller already persisted edges for its own reuse, leave its cache
    # alone (persisting is then a no-op and unpersisting here would evict
    # the caller's data behind its back).
    lvl = edges.storageLevel
    edges_was_cached = lvl.useMemory or lvl.useDisk
    if not edges_was_cached:
        edges = edges.persist()
    g = edges.groupBy("s", "d").agg(F.count(F.lit(1)).alias("cnt")).persist()
    hosts = (
        edges.select(F.col("s").alias("host"))
        .union(edges.select(F.col("d").alias("host")))
        .distinct()
        .persist()
    )
    halves: list[DataFrame] = []  # per-half-step caches, released on exit

    def _norm(raw: DataFrame, key: str, col: str) -> DataFrame:
        # raw (the groupBy-agg output, keyed by the joined endpoint) is
        # referenced twice (max reduce + the divide); persist so the
        # half-step computes once — unpersisted, each half-step would
        # recompute its whole ancestry per reference (2^half-steps blowup).
        # The max is collected as ONE scalar per half-step (a tiny job over
        # the just-persisted |hosts|-sized cache) and inlined as a literal:
        # the r3 crossJoin(broadcast(agg)) form added a broadcast-exchange
        # subquery job per half-step over the full un-truncated lineage,
        # which made HITS a 22 s Catalyst-planning storm at sf0.01 while
        # PageRank (same graph) ran 2.5 s.  Arithmetic unchanged —
        # div(v·10⁶, max) on int64, hosts without in/out edges coalesced to
        # 0 — so scores stay bit-identical (max over raw == max over the
        # zero-filled join: values are non-negative and greatest(·, 1)
        # covers the empty relation).  The hosts left join rides lazily on
        # the NEXT half-step's job instead of inside this max job.
        raw = raw.persist()
        halves.append(raw)
        m = int(raw.agg(F.greatest(F.max("x"), F.lit(1)).alias("m")).first()["m"])
        return hosts.join(raw, hosts["host"] == raw[key], "left").select(
            "host",
            F.expr(f"div(coalesce(x, 0L) * {INIT_FP}, {m}L)").alias(col),
        )

    if n_iter < 1:
        raise ValueError("host_hits needs n_iter >= 1")
    # no auth init: the first half-step derives authorities purely from
    # the hub seed (matching the SQL twin's CTE chain), and every
    # iteration assigns auth before hub reads it
    hub = hosts.withColumn("h", F.lit(INIT_FP).cast("long"))
    for i in range(n_iter):
        araw = (
            g.join(hub.withColumnRenamed("host", "sh"), F.col("sh") == g["s"])
            .select(F.col("d"), (F.col("cnt") * F.col("h")).alias("x"))
            .groupBy("d")
            .agg(F.sum("x").alias("x"))
        )
        auth = _norm(araw, "d", "a")
        hraw = (
            g.join(auth.withColumnRenamed("host", "ah"), F.col("ah") == g["d"])
            .select(F.col("s"), (F.col("cnt") * F.col("a")).alias("x"))
            .groupBy("s")
            .agg(F.sum("x").alias("x"))
        )
        hub = _norm(hraw, "s", "h")
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            # lazy: the max-collect in _norm already materializes every
            # half-step into the block cache (physical plans stay leaf-
            # shallow), so the checkpoint only needs to truncate LOGICAL
            # lineage for long runs — piggy-backed on the next half-step's
            # own action instead of two extra eager jobs per cycle.
            hub = hub.localCheckpoint(eager=False)
            auth = auth.localCheckpoint(eager=False)
    out = hub.join(auth, "host").select(
        F.col("host").cast("int").alias("host"),
        F.col("h").alias("hub_fp"),
        F.col("a").alias("auth_fp"),
    ).localCheckpoint(eager=True)
    caches = (g, hosts, *halves) if edges_was_cached else (edges, g, hosts, *halves)
    for c in caches:
        c.unpersist()
    return out


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


# ------------------------------------------------------------- anchor text


def anchor_text_topk(
    docs: DataFrame, n_hosts: int = 32, topk: int = 3, n_anchor_toks: int = 2
) -> DataFrame:
    """Anchor-text aggregation: for every target host, the top-k anchor
    phrases pointing at it — the classic web-index signal (anchor text
    describes the TARGET better than the target's own words; Brin & Page
    1998 §2.2).  The reference keeps only raw outlinks
    (`TextAnalysis.java` href walk, SURVEY §2 P4); a search-engine-scale
    corpus wants them rolled up per destination.

    Edge derivation matches doc_host_edges (dst = first md5(text) byte
    mod H) so DuckDB replays it; the anchor phrase is the doc's first
    `n_anchor_toks` tokens (the deterministic stand-in for the <a> inner
    text both engines can derive).

    Scale shape: one explode-free pass (anchor = substring, no token
    blow-up) → groupBy (dst, anchor) count with map-side combine → per-
    host top-k via row_number over |hosts| window partitions.  Shuffled
    rows are (host, phrase, count) — the corpus text never moves; the
    window key is the host, so no single-partition global sort exists at
    any scale."""
    edges = docs.select(
        (
            F.conv(F.substring(F.md5(F.col("text").cast("binary")), 1, 2), 16, 10)
            .cast("long")
            % n_hosts
        ).alias("host"),
        F.concat_ws(
            " ", F.slice(F.split(F.col("text"), " "), 1, n_anchor_toks)
        ).alias("anchor"),
    )
    counts = edges.groupBy("host", "anchor").agg(
        F.count(F.lit(1)).alias("n_links")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("host").orderBy(
        F.col("n_links").desc(), F.col("anchor").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select(
            F.col("host").cast("int").alias("host"),
            F.col("rank").cast("int").alias("rank"),
            "anchor",
            F.col("n_links").cast("long").alias("n_links"),
        )
    )


def anchor_text_sql(
    docs_sql: str, n_hosts: int = 32, topk: int = 3, n_anchor_toks: int = 2
) -> str:
    return f"""
    WITH e AS (
      SELECT ('0x' || substr(md5(text), 1, 2))::BIGINT % {n_hosts} AS host,
             array_to_string(string_split(text, ' ')[1:{n_anchor_toks}], ' ')
               AS anchor
      FROM ({docs_sql})
    ), c AS (
      SELECT host, anchor, count(*)::BIGINT AS n_links
      FROM e GROUP BY host, anchor
    ), r AS (
      SELECT host, anchor, n_links,
             row_number() OVER (PARTITION BY host
                                ORDER BY n_links DESC, anchor ASC) AS rank
      FROM c
    )
    SELECT host::INT AS host, rank::INT AS rank, anchor, n_links
    FROM r WHERE rank <= {topk}
    """


# -------------------------------------------------------------- link spam


def link_spam_signals(edges: DataFrame) -> DataFrame:
    """Per-host link-spam signals over the (s, d) multigraph: weighted
    out/in degree, self-link weight, and reciprocal-link weight (links
    whose reverse edge also exists — link farms trade edges both ways,
    organic webgraphs are strongly asymmetric; Fetterly et al. 2004).
    `recip_ppm` = reciprocal weight as parts-per-million of outdegree in
    int64 fixed point, hash-safe and partitioning-independent.

    Scale shape: the multigraph collapses to (s, d, cnt) once; the
    reciprocal join is grouped-edges ⨝ grouped-edges on the swapped key
    — an equi-join over |distinct edges| rows, never the corpus.  All
    aggregations partial-combine; output is |hosts| rows."""
    g = edges.groupBy("s", "d").agg(F.count(F.lit(1)).alias("cnt")).persist()
    out_deg = g.groupBy("s").agg(F.sum("cnt").alias("out_w"))
    in_deg = g.groupBy("d").agg(F.sum("cnt").alias("in_w"))
    self_w = (
        g.where(F.col("s") == F.col("d"))
        .select(F.col("s").alias("host"), F.col("cnt").alias("self_w"))
    )
    rev = g.select(
        F.col("d").alias("rs"), F.col("s").alias("rd"), F.col("cnt").alias("rcnt")
    )
    recip = (
        g.where(F.col("s") != F.col("d"))
        .join(rev, (g["s"] == rev["rs"]) & (g["d"] == rev["rd"]))
        .select("s", F.least("cnt", "rcnt").alias("rw"))
        .groupBy("s")
        .agg(F.sum("rw").alias("recip_w"))
    )
    hosts = (
        edges.select(F.col("s").alias("host"))
        .union(edges.select(F.col("d").alias("host")))
        .distinct()
    )
    out = (
        hosts.join(out_deg, hosts["host"] == out_deg["s"], "left")
        .drop("s")
        .join(in_deg, hosts["host"] == in_deg["d"], "left")
        .drop("d")
        .join(self_w, "host", "left")
        .join(recip.withColumnRenamed("s", "host"), "host", "left")
        .select(
            F.col("host").cast("int").alias("host"),
            F.coalesce("out_w", F.lit(0)).cast("long").alias("out_w"),
            F.coalesce("in_w", F.lit(0)).cast("long").alias("in_w"),
            F.coalesce("self_w", F.lit(0)).cast("long").alias("self_w"),
            F.coalesce("recip_w", F.lit(0)).cast("long").alias("recip_w"),
            F.expr(
                "div(coalesce(recip_w, 0) * 1000000,"
                " greatest(coalesce(out_w, 0), 1))"
            ).alias("recip_ppm"),
        )
        .localCheckpoint(eager=True)
    )
    g.unpersist()
    return out


def link_spam_sql(docs_sql: str, n_hosts: int = 32) -> str:
    """DuckDB twin of doc_host_edges → link_spam_signals."""
    return f"""
    WITH e AS MATERIALIZED (
      SELECT doc_id % {n_hosts} AS s,
             ('0x' || substr(md5(text), 1, 2))::BIGINT % {n_hosts} AS d
      FROM ({docs_sql})
    ), g AS MATERIALIZED (
      SELECT s, d, count(*)::BIGINT AS cnt FROM e GROUP BY s, d
    ),
    od AS (SELECT s, sum(cnt)::BIGINT AS out_w FROM g GROUP BY s),
    idg AS (SELECT d, sum(cnt)::BIGINT AS in_w FROM g GROUP BY d),
    sw AS (SELECT s AS host, cnt AS self_w FROM g WHERE s = d),
    rc AS (
      SELECT a.s, sum(least(a.cnt, b.cnt))::BIGINT AS recip_w
      FROM g a JOIN g b ON a.s = b.d AND a.d = b.s
      WHERE a.s <> a.d GROUP BY a.s
    ),
    hosts AS (SELECT DISTINCT s AS host FROM e
              UNION SELECT DISTINCT d FROM e)
    SELECT h.host::INT AS host,
           coalesce(od.out_w, 0)::BIGINT AS out_w,
           coalesce(idg.in_w, 0)::BIGINT AS in_w,
           coalesce(sw.self_w, 0)::BIGINT AS self_w,
           coalesce(rc.recip_w, 0)::BIGINT AS recip_w,
           (coalesce(rc.recip_w, 0) * 1000000
            // greatest(coalesce(od.out_w, 0), 1))::BIGINT AS recip_ppm
    FROM hosts h
    LEFT JOIN od ON od.s = h.host
    LEFT JOIN idg ON idg.d = h.host
    LEFT JOIN sw ON sw.host = h.host
    LEFT JOIN rc ON rc.s = h.host
    """
