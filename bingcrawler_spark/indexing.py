"""Inverted-index construction and BM25 scored retrieval — the search
side of a search-engine crawler.  The reference crawls and *analyzes*
Bing result pages (`BingDataAnalysis.java` report queries); the step it
leaves to Bing itself — turning the fetched corpus into a queryable
index — is the natural completion of the pipeline, and the shape of
that computation is what this module provides, Spark-first:

* **Postings build** (`postings_stats`): tokenize → explode → one
  hash aggregation keyed by term.  Map-side partial aggregation means
  stopword skew costs only combiner CPU, never a hot reduce partition;
  the shuffle carries (term, doc_id) pairs, not text.  At 100 TB this
  is the canonical index-build plan: the corpus is read once, the only
  wide exchange is the narrow term-key one.

* **BM25 scoring** (`bm25_scores`): for a fixed query-term set the
  whole computation is SHUFFLE-FREE on the corpus side — per-document
  tf/dl come from array expressions inside whole-stage codegen (no
  explode), corpus statistics (N, Σdl, per-term df) reduce to ONE
  1-row aggregate that is broadcast back, and the final top-k is a
  TakeOrderedAndProject.  A 1000-executor run shuffles a single row.

Cross-engine determinism: scores are emitted as e4 fixed-point ints
(`round(score·10⁴)`), and the top-k ORDER BY uses the *rounded* score
(then doc_id), so a last-ulp `ln` difference between libms cannot
reorder or re-round the output except at astronomically unlucky
boundaries.  `postings_sql` / `bm25_sql` emit DuckDB oracles that
re-derive everything from the same tokenizer (lower → non-alnum runs
to single spaces → split on space → drop empties).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def sql_lit(s: str) -> str:
    """Single-quoted DuckDB string literal with embedded quotes doubled.
    Every oracle builder that inlines a caller-supplied term/probe/stage
    string routes it through here — a raw f-string would emit invalid
    SQL for any value containing a quote (e.g. "o'brien")."""
    return "'" + s.replace("'", "''") + "'"


K1 = 1.2
B = 0.75

_TOKENIZE = "list_filter(string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' '), x -> x <> '')"


def _toks_col() -> F.Column:
    """lower → collapse non-alnum runs to single spaces → split → drop ''.
    Mirrors the DuckDB `_TOKENIZE` expression token-for-token."""
    return F.filter(
        F.split(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " "), " "),
        lambda x: x != F.lit(""),
    )


# ---------------------------------------------------------------------
# Postings / dictionary statistics
# ---------------------------------------------------------------------
def postings_stats(docs: DataFrame, min_len: int = 4, min_df: int = 5) -> DataFrame:
    """documents(doc_id, text) → (term, df, cf) for terms of length
    ≥ min_len appearing in ≥ min_df distinct docs.  df = document
    frequency, cf = collection frequency.  One explode + one term-keyed
    aggregation; countDistinct runs as a two-level partial-distinct, so
    the exchange is (term, doc_id) pairs with map-side dedup."""
    toks = docs.select("doc_id", F.explode(_toks_col()).alias("term"))
    return (
        toks.where(F.length("term") >= min_len)
        .groupBy("term")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("df"),
            F.count(F.lit(1)).cast("long").alias("cf"),
        )
        .where(F.col("df") >= min_df)
    )


def postings_sql(from_docs: str, min_len: int = 4, min_df: int = 5) -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKENIZE}) AS term
      FROM ({from_docs})
    )
    SELECT term,
           count(DISTINCT doc_id)::BIGINT AS df,
           count(*)::BIGINT AS cf
    FROM toks
    WHERE length(term) >= {min_len}
    GROUP BY term
    HAVING count(DISTINCT doc_id) >= {min_df}
    """


# ---------------------------------------------------------------------
# BM25 retrieval
# ---------------------------------------------------------------------
def bm25_scores(
    docs: DataFrame, terms: list[str], k1: float = K1, b: float = B, limit: int = 20
) -> DataFrame:
    """documents(doc_id, text) × fixed query terms → top-`limit`
    (doc_id, score_e4) by BM25 (Robertson/Sparck-Jones idf with the +1
    floor, as in Lucene).  Plan shape: one corpus map computing
    (dl, tf_i…) via array exprs, ONE 1-row global aggregate for
    (N, Σdl, df_i…), broadcast back with a crossJoin, then
    TakeOrderedAndProject on the rounded score — no corpus shuffle."""
    def _tf(term: str) -> F.Column:
        # NB: F.filter treats a 2-arg lambda as (element, index) — a
        # `lambda x, t=t:` default would silently bind t to the index.
        return F.size(F.filter("toks", lambda x: x == F.lit(term))).cast("long")

    d = docs.select(F.col("doc_id"), _toks_col().alias("toks")).select(
        "doc_id",
        F.size("toks").cast("long").alias("dl"),
        *[_tf(t).alias(f"tf{i}") for i, t in enumerate(terms)],
    )
    stats = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).cast("long").alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    scored = d.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    score = None
    for i in range(len(terms)):
        idf = F.log(
            (F.col("n_docs").cast("double") - F.col(f"df{i}").cast("double") + F.lit(0.5))
            / (F.col(f"df{i}").cast("double") + F.lit(0.5))
            + F.lit(1.0)
        )
        tf = F.col(f"tf{i}").cast("double")
        part = idf * (tf * F.lit(k1 + 1.0)) / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / avgdl))
        score = part if score is None else score + part
    hit = sum(F.col(f"tf{i}") for i in range(len(terms)))
    return (
        scored.where(hit > 0)
        .select("doc_id", F.round(score * 10_000).cast("long").alias("score_e4"))
        .orderBy(F.col("score_e4").desc(), F.col("doc_id").asc())
        .limit(limit)
    )


def bm25_sql(
    from_docs: str, terms: list[str], k1: float = K1, b: float = B, limit: int = 20
) -> str:
    tf_cols = ",\n             ".join(
        f"len(list_filter(toks, x -> x = {sql_lit(t)}))::BIGINT AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n             ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)::BIGINT AS df{i}"
        for i in range(len(terms))
    )
    parts = " + ".join(
        f"(ln((n_docs::DOUBLE - df{i}::DOUBLE + 0.5) / (df{i}::DOUBLE + 0.5) + 1.0)"
        f" * (tf{i}::DOUBLE * {k1 + 1.0!r}) / (tf{i}::DOUBLE + {k1!r} *"
        f" ({1.0 - b!r} + {b!r} * dl::DOUBLE / (sum_dl::DOUBLE / n_docs::DOUBLE))))"
        for i in range(len(terms))
    )
    hit = " + ".join(f"tf{i}" for i in range(len(terms)))
    return f"""
    WITH d AS (
      SELECT doc_id, {_TOKENIZE} AS toks
      FROM ({from_docs})
    ),
    t AS (
      SELECT doc_id, len(toks)::BIGINT AS dl,
             {tf_cols}
      FROM d
    ),
    s AS (
      SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl,
             {df_cols}
      FROM t
    )
    SELECT doc_id, round(({parts}) * 10000)::BIGINT AS score_e4
    FROM t, s
    WHERE {hit} > 0
    ORDER BY score_e4 DESC, doc_id ASC
    LIMIT {limit}
    """


# ---------------------------------------------------------------------
# Positional index / phrase queries
# ---------------------------------------------------------------------
def positional_postings(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text) → (term, doc_id, pos) positional postings
    (pos is 0-based token offset).  The explode's shuffle-free until a
    consumer keys it; writing this bucketed by term is the on-disk
    positional index a phrase engine serves from."""
    return docs.select(
        "doc_id", F.posexplode(_toks_col()).alias("pos", "term")
    )


def phrase_match(docs: DataFrame, phrase: list[str]) -> DataFrame:
    """Exact phrase query over the positional index: docs containing the
    consecutive token run `phrase`, with occurrence count and first
    offset.  Plan shape is the classic positional-index intersection:
    posting lists are PRUNED TO THE PHRASE TERMS before any join
    (the analogue of reading only those terms' lists from the index),
    then chained equi-joins on (doc_id, start_pos) — term i must sit at
    start+i.  Every join key includes doc_id, so data stays co-
    partitioned after the first shuffle; no corpus text moves.

    The DuckDB oracle is an independent formulation (per-row array scan)
    so the hash cross-checks semantics, not a shared plan."""
    assert len(phrase) >= 2
    post = (
        positional_postings(docs)
        .where(F.col("term").isin(*sorted(set(phrase))))
        .persist()
    )
    cur = post.where(F.col("term") == phrase[0]).select("doc_id", "pos")
    for i, t in enumerate(phrase[1:], start=1):
        nxt = post.where(F.col("term") == t).select(
            F.col("doc_id").alias("d2"), (F.col("pos") - i).alias("p2")
        )
        cur = cur.join(
            nxt, (cur["doc_id"] == nxt["d2"]) & (cur["pos"] == nxt["p2"])
        ).select("doc_id", "pos")
    out = cur.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        F.min("pos").cast("long").alias("first_pos"),
    ).localCheckpoint(eager=True)  # materialize, then release the cache
    post.unpersist()
    return out


def phrase_match_sql(from_docs: str, phrase: list[str]) -> str:
    """Array-scan DuckDB twin: for each doc, positions i (1-based in SQL,
    reported 0-based to match posexplode) where toks[i..i+m-1] == phrase."""
    m = len(phrase)
    conds = " AND ".join(
        f"toks[i + {j}] = {sql_lit(t)}" for j, t in enumerate(phrase)
    )
    return f"""
    WITH d AS (
      SELECT doc_id, {_TOKENIZE} AS toks
      FROM ({from_docs})
    ),
    hits AS (
      SELECT doc_id,
             list_filter(generate_series(1, len(toks) - {m - 1}),
                         i -> {conds}) AS starts
      FROM d
      WHERE len(toks) >= {m}
    )
    SELECT doc_id, len(starts)::BIGINT AS n_matches,
           (starts[1] - 1)::BIGINT AS first_pos
    FROM hits
    WHERE len(starts) > 0
    """


# ---------------------------------------------------------------- snippets


def snippet_extract(
    docs: DataFrame,
    terms: list[str],
    window: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Search-result snippet generation: for each (doc, query term)
    hit, the first occurrence position and a ±``window``-token context
    snippet — the SERP rendering step downstream of ix_bm25_search
    (the reference renders raw stored text, CommonAnalysis report
    writers; an index serves windows).

    Scale shape: the term list is a tiny literal array exploded per
    row (|terms| fan-out, no join), position and slice are JVM array
    ops on the already-tokenized column — shuffle-free."""
    toks = F.split(F.col(text_col), " ")
    ex = docs.select(
        F.col(id_col),
        toks.alias("toks"),
        F.explode(F.array(*[F.lit(t) for t in terms])).alias("term"),
    ).withColumn("pos", F.expr("array_position(toks, term)"))
    w = window
    return (
        ex.where(F.col("pos") > 0)
        .select(
            id_col,
            "term",
            F.col("pos").cast("int").alias("pos"),
            F.expr(
                f"array_join(slice(toks, greatest(pos - {w}, 1),"
                f" pos + {w} - greatest(pos - {w}, 1) + 1), ' ')"
            ).alias("snippet"),
        )
    )


def snippet_extract_sql(
    docs_sql: str,
    terms: list[str],
    window: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    vals = ", ".join(f"({sql_lit(t)})" for t in terms)
    w = window
    return f"""
    WITH base AS (
      SELECT {id_col}, string_split({text_col}, ' ') AS toks
      FROM ({docs_sql})),
    ex AS (
      SELECT {id_col}, toks, t.term,
             list_position(toks, t.term) AS pos
      FROM base, (VALUES {vals}) t(term))
    SELECT {id_col}, term, pos::INT AS pos,
           array_to_string(toks[greatest(pos - {w}, 1) : pos + {w}], ' ')
             AS snippet
    FROM ex WHERE coalesce(pos, 0) > 0
    """


# ------------------------------------------------------- spell candidates


def spell_candidates(
    docs: DataFrame,
    min_len: int = 5,
    min_freq: int = 3,
    topk: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """SymSpell-style distributed spell correction: vocabulary words and
    query terms both expand to their deletion-1 variants, candidates come
    from an equi-join on the shared variant (never a vocab x query cross
    product), and survivors are verified with exact Levenshtein <= 1 and
    ranked by corpus frequency.  Queries are derived typos (drop the 3rd
    char of every length>=6 vocab word), so both engines rebuild the
    identical workload from the corpus alone.

    Scale shape: |vocab| x (len+1) variant rows on each side of one
    equi-join; the corpus itself contributes only the token-count
    group-by.  This is the search-index 'did you mean' stage."""
    toks = F.split(F.col(text_col), " ")
    vocab = (
        docs.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .where((F.length("w") >= min_len) & (F.col("freq") >= min_freq))
        .persist()
    )
    deletes = F.expr(
        "concat(array(w), transform(sequence(1, length(w)),"
        " i -> concat(substr(w, 1, i - 1), substr(w, i + 1, length(w)))))"
    )
    vvar = vocab.select(
        F.col("w").alias("cand"), "freq", F.explode(deletes).alias("variant")
    )
    queries = (
        vocab.where(F.length("w") >= 6)
        .select(
            F.concat(F.expr("substr(w, 1, 2)"), F.expr("substr(w, 4, length(w))"))
            .alias("query")
        )
        .distinct()
    )
    qvar = queries.select(
        "query",
        F.explode(
            F.expr(
                "concat(array(query), transform(sequence(1, length(query)),"
                " i -> concat(substr(query, 1, i - 1),"
                " substr(query, i + 1, length(query)))))"
            )
        ).alias("variant"),
    )
    cand = (
        qvar.join(vvar, "variant")
        .select("query", "cand", "freq")
        .distinct()
        .withColumn("dist", F.levenshtein("query", "cand"))
        .where(F.col("dist") <= 1)
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("query").orderBy(F.col("freq").desc(), F.col("cand").asc())
    out = (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select(
            "query",
            F.col("rank").cast("int").alias("rank"),
            "cand",
            F.col("dist").cast("int").alias("dist"),
            F.col("freq").cast("long").alias("freq"),
        )
        .localCheckpoint(eager=True)  # materialize, then release the cache
    )
    vocab.unpersist()
    return out


def spell_candidates_sql(
    docs_sql: str,
    min_len: int = 5,
    min_freq: int = 3,
    topk: int = 3,
    text_col: str = "text",
) -> str:
    dele = (
        "list_concat([{w}], list_transform(range(1, len({w}) + 1),"
        " i -> substr({w}, 1, i - 1) || substr({w}, i + 1, len({w}))))"
    )
    return f"""
    WITH vocab AS MATERIALIZED (
      SELECT w, count(*)::BIGINT AS freq
      FROM (SELECT unnest(string_split({text_col}, ' ')) AS w
            FROM ({docs_sql}))
      GROUP BY w
      HAVING length(w) >= {min_len} AND count(*) >= {min_freq}),
    vvar AS (
      SELECT w AS cand, freq, unnest({dele.format(w="w")}) AS variant
      FROM vocab),
    queries AS (
      SELECT DISTINCT substr(w, 1, 2) || substr(w, 4, len(w)) AS query
      FROM vocab WHERE length(w) >= 6),
    qvar AS (
      SELECT query, unnest({dele.format(w="query")}) AS variant
      FROM queries),
    cand AS (
      SELECT DISTINCT query, cand, freq,
             levenshtein(query, cand) AS dist
      FROM qvar JOIN vvar USING (variant)
      WHERE levenshtein(query, cand) <= 1),
    r AS (
      SELECT query, cand, dist, freq,
             row_number() OVER (PARTITION BY query
                                ORDER BY freq DESC, cand ASC) AS rank
      FROM cand)
    SELECT query, rank::INT AS rank, cand, dist::INT AS dist, freq
    FROM r WHERE rank <= {topk}
    """


# ---------------------------------------------------------------------
# Per-document TF-IDF keyword extraction
# ---------------------------------------------------------------------
def tfidf_keywords(docs: DataFrame, top_k: int = 3, min_len: int = 4) -> DataFrame:
    """documents(doc_id, text) → top-`top_k` terms per doc by
    tf·ln(N/df) — the classic per-document keyword extractor (the
    corpus-side complement of BM25's query-side scoring; the reference's
    keyword analytics only counts author-supplied keyword fields,
    SURVEY §2 R10).

    Plan shape: explode → (doc_id, term) count (one shuffle with
    map-side combine), term→df aggregate over the already-unique
    (doc, term) pairs (second small shuffle), a 1-row N aggregate
    broadcast back, then a per-doc window for top-k — partitioned by
    doc_id, so rank work distributes with the corpus.  Scores are e4
    fixed-point (same convention as BM25) with term-asc tie-break, so
    output is cross-engine hash-stable."""
    toks = docs.select("doc_id", F.explode(_toks_col()).alias("term")).where(
        F.length("term") >= min_len
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    score = F.col("tf").cast("double") * F.log(
        F.col("n_docs").cast("double") / F.col("df").cast("double")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_e4").desc(), F.col("term").asc()
    )
    return (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(score * 10_000).cast("long").alias("score_e4"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
    )


def tfidf_keywords_sql(from_docs: str, top_k: int = 3, min_len: int = 4) -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKENIZE}) AS term
      FROM ({from_docs})
    ), tf AS (
      SELECT doc_id, term, count(*)::BIGINT AS tf
      FROM toks WHERE length(term) >= {min_len}
      GROUP BY doc_id, term
    ), dft AS (
      SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
    ), n AS (
      SELECT count(*)::BIGINT AS n_docs FROM ({from_docs})
    ), scored AS (
      SELECT doc_id, tf.term, tf, df,
             round(tf::DOUBLE * ln(n_docs::DOUBLE / df::DOUBLE)
                   * 10000)::BIGINT AS score_e4
      FROM tf JOIN dft USING (term) CROSS JOIN n
    ), ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY doc_id ORDER BY score_e4 DESC, term ASC
             ) AS rank
      FROM scored
    )
    SELECT doc_id, term, tf, df, score_e4, rank::INT AS rank
    FROM ranked WHERE rank <= {top_k}
    """
