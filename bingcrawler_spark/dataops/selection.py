"""Data-selection operators for webtext training pipelines: DSIR-style
hashed n-gram importance resampling and CCNet-style count-LM fluency
scoring.  Both are public-method rebuilds (Xie et al. 2023 "Data
Selection for Language Models via Importance Resampling"; Wenzek et al.
2020 "CCNet") expressed Spark-first, each with an exact DuckDB oracle.

They generalize the reference's keyword-gated corpus selection
(CommonAnalysis.java search gating, SURVEY §2 R16) into the
model-based selection a 100 TB pipeline actually runs.

Determinism contract (driver value-hash is float-safe only for ints):
all probabilities/ratios live in int64 fixed point with floor
division, so any partitioning, any aggregation order, and both engines
produce bit-identical scores.  The float log-space formulation the
papers use is order-sensitive in the last ulp; the fixed-point
likelihood-ratio surrogate below is monotone in the same per-feature
evidence and exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from bingcrawler_spark import xhash as X

N_BUCKETS = 64  # DSIR hashed-feature buckets (paper uses 10k; 64 keeps
#                 the synthetic vocab from spreading one word per bucket)
LM_SCALE = 1_000_000  # bigram probability fixed point (1e-6 units)

# CCNet ships *pretrained* per-language perplexity cutoffs with its LM;
# these are the analogous fixed constants for the synthetic corpus LM
# (chosen so head/middle/tail all populate at every sf).
LM_HEAD_E6 = 34_000  # fluency >= this → "head"
LM_TAIL_E6 = 32_500  # fluency <  this → "tail"


def _features_col(text) -> F.Column:
    """DSIR's bag of hashed n-grams: unigrams + bigrams, duplicates kept."""
    return F.concat(X.tokens_col(text), X.ngrams_col(text, 2))


def _features_sql(expr: str) -> str:
    return f"list_concat({X.tokens_sql(expr)}, {X.ngrams_sql(expr, 2)})"


# ------------------------------------------------------------------- DSIR


def dsir_select(
    docs: DataFrame,
    k: int = 100,
    n_buckets: int = N_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_col: str = "lang",
    target_val: str = "en",
) -> DataFrame:
    """Importance-resample the top-k docs whose hashed n-gram profile
    looks most like the target domain (rows where target_col ==
    target_val — the stand-in for DSIR's Wikipedia/books target set).

    Per bucket b: weight_b = p̂_target(b) / p̂_raw(b) in 1e4 fixed point
    with add-1 smoothing, computed as one integer expression
    ((ct+1)·(R+B)·10⁴) div ((cr+1)·(T+B)); a doc's score is the sum of
    its features' bucket weights (the integer-exact surrogate for the
    paper's Σ log-ratio — same evidence, no float order sensitivity).

    Scale shape: ONE explode→groupBy(bucket) pass learns the model
    (map-side combine shrinks the shuffle to n_buckets rows per task);
    scoring broadcast-joins the n_buckets-row weight table to the
    exploded features and aggregates per doc (partial agg → shuffled
    rows == #docs, text never shuffles); top-k is
    TakeOrderedAndProject.  int64 is exact while (ct+1)·(R+B)·10⁴ <
    2⁶³ (~10¹⁴ feature occurrences); beyond that, compute the 64
    weights driver-side in Python bignums and broadcast a literal map —
    the distributed shape is unchanged.
    """
    fb = docs.select(
        F.col(id_col),
        (F.col(target_col) == target_val).alias("is_t"),
        F.explode(_features_col(F.col(text_col))).alias("f"),
    ).select(
        id_col,
        "is_t",
        (X.h32_col(F.col("f")) % n_buckets).alias("b"),
    )
    fb = fb.persist()
    stats = fb.groupBy("b").agg(
        F.count(F.lit(1)).alias("cr"),
        F.sum(F.col("is_t").cast("long")).alias("ct"),
    )
    tot = stats.agg(F.sum("cr").alias("r"), F.sum("ct").alias("t"))
    w = stats.crossJoin(F.broadcast(tot)).select(
        "b",
        F.expr(
            f"div((ct + 1) * (r + {n_buckets}) * 10000,"
            f" (cr + 1) * (t + {n_buckets}))"
        ).alias("w"),
    )
    scored = (
        fb.join(F.broadcast(w), "b")
        .groupBy(id_col)
        .agg(F.sum("w").alias("dsir_score"))
    )
    out = (
        scored.orderBy(F.col("dsir_score").desc(), id_col)
        .limit(k)
        .localCheckpoint(eager=True)  # materialize, then release the cache
    )
    fb.unpersist()
    return out


def dsir_select_sql(
    docs_sql: str,
    k: int = 100,
    n_buckets: int = N_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_col: str = "lang",
    target_val: str = "en",
) -> str:
    return f"""
    WITH fb AS (
      SELECT {id_col}, is_t,
             ('0x' || substr(md5(f), 1, 8))::BIGINT % {n_buckets} AS b
      FROM (SELECT {id_col}, ({target_col} = '{target_val}') AS is_t,
                   unnest({_features_sql(text_col)}) AS f
            FROM ({docs_sql}))
    ),
    stats AS (
      SELECT b, count(*)::BIGINT AS cr,
             sum(CASE WHEN is_t THEN 1 ELSE 0 END)::BIGINT AS ct
      FROM fb GROUP BY b
    ),
    tot AS (SELECT sum(cr)::BIGINT AS r, sum(ct)::BIGINT AS t FROM stats),
    w AS (
      SELECT b, ((ct + 1) * (r + {n_buckets}) * 10000
                 // ((cr + 1) * (t + {n_buckets})))::BIGINT AS w
      FROM stats, tot
    )
    SELECT fb.{id_col}, sum(w.w)::BIGINT AS dsir_score
    FROM fb JOIN w USING (b)
    GROUP BY fb.{id_col}
    ORDER BY dsir_score DESC, {id_col}
    LIMIT {k}
    """


# -------------------------------------------------------- LM fluency (CCNet)


def lm_fluency(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_col: str = "lang",
    target_val: str = "en",
    head_e6: int = LM_HEAD_E6,
    tail_e6: int = LM_TAIL_E6,
) -> DataFrame:
    """CCNet-shaped fluency filter: train an add-1 bigram count LM on
    the target slice (CCNet trains KenLM on Wikipedia), score every doc
    by its mean bigram probability in 1e-6 fixed point, and bucket into
    head/middle/tail by fixed cutoffs (CCNet ships pretrained
    per-language cutoffs with the model; higher fluency = more
    target-like, so head is the keep set).

    Per doc-bigram g = (w1, w2): p_e6 = ((C2(g)+1)·10⁶) div (C1(w1)+V)
    with counts from the target slice and V = |target vocab|;
    fluency_e6 = Σ p_e6 div n_bigrams.  Docs with <2 tokens have no
    bigrams and drop out (both engines explode identically).

    Scale shape: the LM (two count tables + one scalar) is learned in
    two explode→groupBy passes over the target slice only, then
    BROADCAST to the corpus scan — exactly KenLM-on-every-worker's
    asymmetry; per-doc aggregation partial-combines so the only
    corpus-keyed shuffle carries (doc_id, two longs).  Bucketing is a
    per-row CASE — no global sort, unlike an NTILE tertile, which
    would single-partition the corpus.
    """
    toks = X.tokens_col(F.col(text_col))
    tgt = docs.where(F.col(target_col) == target_val)
    uni = (
        tgt.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    big = (
        tgt.select(F.explode(X.ngrams_col(F.col(text_col), 2)).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    dbg = docs.select(
        F.col(id_col), F.explode(X.ngrams_col(F.col(text_col), 2)).alias("g")
    ).withColumn("w1", F.split(F.col("g"), " ").getItem(0))
    p = (
        dbg.join(F.broadcast(big), "g", "left")
        .join(F.broadcast(uni), dbg["w1"] == uni["w"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            F.expr(
                f"div((coalesce(c2, 0) + 1) * {LM_SCALE},"
                f" coalesce(c1, 0) + v)"
            ).alias("pe"),
        )
    )
    scored = p.groupBy(id_col).agg(
        F.expr("div(sum(pe), count(*))").alias("fluency_e6")
    )
    return scored.select(
        id_col,
        "fluency_e6",
        F.when(F.col("fluency_e6") >= head_e6, F.lit("head"))
        .when(F.col("fluency_e6") < tail_e6, F.lit("tail"))
        .otherwise(F.lit("middle"))
        .alias("ppl_bucket"),
    )


def lm_fluency_sql(
    docs_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_col: str = "lang",
    target_val: str = "en",
    head_e6: int = LM_HEAD_E6,
    tail_e6: int = LM_TAIL_E6,
) -> str:
    toks = X.tokens_sql(text_col)
    bigs = X.ngrams_sql(text_col, 2)
    return f"""
    WITH tgt AS (SELECT {text_col} FROM ({docs_sql})
                 WHERE {target_col} = '{target_val}'),
    uni AS (SELECT w, count(*)::BIGINT AS c1
            FROM (SELECT unnest({toks}) AS w FROM tgt) GROUP BY w),
    vocab AS (SELECT count(*)::BIGINT AS v FROM uni),
    big AS (SELECT g, count(*)::BIGINT AS c2
            FROM (SELECT unnest({bigs}) AS g FROM tgt) GROUP BY g),
    dbg AS (SELECT {id_col}, unnest({bigs}) AS g FROM ({docs_sql})),
    p AS (
      SELECT {id_col},
             ((coalesce(c2, 0) + 1) * {LM_SCALE}
              // (coalesce(c1, 0) + vocab.v))::BIGINT AS pe
      FROM dbg LEFT JOIN big USING (g)
      LEFT JOIN uni ON uni.w = string_split(dbg.g, ' ')[1], vocab
    ),
    scored AS (SELECT {id_col}, (sum(pe) // count(*))::BIGINT AS fluency_e6
               FROM p GROUP BY {id_col})
    SELECT {id_col}, fluency_e6,
           CASE WHEN fluency_e6 >= {head_e6} THEN 'head'
                WHEN fluency_e6 < {tail_e6} THEN 'tail'
                ELSE 'middle' END AS ppl_bucket
    FROM scored
    """
