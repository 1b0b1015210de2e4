"""Distributed BPE tokenizer training (Sennrich et al. 2016,
arXiv:1508.07909) — the learn-the-merges half of the token-counting story.

Classic byte-pair encoding: start from the corpus word histogram with each
word split into characters, then repeatedly (a) count adjacent token
pairs weighted by word frequency, (b) take the most frequent pair
(deterministic tie-break: frequency DESC, left token ASC, right token
ASC), (c) merge its greedy non-overlapping occurrences left-to-right.

Spark-first shape: training operates on the DISTINCT-WORD histogram, not
the corpus — at 100 TB the histogram is ~10^7 rows regardless of corpus
size, so each round is a small explode → window → group pipeline, and the
only driver traffic is ONE (pair, freq) row per merge round (the global
argmax, same pattern as the bloom-filter shard collect).  The corpus→
histogram step is the usual split/explode/count shuffle, done once.

Greedy non-overlapping merge without an iterative per-word loop: adjacent
matches form gaps-and-islands runs (pos − running-match-count), and within
a run exactly the even offsets merge — pure window functions, identical
in Spark and DuckDB, so the oracle can replay training as K mechanically
unrolled CTE blocks (``bpe_train_sql``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window as W


def word_histogram(
    docs: DataFrame,
    text_col: str = "text",
    n_words: int = 200,
    max_len: int = 16,
) -> DataFrame:
    """Top-``n_words`` distinct words by (count DESC, word ASC) with each
    word exploded into space-joined characters — BPE's training state."""
    words = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where((F.col("word") != "") & (F.length("word") <= max_len))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "word")
        .limit(n_words)
    )
    return words.select(
        "word",
        "cnt",
        F.trim(F.regexp_replace("word", "(.)", "$1 ")).alias("toks"),
    )


def _pair_counts(state: DataFrame) -> DataFrame:
    wdw = W.partitionBy("word").orderBy("pos")
    t = state.select(
        "word", "cnt", F.posexplode(F.split("toks", " ")).alias("pos", "tok")
    ).withColumn("nxt", F.lead("tok").over(wdw))
    return (
        t.where(F.col("nxt").isNotNull())
        .groupBy(F.col("tok").alias("x"), F.col("nxt").alias("y"))
        .agg(F.sum("cnt").alias("freq"))
    )


def _merge_pair(state: DataFrame, x: str, y: str) -> DataFrame:
    """Greedy left-to-right non-overlapping merge of (x, y) in every word:
    adjacent matches form runs; within a run the even offsets merge."""
    wdw = W.partitionBy("word").orderBy("pos")
    t = state.select(
        "word", "cnt", F.posexplode(F.split("toks", " ")).alias("pos", "tok")
    ).withColumn("nxt", F.lead("tok").over(wdw))
    t = t.withColumn("is_m", (F.col("tok") == x) & (F.col("nxt") == y))
    t = t.withColumn("rn", F.sum(F.col("is_m").cast("int")).over(wdw))
    t = t.withColumn("grp", F.when(F.col("is_m"), F.col("pos") - F.col("rn")))
    t = t.withColumn("s", F.min("pos").over(W.partitionBy("word", "grp")))
    t = t.withColumn(
        "kept", F.col("is_m") & ((F.col("pos") - F.col("s")) % 2 == 0)
    )
    t = t.withColumn("skip", F.coalesce(F.lag("kept").over(wdw), F.lit(False)))
    out = t.where(F.col("kept") | ~F.col("skip")).withColumn(
        "emitted", F.when(F.col("kept"), F.lit(x + y)).otherwise(F.col("tok"))
    )
    return out.groupBy("word").agg(
        F.any_value("cnt").alias("cnt"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "emitted"))),
                lambda st: st["emitted"],
            ),
            " ",
        ).alias("toks"),
    )


def _train(
    docs: DataFrame, k: int, text_col: str, n_words: int
) -> tuple[list, DataFrame]:
    """Run the K training rounds; returns (merge rows, final word→tokens
    state).  The final state comes back persisted AND materialized so
    callers can drop the intermediate lineage."""
    state = word_histogram(docs, text_col=text_col, n_words=n_words).persist()
    rows = []
    prev = None
    for r in range(1, k + 1):
        # the argmax collect is the round's ONLY action: it materializes
        # this round's persisted state as a side effect, so no extra
        # count() job is needed to pin lineage at one round deep
        win = (
            _pair_counts(state)
            .orderBy(F.col("freq").desc(), "x", "y")
            .limit(1)
            .collect()
        )
        if prev is not None:
            prev.unpersist()
        if not win:
            break
        x, y, freq = win[0]["x"], win[0]["y"], int(win[0]["freq"])
        rows.append((r, x, y, freq))
        prev, state = state, _merge_pair(state, x, y).persist()
    state.count()
    if prev is not None:
        prev.unpersist()
    return rows, state


def bpe_train(
    docs: DataFrame,
    k: int = 4,
    text_col: str = "text",
    n_words: int = 200,
) -> DataFrame:
    """Learn ``k`` BPE merges; returns (round, x, y, freq) — the ordered
    merge table a tokenizer applies at encode time.  One 1-row collect per
    round (the global argmax); everything else stays distributed."""
    spark = docs.sparkSession
    rows, state = _train(docs, k, text_col, n_words)
    state.unpersist()
    return spark.createDataFrame(
        rows, "round int, x string, y string, freq long"
    )


def bpe_encode_counts(
    docs: DataFrame,
    k: int = 4,
    text_col: str = "text",
    n_words: int = 200,
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply the learned merges to the corpus and count BPE tokens per
    document — the encode half, in the scale-correct shape: merges are
    applied ONCE on the distinct-word state (vocab-sized), then joined
    back onto the exploded corpus via a broadcast (the vocab table is
    tiny next to the corpus).  Out-of-vocabulary words fall back to
    character tokens, so their count is their character length."""
    spark = docs.sparkSession
    _rows, state = _train(docs, k, text_col, n_words)
    # the trained vocab is ≤ n_words rows: pin it as a literal table so the
    # cached training state can be released before the corpus-side plan runs
    vocab = spark.createDataFrame(state.collect(), state.schema)
    state.unpersist()
    words = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    ).where(F.col("word") != "")
    joined = words.join(F.broadcast(vocab.select("word", "toks")), "word", "left")
    return joined.groupBy(id_col).agg(
        F.sum(
            F.coalesce(F.size(F.split("toks", " ")), F.length("word"))
        )
        .cast("long")
        .alias("bpe_tokens")
    )


def _sql_blocks(
    docs_sql: str,
    k: int,
    text_col: str,
    n_words: int,
    max_len: int,
) -> list[str]:
    """The K unrolled training-round CTE blocks shared by the train and
    encode oracles (all MATERIALIZED: DuckDB inlines plain CTEs, and the
    per-row scalar subqueries would re-evaluate the whole chain)."""
    blocks = [
        f"""
    state1 AS MATERIALIZED (
      SELECT word, cnt,
             trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS toks
      FROM (
        SELECT word, count(*) AS cnt
        FROM (SELECT unnest(string_split({text_col}, ' ')) AS word
              FROM ({docs_sql}))
        WHERE word != '' AND length(word) <= {max_len}
        GROUP BY word
        ORDER BY cnt DESC, word
        LIMIT {n_words}
      )
    )"""
    ]
    for r in range(1, k + 1):
        blocks.append(
            f"""
    t{r} AS MATERIALIZED (
      SELECT word, cnt, i - 1 AS pos, string_split(toks, ' ')[i] AS tok
      FROM state{r},
           LATERAL (SELECT unnest(generate_series(
               1, len(string_split(toks, ' ')))) AS i)
    ),
    t{r}b AS MATERIALIZED (
      SELECT *, lead(tok) OVER (PARTITION BY word ORDER BY pos) AS nxt
      FROM t{r}
    ),
    w{r} AS MATERIALIZED (
      SELECT tok AS x, nxt AS y, sum(cnt)::BIGINT AS freq
      FROM t{r}b WHERE nxt IS NOT NULL
      GROUP BY tok, nxt
      ORDER BY freq DESC, x, y LIMIT 1
    ),
    m{r} AS MATERIALIZED (
      SELECT word, cnt, pos, tok,
             (tok = (SELECT x FROM w{r})
              AND nxt = (SELECT y FROM w{r})) AS is_m,
             sum(CASE WHEN tok = (SELECT x FROM w{r})
                       AND nxt = (SELECT y FROM w{r})
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY word ORDER BY pos) AS rn
      FROM t{r}b
    ),
    m{r}b AS MATERIALIZED (
      SELECT *, CASE WHEN is_m THEN pos - rn END AS grp FROM m{r}
    ),
    m{r}c AS MATERIALIZED (
      SELECT *, min(pos) OVER (PARTITION BY word, grp) AS s FROM m{r}b
    ),
    m{r}d AS MATERIALIZED (
      SELECT *, (is_m AND (pos - s) % 2 = 0) AS kept FROM m{r}c
    ),
    m{r}e AS MATERIALIZED (
      SELECT *, coalesce(lag(kept) OVER (PARTITION BY word ORDER BY pos),
                         false) AS skip
      FROM m{r}d
    ),
    state{r + 1} AS MATERIALIZED (
      SELECT word, any_value(cnt) AS cnt,
             string_agg(CASE WHEN kept
                             THEN (SELECT x FROM w{r}) || (SELECT y FROM w{r})
                             ELSE tok END, ' ' ORDER BY pos) AS toks
      FROM m{r}e WHERE kept OR NOT skip
      GROUP BY word
    )"""
        )
    return blocks


def bpe_train_sql(
    docs_sql: str,
    k: int = 4,
    text_col: str = "text",
    n_words: int = 200,
    max_len: int = 16,
) -> str:
    """DuckDB replay of the K training rounds as mechanically unrolled CTE
    blocks — same histogram, same tie-breaks, same gaps-and-islands merge."""
    blocks = _sql_blocks(docs_sql, k, text_col, n_words, max_len)
    unions = "\n    UNION ALL\n".join(
        f"    SELECT {r} AS round, x, y, freq FROM w{r}" for r in range(1, k + 1)
    )
    return "WITH" + ",".join(blocks) + "\n" + unions


def bpe_encode_sql(
    docs_sql: str,
    k: int = 4,
    text_col: str = "text",
    n_words: int = 200,
    max_len: int = 16,
    id_col: str = "doc_id",
) -> str:
    """Encode oracle: replay training, then join the final state back onto
    the exploded corpus; OOV words count their characters."""
    blocks = _sql_blocks(docs_sql, k, text_col, n_words, max_len)
    tail = f"""
    corpus AS (
      SELECT {id_col}, unnest(string_split({text_col}, ' ')) AS word
      FROM ({docs_sql})
    )
    SELECT c.{id_col},
           sum(coalesce(len(string_split(s.toks, ' ')),
                        length(c.word)))::BIGINT AS bpe_tokens
    FROM (SELECT * FROM corpus WHERE word != '') c
    LEFT JOIN state{k + 1} s ON c.word = s.word
    GROUP BY c.{id_col}
    """
    return "WITH" + ",".join(blocks) + "," + tail
