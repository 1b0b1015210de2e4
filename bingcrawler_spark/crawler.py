"""The crawl wave loop (SURVEY.md §3.1 Spark rebuild) with checkpoint/resume.

Each wave (one Iceberg-style snapshot pair + a metrics row):

  wave_k:  top      = politeness-budgeted top-k of frontier        # F1+F10
           fetched  = pages ⋈ broadcast(top) on url                # S1..S4
           parsed   = text/links/simhash pandas UDFs               # P4,P5,P12
           seen'    = settle(parsed)                               # F4
           cand     = explode(links) → canon → depth+1 → robots    # P1,F3
           frontier'= (frontier \\ top) ⊎ referrer-appends ⊎ new   # F2,F5
           metrics += wave row                                     # lineage

"Fetching" a url is a join against the pages table per the input hint —
the wave side is broadcast (a wave is thousands of rows; the pages table is
the 100 TB side and is never shuffled: broadcast-hash-join streams it).

State lives in a SnapshotStore (frontier/seen/wave_metrics tables); a killed
run resumes at the last committed wave (test: kill-and-resume in
tests/test_crawler.py).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bingcrawler_spark import frontier as FR
from bingcrawler_spark.bloom import ShardedBloom
from bingcrawler_spark.functions.extract import extract_links_udf, extract_text_udf
from bingcrawler_spark.functions.simhash import simhash64_udf
from bingcrawler_spark.statestore import SnapshotStore

POP_LOG_SCHEMA = T.StructType(
    [
        T.StructField("wave", T.IntegerType()),
        T.StructField("pop_rank", T.IntegerType()),
        T.StructField("url", T.StringType()),
    ]
)

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("wave", T.IntegerType()),
        T.StructField("n_popped", T.LongType()),
        T.StructField("n_fetched", T.LongType()),
        T.StructField("n_failed", T.LongType()),
        T.StructField("n_candidates", T.LongType()),
        T.StructField("n_new", T.LongType()),
        T.StructField("frontier_size", T.LongType()),
        T.StructField("seen_size", T.LongType()),
        T.StructField("wall_s", T.DoubleType()),
    ]
)


@dataclass
class CrawlConfig:
    wave_size: int = 1000
    max_depth: int | None = FR.DEFAULT_MAX_DEPTH
    default_budget: int | None = None  # per-host per-wave politeness cap
    min_weight: int | None = None  # priorityBottomLine (F10)
    use_bloom: bool = False
    bloom_fpp: float = 0.01
    bloom_shards: int = 4
    child_weight_expr: str | None = None  # SQL expr over `curl`, default 100
    compute_simhash: bool = True
    n_partitions: int = 32  # state-table partitioning (host-hash at scale)


class CrawlEngine:
    """Drives waves over (pages, robots) with snapshotted state."""

    def __init__(
        self,
        spark: SparkSession,
        store: SnapshotStore,
        pages: DataFrame,
        robots: DataFrame | None = None,
        config: CrawlConfig | None = None,
    ):
        self.spark = spark
        self.store = store
        self.pages = pages
        self.robots = robots
        self.cfg = config or CrawlConfig()

    # -- state ---------------------------------------------------------------
    def bootstrap(self, seeds: list[tuple[str, int]]) -> None:
        f = FR.seeds_to_frontier(self.spark, seeds)
        self.store.commit("frontier", f, wave=0)
        self.store.commit("seen", FR.empty_seen(self.spark), wave=0)
        self.store.commit(
            "wave_metrics", self.spark.createDataFrame([], METRICS_SCHEMA), wave=0
        )
        self.store.commit(
            "pop_log", self.spark.createDataFrame([], POP_LOG_SCHEMA), wave=0
        )

    @property
    def wave(self) -> int:
        return self.store.current_wave("frontier")

    def frontier(self) -> DataFrame:
        return self.store.read("frontier")

    def seen(self) -> DataFrame:
        return self.store.read("seen")

    def metrics(self) -> DataFrame:
        return self.store.read("wave_metrics")

    # -- one wave --------------------------------------------------------------
    def _child_weight(self) -> Column:
        if self.cfg.child_weight_expr:
            return F.expr(self.cfg.child_weight_expr)
        return F.lit(FR.DEFAULT_WEIGHT)

    def run_wave(self) -> dict:
        t0 = time.time()
        wave = self.wave + 1
        frontier = self.frontier()
        seen = self.seen()

        top = FR.pop_wave(
            frontier,
            self.cfg.wave_size,
            robots=self.robots,
            default_budget=self.cfg.default_budget,
            min_weight=self.cfg.min_weight,
        )
        # the wave is small; cache it — it feeds fetch, settle AND removal
        top = top.cache()
        n_popped = top.count()
        if n_popped == 0:
            return {"wave": wave, "n_popped": 0, "done": True}

        # fetch: the pages table is the 100 TB side — never shuffle it.
        # (1) broadcast-SEMI the wave into pages (build side = wave ✓;
        #     at cluster scale a bucketed/partitioned pages table makes this
        #     a pruned scan), then (2) left-join the tiny hit set back onto
        #     the wave (auto-broadcast: ≤ wave_size rows).
        hits = self.pages.select("url", "html").join(
            F.broadcast(top.select("url")), "url", "left_semi"
        )
        fetched = top.join(F.broadcast(hits), "url", "left")
        parsed = (
            fetched.withColumn(
                "status", F.when(F.col("html").isNull(), -1).otherwise(1)
            )
            .withColumn("text", extract_text_udf(F.col("html")))
            .withColumn("links", extract_links_udf(F.col("html"), F.col("url")))
        )
        parsed = parsed.withColumn(
            "simhash",
            simhash64_udf(F.col("text"))
            if self.cfg.compute_simhash
            else F.lit(None).cast("long"),
        )
        parsed = parsed.drop("html").cache()

        # F4: settle — commit 1
        seen_next = FR.settle(parsed, seen, wave)

        # F2/F3: candidates → dedup-insert
        cand = FR.make_candidates(parsed, child_weight=self._child_weight())
        if self.robots is not None:
            cand = FR.robots_filter(cand, self.robots)
        cand = cand.cache()

        frontier_rest = frontier.join(top.select("url"), "url", "left_anti")

        bloom = None
        if self.cfg.use_bloom:
            existing = frontier_rest.select("url").unionByName(
                seen_next.select("url")
            )
            est = max(frontier_rest.count() + n_popped + 1000, 1)
            bloom = ShardedBloom.build(
                existing, "url", est, self.cfg.bloom_fpp, self.cfg.bloom_shards
            )

        new_rows, frontier_upd, seen_upd = FR.dedup_insert(
            cand,
            frontier_rest,
            seen_next,
            wave,
            max_depth=self.cfg.max_depth,
            bloom=bloom,
        )
        frontier_final = frontier_upd.unionByName(new_rows).repartition(
            self.cfg.n_partitions, "host"
        )

        # commits (atomic snapshot per table, per wave)
        self.store.commit("seen", seen_upd, wave)
        self.store.commit("frontier", frontier_final, wave)
        pop_log_next = self.store.read("pop_log").unionByName(
            top.select(
                F.lit(wave).cast("int").alias("wave"),
                F.col("pop_rank").cast("int"),
                "url",
            )
        )
        self.store.commit("pop_log", pop_log_next, wave)

        n_failed = parsed.where(F.col("status") < 0).count()
        n_cand = cand.count()
        frontier_prev = frontier.count()  # cheap: parquet snapshot count
        seen_size = self.store.read("seen").count()
        frontier_size = self.store.read("frontier").count()
        row = {
            "wave": wave,
            "n_popped": int(n_popped),
            "n_fetched": int(n_popped - n_failed),
            "n_failed": int(n_failed),
            "n_candidates": int(n_cand),
            "n_new": int(frontier_size - (frontier_prev - n_popped)),
            "frontier_size": int(frontier_size),
            "seen_size": int(seen_size),
            "wall_s": time.time() - t0,
        }
        metrics_next = self.metrics().unionByName(
            self.spark.createDataFrame([row], METRICS_SCHEMA)
        )
        self.store.commit("wave_metrics", metrics_next, wave)
        top.unpersist()
        parsed.unpersist()
        cand.unpersist()
        row["done"] = False
        return row

    def run(self, n_waves: int) -> list[dict]:
        out = []
        for _ in range(n_waves):
            r = self.run_wave()
            out.append(r)
            if r.get("done"):
                break
        return out
