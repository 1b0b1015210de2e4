"""Measure sf0.1 → sf1 scaling exponents for the dedup/NN family.

VERDICT r3 task 7: the 100 TB claims for dd_minhash_lsh, dd_containment,
dd_dup_clusters, r12_banded_nn and dd_semdedup were argued from plan
shape (banded/bucketed, never all-pairs) but measured at one scale
factor.  This tool runs each registered query at sf0.1 (driver testdata)
and at a 10x corpus, and reports the empirical exponent
``log(t_sf1 / t_sf0.1) / log(10)`` — banding holds iff it sits near 1
(Õ(n)), not 2 (all-pairs).

The 10x corpus (written once to /tmp/sf1_scaled) models how a web corpus
actually grows: duplicate-cluster SIZE is scale-free while cluster COUNT
grows with the corpus.  It is 10 disjoint shards of the sf0.1 tables —
documents get shard-suffixed tokens (every shingle/token hash changes, so
shards share no near-dups and band buckets stay sf0.1-sized while bucket
COUNT grows 10x) and embeddings get shard-rotated dimensions (in-shard
pairwise structure exact, cross-shard cosine decorrelated).  Replicating
WITHOUT the salt would instead grow every band bucket 10x — a quadratic
blow-up that measures the replication artifact, not the engine.

Usage: taskset -c 16-31 python tools/scale_exponents.py [reps]
Writes BENCH/SCALE_EXPONENTS.md and prints one JSON line.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/sf1_scaled"
N_SHARDS = 10
QUERIES = [
    "dd_minhash_lsh",
    "dd_containment",
    "dd_dup_clusters",
    "r12_banded_nn",
    "dd_semdedup",
]


def build_sf1(spark) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(SF1, "_BUILT")):
        return
    shutil.rmtree(SF1, ignore_errors=True)
    os.makedirs(SF1, exist_ok=True)

    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    doc_cols = [c for c in docs.columns if c not in ("doc_id", "text")]
    shards = []
    for k in range(N_SHARDS):
        salted = F.array_join(
            F.transform(F.split(F.col("text"), " "), lambda x: F.concat(x, F.lit(f"_s{k}"))),
            " ",
        )
        shards.append(
            docs.select(
                (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
                salted.alias("text"),
                *[F.col(c) for c in doc_cols],
            )
        )
    big_docs = shards[0]
    for s in shards[1:]:
        big_docs = big_docs.unionByName(s)
    big_docs.repartition(32).write.mode("overwrite").parquet(f"{SF1}/documents.parquet")

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    dim = len(emb.select("embedding").first()["embedding"])
    eshards = []
    for k in range(N_SHARDS):
        rot = (
            F.col("embedding")
            if k == 0
            else F.concat(
                F.slice(F.col("embedding"), k + 1, dim - k),
                F.slice(F.col("embedding"), 1, k),
            )
        )
        eshards.append(
            emb.select(
                (F.col("vec_id") + F.lit(k * 10_000_000)).alias("vec_id"),
                rot.alias("embedding"),
                F.col("label"),
            )
        )
    big_emb = eshards[0]
    for s in eshards[1:]:
        big_emb = big_emb.unionByName(s)
    big_emb.repartition(32).write.mode("overwrite").parquet(f"{SF1}/embeddings.parquet")

    # dep-safety: every other table resolves at sf0.1 size (none of the
    # measured queries scales on them)
    for t in os.listdir(SF01):
        src, dst = os.path.join(SF01, t), os.path.join(SF1, t)
        if os.path.exists(dst):
            continue
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)
    open(os.path.join(SF1, "_BUILT"), "w").close()


def time_query(spark, fn, sf_dir: str, reps: int) -> tuple[float, int]:
    best, rows = math.inf, 0
    for _ in range(reps):
        spark.catalog.clearCache()
        t0 = time.time()
        rows = fn(spark, sf_dir).count()
        best = min(best, time.time() - t0)
    return best, rows


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from bingcrawler_spark import analytics as A
    from bingcrawler_spark import driver_queries as DQ
    from bingcrawler_spark import xhash as X
    from bingcrawler_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("scale_exponents", cores=16, shuffle_partitions=32)
    build_sf1(spark)
    out = {"queries": {}, "reps": reps, "shards": N_SHARDS}
    for name in QUERIES:
        fn = DQ.QUERIES[name]
        t01, r01 = time_query(spark, fn, SF01, reps)
        t1, r1 = time_query(spark, fn, SF1, reps)
        exp = round(math.log(t1 / t01) / math.log(10), 2)
        out["queries"][name] = {
            "sf0.1_s": round(t01, 2),
            "sf1_s": round(t1, 2),
            "rows_sf0.1": r01,
            "rows_sf1": r1,
            "wall_exponent": exp,
        }
        print(json.dumps({name: out["queries"][name]}), flush=True)

    # the shuffle-row driver for the banded families: candidate pairs
    def cand_count(sf_dir: str) -> int:
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        fps = X.simhash60_df(d).select(
            F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("title"),
            F.col("simhash60").alias("simhash"),
        )
        return A.banded_candidates(fps, n_bands=4).count()

    c01, c1 = cand_count(SF01), cand_count(SF1)
    out["banded_candidate_pairs"] = {
        "sf0.1": c01,
        "sf1": c1,
        "exponent": round(math.log(c1 / c01) / math.log(10), 2),
    }

    lines = [
        "# Scale exponents — dedup/NN family, sf0.1 → sf1 (10x)",
        "",
        "Empirical check that the banded/bucketed plans scale Õ(n), not n²",
        "(VERDICT r3 task 7).  10x corpus = 10 disjoint shards of sf0.1",
        "(shard-salted tokens / shard-rotated embedding dims): duplicate-",
        "cluster size stays scale-free, cluster count grows with the corpus",
        "— the way a real web corpus grows.  Replicating WITHOUT the salt",
        "grows every band bucket 10x instead, and bucket self-joins are",
        "quadratic in bucket size by design: that measures the replication",
        "artifact, not the engine.  Exponent = log10(t_sf1 / t_sf0.1);",
        f"best-of-{reps} walls, local[16], same session.",
        "",
        "| query | sf0.1 s | sf1 s | rows sf0.1 | rows sf1 | wall exponent |",
        "|---|---|---|---|---|---|",
    ]
    for name, q in out["queries"].items():
        lines.append(
            f"| {name} | {q['sf0.1_s']} | {q['sf1_s']} | {q['rows_sf0.1']} "
            f"| {q['rows_sf1']} | **{q['wall_exponent']}** |"
        )
    bc = out["banded_candidate_pairs"]
    lines += [
        "",
        f"Shuffle-row driver (banded candidate pairs feeding r12's window):"
        f" {bc['sf0.1']:,} at sf0.1 → {bc['sf1']:,} at sf1 — exponent"
        f" **{bc['exponent']}** (band-bucket count grows with the corpus,"
        " bucket size does not).",
        "",
        "Wall exponents < 1 mean fixed per-query constants (session jobs,"
        " Catalyst planning, small-side builds) still dominate at sf1;"
        " ≈ 1 is linear data growth; 2 would be the all-pairs blow-up the"
        " banding exists to avoid.",
    ]
    os.makedirs(os.path.join(HERE, "BENCH"), exist_ok=True)
    with open(os.path.join(HERE, "BENCH", "SCALE_EXPONENTS.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
