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


SF10 = "/tmp/sf10_scaled"
N_SHARDS_10 = 100
DECADE2_QUERIES = ["dd_semdedup", "r12_banded_nn"]


def _sign_pattern(k: int, dim: int) -> list[float]:
    """Deterministic ±1 diagonal per shard (md5 bits): preserves every
    in-shard pairwise cosine exactly (common diagonal), decorrelates
    cross-shard cosines even between shards sharing a rotation offset
    (their patterns differ in ~dim/2 positions)."""
    import hashlib

    h = hashlib.md5(f"sfx-shard-{k}".encode()).digest()
    bits = int.from_bytes(h, "big")
    return [1.0 if (bits >> (i % 128)) & 1 else -1.0 for i in range(dim)]


def build_sf10(spark) -> None:
    """Second decade (VERDICT r4 task 8): 100 disjoint shards of sf0.1,
    same growth model as build_sf1 — shard-salted tokens keep band
    buckets sf0.1-sized while bucket COUNT grows 100x; embeddings get
    rotation + per-shard sign-diagonal so in-shard structure is exact
    and cross-shard cosines stay decorrelated even when two shards share
    a rotation offset (100 shards > 64 dims)."""
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(SF10, "_BUILT")):
        return
    shutil.rmtree(SF10, ignore_errors=True)
    os.makedirs(SF10, exist_ok=True)

    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    doc_cols = [c for c in docs.columns if c not in ("doc_id", "text")]
    shards = []
    for k in range(N_SHARDS_10):
        salted = F.array_join(
            F.transform(
                F.split(F.col("text"), " "), lambda x: F.concat(x, F.lit(f"_s{k}"))
            ),
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
    big_docs.repartition(64).write.mode("overwrite").parquet(
        f"{SF10}/documents.parquet"
    )

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    dim = len(emb.select("embedding").first()["embedding"])
    eshards = []
    for k in range(N_SHARDS_10):
        r = k % dim
        rot = (
            F.col("embedding")
            if r == 0
            else F.concat(
                F.slice(F.col("embedding"), r + 1, dim - r),
                F.slice(F.col("embedding"), 1, r),
            )
        )
        signs = F.array(*[F.lit(s) for s in _sign_pattern(k, dim)])
        flipped = F.zip_with(rot, signs, lambda a, b: (a * b).cast("float"))
        eshards.append(
            emb.select(
                (F.col("vec_id") + F.lit(k * 10_000_000)).alias("vec_id"),
                flipped.alias("embedding"),
                F.col("label"),
            )
        )
    big_emb = eshards[0]
    for s in eshards[1:]:
        big_emb = big_emb.unionByName(s)
    big_emb.repartition(64).write.mode("overwrite").parquet(
        f"{SF10}/embeddings.parquet"
    )

    for t in os.listdir(SF01):
        src, dst = os.path.join(SF01, t), os.path.join(SF10, t)
        if os.path.exists(dst):
            continue
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)
    open(os.path.join(SF10, "_BUILT"), "w").close()


def decade2(reps: int) -> None:
    """sf1 → sf10 exponents for the two highest decade-1 exponents
    (dd_semdedup 0.84, r12_banded_nn 0.48): two decades distinguish a
    trend from a one-off.  Appends a second table to SCALE_EXPONENTS.md."""
    from bingcrawler_spark import driver_queries as DQ
    from bingcrawler_spark.session import get_spark

    spark = get_spark("scale_exponents2", cores=16, shuffle_partitions=64)
    build_sf1(spark)
    build_sf10(spark)
    out = {"queries": {}, "reps": reps, "shards_sf10": N_SHARDS_10}
    for name in DECADE2_QUERIES:
        fn = DQ.QUERIES[name]
        t1, r1 = time_query(spark, fn, SF1, reps)
        t10, r10 = time_query(spark, fn, SF10, reps)
        exp = round(math.log(t10 / t1) / math.log(10), 2)
        out["queries"][name] = {
            "sf1_s": round(t1, 2),
            "sf10_s": round(t10, 2),
            "rows_sf1": r1,
            "rows_sf10": r10,
            "wall_exponent": exp,
        }
        print(json.dumps({name: out["queries"][name]}), flush=True)
    lines = [
        "",
        "## Second decade — sf1 → sf10 (100 shards, same growth model)",
        "",
        "Run for the two highest decade-1 exponents; a trend across two",
        "decades is what separates 'measured once' from 'scales'.  The",
        "100-shard corpus adds per-shard sign-diagonals on embeddings so",
        "cross-shard cosines stay decorrelated past 64 rotations.",
        f"Exponent = log10(t_sf10 / t_sf1); best-of-{reps} walls,",
        "local[16], same session.",
        "",
        "| query | sf1 s | sf10 s | rows sf1 | rows sf10 | wall exponent |",
        "|---|---|---|---|---|---|",
    ]
    for name, q in out["queries"].items():
        lines.append(
            f"| {name} | {q['sf1_s']} | {q['sf10_s']} | {q['rows_sf1']} "
            f"| {q['rows_sf10']} | **{q['wall_exponent']}** |"
        )
    with open(os.path.join(HERE, "BENCH", "SCALE_EXPONENTS.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps(out), flush=True)
    spark.stop()


def time_query(spark, fn, sf_dir: str, reps: int) -> tuple[float, int]:
    best, rows = math.inf, 0
    for _ in range(reps):
        spark.catalog.clearCache()
        t0 = time.time()
        rows = fn(spark, sf_dir).count()
        best = min(best, time.time() - t0)
    return best, rows


def main() -> None:
    if "--decade2" in sys.argv:
        args = [a for a in sys.argv[1:] if a != "--decade2"]
        decade2(int(args[0]) if args else 2)
        return
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
