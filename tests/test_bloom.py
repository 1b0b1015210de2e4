"""Sharded Bloom filter: no false negatives, bounded false positives."""

from pyspark.sql import functions as F

from bingcrawler_spark.bloom import ShardedBloom


def test_bloom_membership(spark):
    members = [f"http://h{i % 7}.example/p/{i}" for i in range(0, 4000, 2)]
    others = [f"http://h{i % 7}.example/p/{i}" for i in range(1, 4001, 2)]
    df = spark.createDataFrame([(u,) for u in members], ["url"]).repartition(4)
    bloom = ShardedBloom.build(df, "url", expected_items=len(members), fpp=0.01, n_shards=4)

    probe = spark.createDataFrame(
        [(u, True) for u in members] + [(u, False) for u in others],
        ["url", "is_member"],
    )
    got = probe.withColumn("hit", bloom.might_contain_col(F.col("url"))).collect()
    false_neg = sum(1 for r in got if r["is_member"] and not r["hit"])
    false_pos = sum(1 for r in got if not r["is_member"] and r["hit"])
    assert false_neg == 0  # Bloom guarantee
    assert false_pos <= len(others) * 0.05  # fpp 0.01 with slack


def test_incremental_add_equals_full_build(spark):
    """add_df deltas must reach the exact same positive set as one full
    build over the union (same hash family, same bitmaps ORed)."""
    from pyspark.sql import functions as F

    from bingcrawler_spark.bloom import ShardedBloom

    base = spark.range(0, 800).select(
        F.concat(F.lit("http://h/"), F.col("id").cast("string")).alias("url")
    )
    delta = spark.range(800, 1000).select(
        F.concat(F.lit("http://h/"), F.col("id").cast("string")).alias("url")
    )
    inc = ShardedBloom.build(base, "url", expected_items=2000, n_shards=2)
    inc.add_df(delta, "url")
    full = ShardedBloom.build(
        base.unionByName(delta), "url", expected_items=2000, n_shards=2
    )
    assert inc.shards == full.shards  # bit-identical bitmaps
    probe = spark.range(0, 1000).select(
        F.concat(F.lit("http://h/"), F.col("id").cast("string")).alias("url")
    )
    hits = probe.select(inc.might_contain_col(F.col("url")).alias("m"))
    assert hits.where(~F.col("m")).count() == 0  # no false negatives
