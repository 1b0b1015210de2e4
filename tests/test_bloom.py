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
