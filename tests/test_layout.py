"""Bucketed-join plan shape (no Exchange) + salted-join equivalence."""

from pyspark.sql import functions as F

from bingcrawler_spark import layout as L


def _orders(spark, n=400, n_cust=37):
    return spark.range(n).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % n_cust).alias("o_custkey"),
        (F.col("id") * 7 % 1000).alias("cents"),
    )


def _cust(spark, n_cust=37):
    return spark.range(n_cust).select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("cust"), F.col("id")).alias("c_name"),
    )


def test_bucketed_join_has_no_exchange(spark):
    L.write_bucketed(_orders(spark), "t_lo_orders", "o_custkey", 8)
    L.write_bucketed(_cust(spark), "t_lo_cust", "c_custkey", 8)
    j = L.bucketed_join(
        spark, "t_lo_orders", "t_lo_cust", "o_custkey", "c_custkey", force_merge=True
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # bucket co-location proved to Catalyst
    # and the answer is the plain join's
    expect = (
        _orders(spark)
        .join(_cust(spark), F.col("o_custkey") == F.col("c_custkey"))
        .count()
    )
    assert j.count() == expect == 400


def test_bucketed_join_aggregate_matches_plain(spark):
    L.write_bucketed(_orders(spark), "t_lo_orders2", "o_custkey", 8)
    L.write_bucketed(_cust(spark), "t_lo_cust2", "c_custkey", 8)
    j = (
        L.bucketed_join(spark, "t_lo_orders2", "t_lo_cust2", "o_custkey", "c_custkey")
        .groupBy("c_name")
        .agg(F.sum("cents").alias("total_cents"), F.count(F.lit(1)).alias("n"))
    )
    plain = (
        _orders(spark)
        .join(_cust(spark), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name")
        .agg(F.sum("cents").alias("total_cents"), F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, j.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_matches_plain(spark):
    # heavy skew: 90% of rows share one key
    big = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(0)).otherwise(F.col("id") % 37).alias("k"),
        F.col("id").alias("uid"),
    )
    small = spark.range(37).select(
        F.col("id").alias("k"), (F.col("id") * 11).alias("v")
    )
    got = sorted(map(tuple, L.salted_join(big, small, "k", "uid").collect()))
    want = sorted(map(tuple, big.join(small, "k").collect()))
    assert got == want and len(got) == 1000


def test_salted_join_spreads_hot_key(spark):
    big = spark.range(800).select(F.lit(0).cast("bigint").alias("k"), F.col("id").alias("uid"))
    small = spark.range(1).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    j = L.salted_join(big, small, "k", "uid", n_salt=8)
    per_salt = (
        big.withColumn("_salt", F.pmod(F.xxhash64("uid"), F.lit(8)))
        .groupBy("_salt")
        .count()
        .collect()
    )
    assert len(per_salt) == 8  # the single hot key now occupies 8 groups
    assert max(r["count"] for r in per_salt) < 800
    assert j.count() == 800
