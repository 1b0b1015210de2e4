"""Structured Streaming parity: the streaming operators must agree with
their batch driver-query counterparts when the stream is drained with
availableNow over the same events data."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from bingcrawler_spark import driver_queries as DQ
from bingcrawler_spark import streaming as ST


@pytest.fixture(scope="module")
def events_dir(sf_dir):
    d = tempfile.mkdtemp(prefix="ev_stream_")
    shutil.copy(f"{sf_dir}/events.parquet", f"{d}/part-0.parquet")
    return d


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_stream_equals_batch(spark, sf_dir, events_dir):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stream = ST.stream_events(spark, events_dir)
    out = ST.run_to_memory(
        ST.tumbling_counts(stream), "t_tumbling", output_mode="complete"
    )
    batch = DQ.ev_tumbling(spark, sf_dir)
    cols = ["hour_epoch", "event_type", "n", "value_cents"]
    assert _rows(out, cols) == _rows(batch, cols)


def test_sessionize_stream_equals_batch(spark, sf_dir, events_dir):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stream = ST.stream_events(spark, events_dir)
    out = ST.run_to_memory(ST.sessionize_stream(stream), "t_sessions")
    # update-mode sink: keep the LAST row per user (monotone counters)
    final = (
        out.groupBy("user_id")
        .agg(
            F.max("n_sessions").alias("n_sessions"),
            F.max("n_events").alias("n_events"),
        )
    )
    batch = DQ.ev_sessionize(spark, sf_dir)
    cols = ["user_id", "n_sessions", "n_events"]
    assert _rows(final, cols) == _rows(batch, cols)


def test_dedup_stream_equals_batch_distinct(spark, sf_dir):
    """dedup_stream over a doubled input (every file twice) must emit each
    event_id exactly once — equal to the batch distinct; state is bounded
    by the watermark, not by history."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    d = tempfile.mkdtemp(prefix="ev_dups_")
    shutil.copy(f"{sf_dir}/events.parquet", f"{d}/part-0.parquet")
    shutil.copy(f"{sf_dir}/events.parquet", f"{d}/part-1.parquet")  # dup feed
    stream = ST.stream_events(spark, d)
    out = ST.run_to_memory(ST.dedup_stream(stream), "t_dedup", output_mode="append")
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert out.count() == batch.select("event_id").distinct().count()
    assert out.groupBy("event_id").count().where(F.col("count") > 1).count() == 0


def test_interval_join_stream_equals_batch(spark, sf_dir, events_dir):
    """Stream-stream interval join (click→view attribution) drained with
    availableNow equals the batch ev_interval_join query; the range
    condition is what bounds the join state store."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    views = ST.stream_events(spark, events_dir).where(
        F.col("event_type") == "view"
    )
    clicks = ST.stream_events(spark, events_dir).where(
        F.col("event_type") == "click"
    )
    out = ST.run_to_memory(
        ST.interval_join_stream(views, clicks), "t_ivj", output_mode="append"
    )
    batch = DQ.ev_interval_join(spark, sf_dir)
    cols = ["view_id", "click_id", "user_id", "lag_us"]
    assert _rows(out, cols) == _rows(batch, cols)


def test_rate_limit_stream_equals_batch(spark, sf_dir, events_dir):
    """Streaming per-(user,hour) admission decisions must equal the batch
    window-rank query row for row (append mode: each event decided once)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stream = ST.stream_events(spark, events_dir)
    out = ST.run_to_memory(
        ST.rate_limit_stream(stream), "t_ratelimit", output_mode="append"
    )
    batch = DQ.ev_rate_limit(spark, sf_dir)
    cols = ["event_id", "user_id", "hour_epoch", "admitted"]
    assert _rows(out, cols) == _rows(batch, cols)
