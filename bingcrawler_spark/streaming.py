"""Structured Streaming operators (SURVEY.md §2.5 streaming gap).

The reference is a batch loop — its incremental analogue is the wave
iteration (crawler.py), which stays batch-iterative for exact ordering
parity.  This module adds the genuinely streaming surface a production
crawl/analytics deployment needs, built on Structured Streaming:

* ``tumbling_counts`` — windowed aggregation with a watermark for late
  data (maps to the batch `ev_tumbling` driver query; the batch/stream
  pair is asserted equal in tests/test_streaming.py via availableNow).
* ``sessionize_stream`` — gap-based sessionization as a custom stateful
  operator over ``applyInPandasWithState`` (maps to `ev_sessionize`).
* ``dedup_stream`` — exact dedup with watermark-BOUNDED state.
* ``interval_join_stream`` — stream-stream event-time range join whose
  condition lets Spark evict join state (maps to `ev_interval_join`).
* ``stream_events`` / ``run_to_memory`` — file-source plumbing helpers.

Scale notes: watermark bounds state (late events beyond the watermark are
dropped, so the window state store never grows unboundedly); the stateful
sessionizer keys state by user_id — Spark shuffles by key, state lives in
the per-partition state store, and timeouts evict idle users.  Money is
aggregated as exact integer cents — float sums are not associative and a
streaming re-order would change the result hash.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over an events parquet directory."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )


# ------------------------------------------------------------- windowed agg


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts per event_type with late-data watermark.
    Output schema matches the batch `ev_tumbling` query (hour_epoch,
    event_type, n, value_cents) so stream==batch is directly assertable."""
    return (
        events.withWatermark("ts", watermark)
        .withColumn("cents", F.round(F.col("value") * 100).cast("long"))
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("value_cents"),
        )
        .select(
            (F.unix_micros(F.col("w.start")) / 1_000_000)
            .cast("long")
            .alias("hour_epoch"),
            "event_type",
            "n",
            "value_cents",
        )
    )


# ----------------------------------------------------------- stream dedup


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event_id — dropDuplicatesWithinWatermark
    so the dedup state store is BOUNDED by the watermark horizon (a plain
    dropDuplicates on a stream keeps every key forever; at crawl scale
    that state grows unboundedly).  The batch twin is a distinct on the
    same key; stream==batch asserted in tests/test_streaming.py."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


# ---------------------------------------------------- stream-stream join


def interval_join_stream(
    views: DataFrame,
    clicks: DataFrame,
    horizon: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream INTERVAL join: every click joins the views of the
    same user that happened within `horizon` BEFORE it (attribution
    window).  Both sides carry watermarks and the join condition bounds
    event-time distance, so Spark can size and EVICT the join state —
    without the range condition a stream-stream join buffers both streams
    forever.  Output is append-mode (rows emit once the watermark passes
    the match window).  Batch twin: the `ev_interval_join` driver query;
    stream==batch asserted in tests/test_streaming.py."""
    v = views.withWatermark("ts", watermark).select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    )
    c = clicks.withWatermark("ts", watermark).select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    return v.join(
        c,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {horizon}")),
        "inner",
    ).select(
        "view_id",
        "click_id",
        F.col("v_user").alias("user_id"),
        (
            F.unix_micros(F.col("c_ts").cast("timestamp"))
            - F.unix_micros(F.col("v_ts").cast("timestamp"))
        )
        .cast("long")
        .alias("lag_us"),
    )


# -------------------------------------------------------- stateful sessions

SESSION_STATE_SCHEMA = "last_us LONG, n_sessions LONG, n_events LONG"
SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

GAP_US = 1_800_000_000  # 30 min, matches the batch ev_sessionize query


def _sessionize_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user gap sessionizer.  State = (last event us, session count,
    event count); each micro-batch concatenates ALL its Arrow chunks for the
    group and sorts ONCE before folding, so chunk boundaries within a
    micro-batch can never split a time-ordered run.  Emits the running
    totals per batch — the final batch's row equals the batch query's
    answer.

    Assumption (update-mode sessionizer): events for a user arrive in
    non-decreasing event-time order ACROSS micro-batches.  Within a batch
    order is free (sorted here); across batches an out-of-order event would
    fold against a stale last_us — a file source replaying history in file
    order satisfies the assumption, a shuffled replay would not."""
    last_us, n_sessions, n_events = (
        state.get if state.exists else (None, 0, 0)
    )
    chunks = [pdf["ts"] for pdf in pdfs if len(pdf)]
    if chunks:
        # a NULL ts has no event time — drop it BEFORE the int64 view
        # (NaT would otherwise read as int64 min and open a bogus session)
        ts = pd.concat(chunks).dropna()
        us = (ts.astype("int64") // 1000).sort_values()  # ns → µs
        for v in us:
            v = int(v)
            if last_us is None or v - last_us > GAP_US:
                n_sessions += 1
            last_us = v
            n_events += 1
    state.update((last_us, n_sessions, n_events))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_sessions": [n_sessions],
            "n_events": [n_events],
        }
    )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user session counts over a stream.
    Update output mode; state keyed and shuffled by user_id."""
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------- harness


def run_to_memory(
    stream_df: DataFrame, name: str, output_mode: str = "update"
) -> DataFrame:
    """Drain the stream with availableNow into an in-memory sink and return
    the result table (test/dev harness; production would writeStream to
    parquet/Iceberg with checkpointLocation)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


# ------------------------------------------------------- politeness limiter

RATE_LIMIT_K = 5  # admissions per key per hour window
RATE_STATE_SCHEMA = "hour_epoch LONG, n_in_hour LONG"
RATE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("hour_epoch", T.LongType()),
        T.StructField("admitted", T.IntegerType()),
    ]
)


def _rate_limit_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-key token window: admit the first RATE_LIMIT_K events of each
    tumbling hour, reject the rest — the streaming shape of the crawl's
    per-host politeness budget (a fetch scheduler consuming a request
    stream instead of popping waves).  State = (current hour, count so
    far); deterministic admission order (ts, event_id), the engine's pop
    tie-break discipline.  Same cross-batch ordering assumption as the
    sessionizer (file-order replay is in order)."""
    hour0, n = state.get if state.exists else (None, 0)
    chunks = [
        pdf[["event_id", "ts"]] for pdf in pdfs if len(pdf)
    ]
    out_ids, out_hours, out_adm = [], [], []
    if chunks:
        # NULL ts carries no event time: skip the event rather than let
        # NaT → int64 min reset the hour window and hand out K fresh
        # admissions to a key already at its cap
        df = pd.concat(chunks).dropna(subset=["ts"])
        us = df["ts"].astype("int64") // 1000  # ns → µs
        order = pd.DataFrame(
            {"event_id": df["event_id"].astype("int64"), "us": us}
        ).sort_values(["us", "event_id"])
        for eid, v in zip(order["event_id"], order["us"]):
            hour = (int(v) // 3_600_000_000) * 3600  # epoch seconds
            if hour0 is None or hour != hour0:
                hour0, n = hour, 0
            adm = 1 if n < RATE_LIMIT_K else 0
            n += 1
            out_ids.append(int(eid))
            out_hours.append(hour)
            out_adm.append(adm)
    state.update((hour0, n))
    yield pd.DataFrame(
        {
            "event_id": out_ids,
            "user_id": [key[0]] * len(out_ids),
            "hour_epoch": out_hours,
            "admitted": out_adm,
        }
    )


def rate_limit_stream(events: DataFrame) -> DataFrame:
    """Streaming politeness limiter: per-event admission decisions,
    append-mode (each event is decided exactly once).  Batch twin:
    `ev_rate_limit` (window rank ≤ K)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _rate_limit_fn,
        outputStructType=RATE_OUT_SCHEMA,
        stateStructType=RATE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
