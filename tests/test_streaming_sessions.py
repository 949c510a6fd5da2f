"""Streaming sessionization (applyInPandasWithState + EventTimeTimeout)
must reproduce the batch sessionize query's sessions exactly."""

from __future__ import annotations

import time as _time

import pytest
from pyspark.sql import functions as F

from event_data_etl_gcs_spark.sources.catalog import load_table
from event_data_etl_gcs_spark.streaming.sessions import stateful_sessionize

SF = "/root/testdata/sf0.001"
SENTINEL_USER = -1


@pytest.fixture()
def sessions_stream(spark, tmp_path):
    """Chronological event files + a far-future sentinel event as the last
    file: its watermark advance pushes every real user's open session past
    its event-time timeout, so all sessions flush before the stream ends."""
    d = str(tmp_path / "events_stream")
    ev = load_table(spark, SF, "events")
    bounds = ev.select(
        F.percentile_approx("ts", [0.33, 0.66]).alias("q")
    ).collect()[0].q
    lo = None
    for hi in [*bounds, None]:
        chunk = ev
        if lo is not None:
            chunk = chunk.filter(F.col("ts") > F.lit(lo))
        if hi is not None:
            chunk = chunk.filter(F.col("ts") <= F.lit(hi))
        chunk.coalesce(1).write.mode("append").parquet(d)
        _time.sleep(1.1)  # distinct mtimes -> deterministic file order
        lo = hi
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    sentinel = (
        ev.limit(1)
        .withColumn("user_id", F.lit(SENTINEL_USER).cast("long"))
        .withColumn(
            "ts",
            (F.lit(max_ts) + F.expr("INTERVAL 40 MINUTES")).cast("timestamp"),
        )
    )
    sentinel.coalesce(1).write.mode("append").parquet(d)
    _time.sleep(1.1)
    schema = spark.read.parquet(d).schema
    return spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)


def test_streaming_sessions_match_batch(spark, sessions_stream):
    q = (
        stateful_sessionize(sessions_stream, gap_minutes=30, watermark="1 minute")
        .writeStream.trigger(availableNow=True)
        .format("memory")
        .queryName("stream_sessions")
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.table("stream_sessions").collect()
        if r.user_id != SENTINEL_USER
    }
    # Batch truth: the registered sessionize query (lag -> boundary flag ->
    # running sum -> per-session agg) on the same table.
    from event_data_etl_gcs_spark.queries import get_query

    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in get_query("sessionize").fn(spark, SF).collect()
    }
    assert got == want


def test_streaming_sessions_state_is_fixed_width(spark):
    """The state tuple must stay (start, end, n) — O(active keys) memory,
    never the session's events."""
    from event_data_etl_gcs_spark.streaming.sessions import SESSION_STATE_SCHEMA

    assert [f.name for f in SESSION_STATE_SCHEMA.fields] == [
        "start_us",
        "end_us",
        "n_events",
    ]


def test_end_to_end_streaming_pipeline(spark, sessions_stream, tmp_path):
    """Capstone composition: watermark dedup -> stateful sessionize ->
    stream-static broadcast enrichment -> parquet sink with checkpoint —
    the full streaming DAG in one query, checked against its batch
    equivalent (the harder thing Spark must get right here is watermark
    propagation THROUGH the stateful operator into the stateless join)."""
    from event_data_etl_gcs_spark.queries import get_query
    from event_data_etl_gcs_spark.streaming.joins import stream_static_enrich

    ev = load_table(spark, SF, "events")
    user_dim = ev.groupBy("user_id").agg(
        F.count("*").cast("long").alias("lifetime_events")
    )

    from event_data_etl_gcs_spark.streaming._util import ensure_tz_timestamp

    deduped = (
        ensure_tz_timestamp(sessions_stream, "ts")
        .withWatermark("ts", "1 minute")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    sessions = stateful_sessionize(deduped, gap_minutes=30, watermark=None)
    enriched = stream_static_enrich(sessions, user_dim, "user_id")
    out = str(tmp_path / "pipe_out")
    q = (
        enriched.writeStream.trigger(availableNow=True)
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", out + "_ckpt")
        .outputMode("append")
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(out).filter(F.col("user_id") != SENTINEL_USER)
    want = (
        get_query("sessionize").fn(spark, SF)
        .join(user_dim, "user_id")
    )
    # same session set with the same enrichment attribute
    g = {
        (r["user_id"], r["session_start"], r["n_events"], r["lifetime_events"])
        for r in got.collect()
    }
    w = {
        (r["user_id"], r["session_start"], r["n_events"], r["lifetime_events"])
        for r in want.select(
            "user_id", "session_start", "n_events", "lifetime_events"
        ).collect()
    }
    assert g == w and len(w) > 0
