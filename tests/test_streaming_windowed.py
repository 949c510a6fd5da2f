"""Streaming windowed aggregation + custom stateful operator: streaming
results must agree with their batch equivalents on the same data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from event_data_etl_gcs_spark.sources.catalog import load_table
from event_data_etl_gcs_spark.streaming.windowed import (
    stateful_running_max,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def events_stream(spark, tmp_path):
    """The events table re-staged as chronological parquet files streamed
    file-by-file (multiple micro-batches, watermark advancing in order —
    a time-shuffled arrival order would legitimately drop rows as late)."""
    import time as _time

    d = str(tmp_path / "events_stream")
    ev = load_table(spark, SF, "events")
    bounds = ev.select(
        F.percentile_approx("ts", [0.25, 0.5, 0.75]).alias("q")
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
    schema = spark.read.parquet(d).schema
    return spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)


def _drain_to_table(spark, df, name, mode):
    q = (
        df.writeStream.trigger(availableNow=True)
        .format("memory")
        .queryName(name)
        .outputMode(mode)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_windowed_counts_match_batch(spark, events_stream):
    got = _drain_to_table(
        spark, windowed_event_counts(events_stream), "win_counts", "append"
    ).collect()
    want = {
        (r.window_start, r.event_type): r.n
        for r in windowed_event_counts(load_table(spark, SF, "events")).collect()
    }
    got_map = {(r.window_start, r.event_type): r.n for r in got}
    # Append mode only emits windows closed by the final watermark; every
    # emitted window must match the batch result exactly.
    assert len(got_map) > 0
    for k, v in got_map.items():
        assert want[k] == v


def test_stateful_running_max_final_state(spark, events_stream):
    out = _drain_to_table(
        spark, stateful_running_max(events_stream), "run_max", "update"
    )
    # update mode re-emits per batch; the latest row per user is the final
    # accumulator value -> compare against batch groupBy.
    final = (
        out.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("max_value").alias("max_value"))
        .collect()
    )
    want = {
        r.user_id: (r.n, r.mx)
        for r in load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    assert len(final) == len(want)
    for r in final:
        assert want[r.user_id] == (r.n_events, r.max_value)
