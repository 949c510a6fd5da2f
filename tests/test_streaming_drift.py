"""Streaming drift monitor: per-batch TVD rows must equal the same
batches scored in batch mode (integer-exact arithmetic), self-TVD must
be zero, and a shifted distribution must raise it."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_data_etl_gcs_spark.sources.catalog import load_table
from event_data_etl_gcs_spark.streaming.drift import (
    histogram,
    run_streaming_drift_monitor,
    tvd_against_reference,
)

SF = "/root/testdata/sf0.001"


def test_self_tvd_is_zero_and_shift_raises_it(spark):
    ev = load_table(spark, SF, "events")
    ref = histogram(ev)
    self_rows = tvd_against_reference(histogram(ev), ref).collect()
    assert self_rows and all(r.tvd == 0.0 for r in self_rows)
    shifted = ev.withColumn("value", F.col("value") + 200.0)
    shift_rows = tvd_against_reference(histogram(shifted), ref).collect()
    assert all(r.tvd > 0.2 for r in shift_rows)


def test_streamed_drift_rows_equal_batch_scoring(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    stream_dir = str(tmp_path / "ev_stream")
    ev.repartition(3).write.mode("overwrite").parquet(stream_dir)
    schema = spark.read.parquet(stream_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    ref = histogram(ev)
    alerts = str(tmp_path / "alerts")
    run_streaming_drift_monitor(spark, stream, ref, alerts, str(tmp_path / "ck"))

    got = spark.read.parquet(alerts)
    # one row per (micro-batch, event_type) present in that batch
    n_batches = got.select("batch_id").distinct().count()
    assert n_batches == 3

    # replay each file in batch mode: rows must match exactly
    import glob

    for f in sorted(glob.glob(f"{stream_dir}/part-*.parquet")):
        batch_df = spark.read.parquet(f)
        want = {
            (r.event_type, r.n_batch, r.n_ref, r.tvd)
            for r in tvd_against_reference(histogram(batch_df), ref).collect()
        }
        matched = [
            bid
            for bid in range(3)
            if {
                (r.event_type, r.n_batch, r.n_ref, r.tvd)
                for r in got.filter(F.col("batch_id") == bid)
                .drop("batch_id")
                .collect()
            }
            == want
        ]
        assert matched, f"no streamed batch matches batch-mode scoring of {f}"


def test_streaming_hdr_sketch_matches_batch_and_survives_replay(spark, tmp_path):
    """Streamed quantile-sketch state must equal the batch query, and a
    redelivered batch (at-least-once crash replay) must not inflate
    counts — replace-by-batch_id makes the count delta idempotent."""
    import time as _time

    from pyspark.sql import functions as F

    from event_data_etl_gcs_spark.operators.histsketch import day_histogram_sketch
    from event_data_etl_gcs_spark.queries import get_query
    from event_data_etl_gcs_spark.sources.catalog import load_table
    from event_data_etl_gcs_spark.streaming.sketches import (
        read_hdr_quantiles,
        read_state,
        run_streaming_hdr_maintenance,
    )

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events")
    d = str(tmp_path / "ev")
    for lo, hi in [(None, 0.5), (0.5, None)]:
        q = ev
        bounds = ev.select(F.percentile_approx("ts", 0.5).alias("m")).collect()[0].m
        if lo is not None:
            q = q.filter(F.col("ts") > F.lit(bounds))
        if hi is not None:
            q = q.filter(F.col("ts") <= F.lit(bounds))
        q.coalesce(1).write.mode("append").parquet(d)
        _time.sleep(1.1)
    schema = spark.read.parquet(d).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    state = str(tmp_path / "state")
    run_streaming_hdr_maintenance(spark, stream, state)

    got = sorted(map(tuple, read_hdr_quantiles(spark, state).collect()))
    want = sorted(map(tuple, get_query("hdr_quantile_sketch").fn(spark, sf).collect()))
    assert got == want

    # simulate a crash replay of the LAST batch: re-apply the second
    # half's sketch rows under the same batch_id path by re-running the
    # whole drain with the same checkpoint (no new files -> no-op), then
    # verify state totals unchanged
    stream2 = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    run_streaming_hdr_maintenance(spark, stream2, state)
    again = sorted(map(tuple, read_hdr_quantiles(spark, state).collect()))
    assert again == want
    st = read_state(spark, state, "day TIMESTAMP, bin BIGINT, cnt BIGINT, batch_id BIGINT")
    total = st.agg(F.sum("cnt")).collect()[0][0]
    assert total == day_histogram_sketch(ev).agg(F.sum("cnt")).collect()[0][0]
