"""Streaming HLL sketch maintenance: the streamed day-sketch table must
give the same range estimates as batch sketches over the same data, and
estimates must be within the sketch's error bound of exact counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_data_etl_gcs_spark.sources.catalog import load_table
from event_data_etl_gcs_spark.streaming.sketches import (
    batch_day_sketches,
    range_distinct_estimate,
    read_state,
    run_streaming_sketch_maintenance,
)

SF = "/root/testdata/sf0.001"


def test_streamed_sketches_match_batch(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    stream_dir = str(tmp_path / "ev_stream")
    ev.repartition(4).write.mode("overwrite").parquet(stream_dir)
    schema = spark.read.parquet(stream_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    state_dir = str(tmp_path / "sketches")
    run_streaming_sketch_maintenance(spark, stream, state_dir)

    # one row per day, merged across micro-batches
    state = read_state(spark, state_dir)
    n_days = ev.select(F.date_trunc("DAY", "ts")).distinct().count()
    assert state.count() == n_days

    # streamed estimate == batch estimate (HLL union is order-insensitive)
    est_streamed = range_distinct_estimate(
        spark, state_dir, "2024-01-01", "2024-12-31"
    ).collect()[0].est_distinct
    est_batch = (
        batch_day_sketches(ev)
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .collect()[0]
        .e
    )
    assert est_streamed == est_batch

    # and within the sketch's error bound of the exact count
    exact = ev.select("user_id").distinct().count()
    assert abs(est_streamed - exact) <= 0.05 * exact

    # sub-range read path: first week only
    wk = range_distinct_estimate(
        spark, state_dir, "2024-01-01", "2024-01-07"
    ).collect()[0].est_distinct
    exact_wk = (
        ev.filter(F.col("ts") < F.lit("2024-01-08"))
        .select("user_id")
        .distinct()
        .count()
    )
    assert abs(wk - exact_wk) <= 0.05 * max(exact_wk, 1)


def test_streamed_kmv_matches_batch(spark, tmp_path):
    from event_data_etl_gcs_spark.sources.catalog import load_table
    from event_data_etl_gcs_spark.streaming.sketches import (
        batch_kmv_rows,
        run_streaming_kmv_maintenance,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    src = str(tmp_path / "kmv_src")
    # several files -> several micro-batches with maxFilesPerTrigger
    ev.repartition(4).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path / "kmv_state")
    run_streaming_kmv_maintenance(spark, stream, state)

    got = {
        (r["grp"], r["h"])
        for r in read_state(spark, state).collect()
    }
    want = {(r["grp"], r["h"]) for r in batch_kmv_rows(ev).collect()}
    assert got == want and len(want) > 0


def test_streamed_checksums_match_batch(spark, tmp_path):
    from event_data_etl_gcs_spark.operators.validation import partition_checksums
    from event_data_etl_gcs_spark.queries.quality_audit import _orders_canonical
    from event_data_etl_gcs_spark.sources.catalog import load_table
    from event_data_etl_gcs_spark.streaming.sketches import (
        run_streaming_checksum_maintenance,
    )

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    src = str(tmp_path / "ck_src")
    orders.repartition(3).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path / "ck_state")
    part = "date_format(o_orderdate, 'yyyy-MM')"
    run_streaming_checksum_maintenance(
        spark, stream, state, part, _orders_canonical("spark")
    )
    got = {
        r["part"]: (r["n_rows"], r["checksum"], r["checksum2"])
        for r in read_state(spark, state).collect()
    }
    want = {
        r["part"]: (r["n_rows"], r["checksum"], r["checksum2"])
        for r in partition_checksums(
            orders, part, _orders_canonical("spark")
        ).collect()
    }
    assert got == want and len(want) > 1
