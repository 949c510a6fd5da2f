"""Stream-static enrichment: streaming result must equal the batch join
on the same data, and illegal join shapes fail fast."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from event_data_etl_gcs_spark.sources.catalog import load_table
from event_data_etl_gcs_spark.streaming.enrich import (
    stream_static_enrich,
    streaming_event_enrichment,
)

SF = "/root/testdata/sf0.001"


def _stage_stream(spark, tmp_path, n_files=3):
    d = str(tmp_path / "ev_stream")
    ev = load_table(spark, SF, "events")
    ev.repartition(n_files).write.mode("overwrite").parquet(d)
    schema = spark.read.parquet(d).schema
    return (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d),
        ev,
    )


def _user_profile(ev):
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events_total"),
        F.sum("value").alias("value_total"),
    )


def test_stream_static_enrich_matches_batch(spark, tmp_path):
    stream, ev = _stage_stream(spark, tmp_path)
    profile = _user_profile(ev)
    q = (
        streaming_event_enrichment(stream, profile)
        .writeStream.trigger(availableNow=True)
        .format("memory")
        .queryName("enriched")
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
    got = spark.table("enriched")
    want = ev.join(F.broadcast(profile), "user_id", "left")
    assert got.count() == ev.count()  # left join drops no fact rows
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_unsupported_join_shapes_fail_fast(spark, tmp_path):
    stream, ev = _stage_stream(spark, tmp_path, n_files=1)
    profile = _user_profile(ev)
    for how in ("right", "full", "full_outer"):
        with pytest.raises(ValueError, match="unsupported"):
            stream_static_enrich(stream, profile, on="user_id", how=how)


def test_srp_bits_streams_stateless(spark, tmp_path):
    """embedding_srp_bits is a pure projection (plan test asserts no
    Exchange) — so it must run unchanged as a stateless streaming
    transform, and the streamed signatures must equal the batch ones."""
    from pyspark.sql import functions as F

    from event_data_etl_gcs_spark.operators.similarity import bucket_sql

    emb = load_table(spark, SF, "embeddings")
    d = str(tmp_path / "emb_stream")
    emb.repartition(3).write.mode("overwrite").parquet(d)
    schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    bits = lambda df: df.select(  # noqa: E731
        "vec_id", F.expr(bucket_sql("embedding", 32)).alias("srp_bits")
    )
    q = (
        bits(stream)
        .writeStream.trigger(availableNow=True)
        .format("memory")
        .queryName("srp_stream")
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
    got = spark.table("srp_stream")
    want = bits(emb)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
