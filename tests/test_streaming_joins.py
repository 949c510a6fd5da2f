"""Stream-static and stream-stream joins vs their batch equivalents."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_data_etl_gcs_spark.sources.catalog import load_table
from event_data_etl_gcs_spark.streaming.joins import (
    click_purchase_attribution,
    stream_static_enrich,
)

SF = "/root/testdata/sf0.001"


def _stage_stream(spark, tmp_path, df, name):
    d = str(tmp_path / name)
    df.coalesce(2).write.parquet(d)
    schema = spark.read.parquet(d).schema
    return spark.readStream.schema(schema).parquet(d)


def _drain(spark, df, name, mode="append"):
    q = (
        df.writeStream.trigger(availableNow=True)
        .format("memory")
        .queryName(name)
        .outputMode(mode)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_stream_static_enrich(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    user_dim = ev.groupBy("user_id").agg(F.count("*").alias("n_events"))
    stream = _stage_stream(spark, tmp_path, ev, "ev_stream")
    got = _drain(spark, stream_static_enrich(stream, user_dim, "user_id"), "enriched")
    assert got.count() == ev.count()
    # every row carries the dim attribute
    assert got.filter(F.col("n_events").isNull()).count() == 0


def test_stream_stream_attribution_matches_batch(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    clicks_b = ev.filter(F.col("event_type") == "click")
    purch_b = ev.filter(F.col("event_type") == "purchase")

    # batch reference: plain interval join
    want = (
        purch_b.alias("p")
        .join(
            clicks_b.alias("c"),
            (F.col("p.user_id") == F.col("c.user_id"))
            & (F.col("p.ts") >= F.col("c.ts"))
            & (F.col("p.ts") <= F.col("c.ts") + F.expr("INTERVAL 1 hour")),
        )
        .count()
    )
    assert want > 0

    clicks_s = _stage_stream(spark, tmp_path, clicks_b, "clicks")
    purch_s = _stage_stream(spark, tmp_path, purch_b, "purchases")
    got = _drain(
        spark, click_purchase_attribution(clicks_s, purch_s), "attribution"
    )
    assert got.count() == want