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

def test_stream_stream_left_outer_matches_batch(spark, tmp_path):
    """Left-outer stream-stream join: unattributed purchases are held in
    join state until the watermark passes their attribution bound (the
    state timeout), then emitted null-extended. A later file advances the
    watermark (maxFilesPerTrigger=1 forces multiple micro-batches) and
    the drained result equals the batch left join."""
    import datetime
    import glob
    import os
    import shutil

    base = tmp_path / "ss_outer"
    for d in ("clicks", "purch"):
        (base / d).mkdir(parents=True)

    T = datetime.datetime(2024, 1, 1, 0, 0, 0)
    A = T + datetime.timedelta(days=1)  # watermark advancer
    schema = "user_id long, event_id long, ts timestamp, value double"
    clicks = [(1, 100, T, 0.0), (9, 101, A, 0.0)]
    purchases = [
        (1, 200, T + datetime.timedelta(minutes=10), 9.9),  # attributed
        (2, 201, T, 5.0),  # no click -> null after watermark passes
        (9, 202, A, 1.0),  # attributed (advancer pair)
    ]

    def stage(rows, dirname):
        """One parquet file per row, mtimes ordered by event time so the
        file source picks them up oldest-first one batch at a time."""
        for i, r in enumerate(rows):
            tmp = str(base / f"_stage_{dirname}_{i}")
            spark.createDataFrame([r], schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(tmp)
            f = glob.glob(f"{tmp}/part-*.parquet")[0]
            out = str(base / dirname / f"f{i}.parquet")
            shutil.copy(f, out)
            mt = 1000 + r[2].toordinal()
            os.utime(out, (mt, mt))

    stage(clicks, "clicks")
    stage(purchases, "purch")

    cs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(base / "clicks"))
    )
    ps = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(base / "purch"))
    )
    q = (
        click_purchase_attribution(cs, ps, how="left_outer")
        .writeStream.trigger(availableNow=True)
        .option("checkpointLocation", str(base / "ckpt"))
        .format("parquet")
        .option("path", str(base / "out"))
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
    got = {
        (r.purchase_id, r.click_id)
        for r in spark.read.parquet(str(base / "out")).collect()
    }

    cb = spark.createDataFrame(clicks, schema)
    pb = spark.createDataFrame(purchases, schema)
    want = {
        (r.purchase_id, r.click_id)
        for r in pb.alias("p")
        .join(
            cb.alias("c"),
            (F.col("p.user_id") == F.col("c.user_id"))
            & (F.col("p.ts") >= F.col("c.ts"))
            & (F.col("p.ts") <= F.col("c.ts") + F.expr("INTERVAL 1 hour")),
            "left_outer",
        )
        .select(
            F.col("p.event_id").alias("purchase_id"),
            F.col("c.event_id").alias("click_id"),
        )
        .collect()
    }
    assert got == want and (201, None) in got, (got, want)


def test_stream_interval_overlap_matches_batch(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    # map-only interval derivation: each click/purchase spans 10 minutes
    clicks_b = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("l_key"),
            F.col("event_id").alias("l_id"),
            F.col("ts").alias("l_start"),
            (F.col("ts") + F.expr("INTERVAL 10 minutes")).alias("l_end"),
        )
    )
    purch_b = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("r_key"),
            F.col("event_id").alias("r_id"),
            F.col("ts").alias("r_start"),
            (F.col("ts") + F.expr("INTERVAL 10 minutes")).alias("r_end"),
        )
    )
    expected = (
        clicks_b.join(
            purch_b,
            (F.col("l_key") == F.col("r_key"))
            & (F.col("l_start") <= F.col("r_end"))
            & (F.col("r_start") <= F.col("l_end")),
        )
        .select("l_id", "r_id")
        .collect()
    )
    expected_set = {(r["l_id"], r["r_id"]) for r in expected}
    assert expected_set, "fixture produced no overlapping pairs"

    from event_data_etl_gcs_spark.streaming.joins import stream_interval_overlap

    ls = _stage_stream(spark, tmp_path, clicks_b, "iv_left")
    rs = _stage_stream(spark, tmp_path, purch_b, "iv_right")
    got = _drain(
        spark,
        stream_interval_overlap(ls, rs, max_len="30 minutes"),
        "iv_pairs",
    )
    got_set = {(r["l_id"], r["r_id"]) for r in got.select("l_id", "r_id").collect()}
    assert got_set == expected_set
