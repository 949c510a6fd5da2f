"""Video-shaped multimodal plumbing: frame sampling, resize, grouped-map."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_data_etl_gcs_spark.operators.grouped import per_group_zscore
from event_data_etl_gcs_spark.operators.multimodal import (
    FRAME_BYTES,
    FRAME_H,
    FRAME_W,
    frame_sample,
    resize_frames,
    synthesize_videos,
)
from event_data_etl_gcs_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_frame_sample_counts_and_sums(spark):
    docs = spark.createDataFrame(
        [(1, "abcdefgh"), (2, "zz")], "doc_id long, text string"
    )
    vids = synthesize_videos(docs, n_frames=12)
    row = vids.filter(F.col("media_id") == 1).collect()[0]
    assert len(bytes(row.payload)) == 12 * FRAME_BYTES

    sampled = frame_sample(vids, every_k=4)
    rows = sampled.filter(F.col("media_id") == 1).orderBy("frame_idx").collect()
    assert [r.frame_idx for r in rows] == [0, 4, 8]
    # checksum matches a direct recomputation
    src = "abcdefgh".encode()
    frame0 = (src[0:] + src * (FRAME_BYTES // len(src) + 2))[:FRAME_BYTES]
    assert rows[0].frame_sum == sum(frame0)


def test_resize_halves_each_axis(spark):
    docs = spark.createDataFrame([(7, "hello world")], "doc_id long, text string")
    small = resize_frames(synthesize_videos(docs, n_frames=2), stride=2).collect()
    assert len(small) == 2
    assert len(bytes(small[0].small)) == (FRAME_W // 2) * (FRAME_H // 2)


def test_grouped_map_zscore_matches_window(spark):
    ev = (
        load_table(spark, SF, "events")
        .select("user_id", F.col("event_id").alias("row_id"), "value")
    )
    got = {
        r.row_id: r.zscore
        for r in per_group_zscore(ev, "user_id", "value").collect()
    }
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    want_df = ev.select(
        "row_id",
        ((F.col("value") - F.mean("value").over(w)) / F.stddev_pop("value").over(w)).alias("z"),
    ).collect()
    for r in want_df:
        assert abs(got[r.row_id] - (r.z or 0.0)) < 1e-9
