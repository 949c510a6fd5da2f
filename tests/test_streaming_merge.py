"""Streaming partition-pruned MERGE INTO: per-batch upserts rewrite only
affected partitions; keep-latest wins within a batch; replaying with the
same checkpoint is a no-op (exactly-once effect via idempotent merge)."""

from __future__ import annotations

import glob
import os
import time as _time

from pyspark.sql import functions as F

from event_data_etl_gcs_spark.sources.catalog import load_table
from event_data_etl_gcs_spark.streaming.incremental import run_streaming_merge_into

SF = "/root/testdata/sf0.001"


def _snapshot(table_dir):
    out = {}
    for f in glob.glob(os.path.join(table_dir, "day=*", "*.parquet")):
        st = os.stat(f)
        out[f] = (st.st_size, st.st_mtime_ns)
    return out


def test_streaming_merge_prunes_and_replays_idempotently(spark, tmp_path):
    ev = load_table(spark, SF, "events").withColumn("day", F.dayofmonth("ts"))
    table = str(tmp_path / "table")
    ev.write.partitionBy("day").parquet(table)
    before = _snapshot(table)

    # two stream files: (1) re-valued day-3 purchases (+ a deliberate
    # same-key duplicate pair where the larger ts must win), (2) brand-new
    # ids on day 3
    src_dir = str(tmp_path / "src")
    upd = ev.filter("day = 3 AND event_type = 'purchase'").withColumn(
        "value", F.lit(777.0)
    )
    dup_loser = upd.limit(1).withColumn("value", F.lit(111.0)).withColumn(
        "ts", F.col("ts") - F.expr("INTERVAL 1 HOUR")
    )
    max_id = ev.agg(F.max("event_id")).collect()[0][0]
    ins = upd.limit(2).withColumn(
        "event_id", F.col("event_id") + F.lit(max_id).cast("long")
    )
    upd.unionByName(dup_loser).coalesce(1).write.mode("append").parquet(src_dir)
    _time.sleep(1.1)
    ins.coalesce(1).write.mode("append").parquet(src_dir)
    _time.sleep(1.1)

    schema = spark.read.parquet(src_dir).schema
    ckpt = str(tmp_path / "ckpt")

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        run_streaming_merge_into(
            spark, stream, table, ["event_id"], "day", ckpt, latest_col="ts"
        )

    drain()
    after = _snapshot(table)
    touched = {f for f in before if (f not in after) or before[f] != after[f]}
    assert touched and all("day=3" in f for f in touched)

    back = spark.read.parquet(table)
    n_upd, n_ins = upd.count(), ins.count()
    assert back.count() == ev.count() + n_ins
    # keep-latest: every merged purchase carries 777, never the 111 loser
    assert (
        back.filter("day = 3 AND event_type = 'purchase' AND value <> 777.0").count()
        == 0
    )

    # replay with the SAME checkpoint: no new files to process, no change
    snap = _snapshot(table)
    drain()
    assert _snapshot(table) == snap
