"""Plan-metrics observability: the reported numbers must reflect what
the plan actually did — scans report files/bytes/rows, shuffles report
bytes, map-only plans report zero shuffle, pruned scans read less."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_data_etl_gcs_spark.observability import run_with_metrics
from event_data_etl_gcs_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_agg_query_reports_scan_and_shuffle(spark):
    li = load_table(spark, SF, "lineitem")
    n, m = run_with_metrics(li.groupBy("l_returnflag").count())
    assert n == 3
    assert m.scan_files >= 1
    assert m.scan_bytes > 0
    assert m.scan_rows == li.count()
    assert m.shuffle_bytes > 0  # the groupBy exchange
    assert m.spill_bytes == 0  # nothing spills at this scale


def test_map_only_plan_reports_zero_shuffle(spark):
    from event_data_etl_gcs_spark.operators.similarity import bucket_sql

    emb = load_table(spark, SF, "embeddings")
    bits = emb.select("vec_id", F.expr(bucket_sql("embedding", 32)).alias("b"))
    _, m = run_with_metrics(bits)
    assert m.shuffle_bytes == 0


def test_partition_pruning_visible_in_scan_metrics(spark, tmp_path):
    ev = load_table(spark, SF, "events").withColumn("day", F.dayofmonth("ts"))
    d = str(tmp_path / "ev_days")
    ev.write.mode("overwrite").partitionBy("day").parquet(d)
    full = spark.read.parquet(d)
    _, m_full = run_with_metrics(full.select("event_id"))
    _, m_pruned = run_with_metrics(
        full.filter(F.col("day") == 3).select("event_id")
    )
    # the pruned scan touches strictly fewer files and bytes — the
    # programmatic check that partition pruning really happened
    assert 0 < m_pruned.scan_files < m_full.scan_files
    assert 0 < m_pruned.scan_bytes < m_full.scan_bytes
