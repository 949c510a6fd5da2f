"""Footer-statistics utility: counts/ranges must match the data, and the
prunable fraction must reflect layout quality (sorted >> shuffled)."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_data_etl_gcs_spark.sources.catalog import load_table
from event_data_etl_gcs_spark.sources.stats import (
    column_range,
    prunable_fraction,
    table_row_count,
)

SF = "/root/testdata/sf0.001"


def test_footer_counts_and_ranges_match_data(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    d = str(tmp_path / "ev")
    ev.repartition(4).write.mode("overwrite").parquet(d)
    assert table_row_count(d) == ev.count()
    lo, hi = column_range(d, "value")
    row = ev.agg(F.min("value"), F.max("value")).collect()[0]
    assert (lo, hi) == (row[0], row[1])


def test_prunable_fraction_rewards_sorted_layout(spark, tmp_path):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    shuffled = str(tmp_path / "shuffled")
    clustered = str(tmp_path / "clustered")
    li.repartition(8).write.mode("overwrite").parquet(shuffled)
    (
        li.repartitionByRange(8, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(clustered)
    )
    lo, hi = column_range(clustered, "l_orderkey")
    mid = (lo + hi) // 2
    frac_shuffled = prunable_fraction(shuffled, "l_orderkey", lo, mid // 4)
    frac_clustered = prunable_fraction(clustered, "l_orderkey", lo, mid // 4)
    # a random layout can prune ~nothing for a range predicate; a
    # range-clustered layout prunes most of the table
    assert frac_clustered >= 0.5
    assert frac_clustered > frac_shuffled

    # timestamps: the engine writes INT64 micros precisely so these
    # stats exist (INT96 would have no min/max) — pin that contract
    ev = load_table(spark, SF, "events")
    d = str(tmp_path / "ev_ts")
    ev.orderBy("ts").write.mode("overwrite").parquet(d)
    assert column_range(d, "ts") is not None
