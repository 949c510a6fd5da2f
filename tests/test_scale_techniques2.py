"""Scale techniques, batch 2: salted top-n windows, runtime bloom-filter
pruning, sorted-write row-group layout."""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import Window
from pyspark.sql import functions as F

from event_data_etl_gcs_spark.operators.skew import salted_topn_per_key
from event_data_etl_gcs_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_salted_topn_matches_plain_window(spark):
    ev = load_table(spark, SF, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    plain = {
        (r.user_id, r.rank): r.event_id
        for r in ev.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .collect()
    }
    salted = {
        (r.user_id, r.rank): r.event_id
        for r in salted_topn_per_key(
            ev, key="user_id", order_col="value", n=3, tiebreak="event_id"
        ).collect()
    }
    assert plain == salted


def test_bucketed_running_sum_matches_plain_window(spark):
    """Distributed prefix-sum == plain running-sum window, with a bucket
    width small enough that every user genuinely spans many buckets (so
    the offset-join path is exercised, not a degenerate 1-bucket case)."""
    from event_data_etl_gcs_spark.operators.skew import bucketed_running_sum

    ev = load_table(spark, SF, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    plain = {
        r.event_id: r.rs
        for r in ev.select(
            "event_id",
            F.sum(F.col("value").cast("decimal(18,2)"))
            .over(w)
            .cast("double")
            .alias("rs"),
        ).collect()
    }
    hour = 3_600_000_000  # force many buckets per user
    bucketed = bucketed_running_sum(
        ev, key="user_id", order_col="ts", value_col="value",
        bucket_width_micros=hour, tiebreak="event_id", out_col="rs",
    )
    n_buckets = (
        ev.select(
            F.floor(F.unix_micros("ts") / hour).alias("b"), "user_id"
        ).groupBy("user_id").agg(F.countDistinct("b").alias("nb"))
        .agg(F.max("nb")).collect()[0][0]
    )
    assert n_buckets > 1, "bucket width too wide to exercise the offset path"
    got = {r.event_id: r.rs for r in bucketed.select("event_id", "rs").collect()}
    assert got == plain


def test_bloom_filter_pruning_in_plan(spark):
    """A selective small-side join over a big probe side should inject a
    runtime bloom filter into the probe scan (SMJ path; broadcast joins
    don't need one)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB"
    )
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    try:
        o = load_table(spark, "/root/testdata/sf0.01", "orders").filter(
            F.col("o_totalprice") > 450000
        )
        li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
        joined = li.join(o, li["l_orderkey"] == o["o_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "bloom" in plan.lower(), plan
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_sorted_write_produces_tight_rowgroup_stats(spark, tmp_path):
    """sortWithinPartitions on the range-filter column -> parquet row
    groups with narrow, non-overlapping min/max — the layout property
    that makes range predicates skip row groups at scan time."""
    li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    path = str(tmp_path / "li_sorted")
    (
        li.repartition(1)
        .sortWithinPartitions("l_shipdate")
        .write.option("parquet.block.size", 256 * 1024)
        .parquet(path)
    )
    import glob

    ranges = []
    for f in glob.glob(f"{path}/*.parquet"):
        meta = pq.ParquetFile(f).metadata
        col_idx = next(
            i for i in range(meta.num_columns)
            if meta.row_group(0).column(i).path_in_schema == "l_shipdate"
        )
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(col_idx).statistics
            ranges.append((st.min, st.max))
    assert len(ranges) > 3  # small block size -> several row groups
    ranges.sort()
    overlaps = sum(1 for a, b in zip(ranges, ranges[1:]) if a[1] > b[0])
    assert overlaps == 0, ranges  # sorted layout: disjoint min/max ranges

def test_range_partitioned_write_clusters_files(spark, tmp_path):
    """repartitionByRange + sortWithinPartitions -> files covering
    disjoint key ranges (whole-file pruning for range predicates)."""
    import glob

    from event_data_etl_gcs_spark.sources.parquet_sink import write_parquet_table

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    path = str(tmp_path / "li_ranged")
    write_parquet_table(
        li, path, target_partitions=8,
        range_by=["l_shipdate"], sort_within_by=["l_shipdate"],
    )
    file_ranges = []
    for f in glob.glob(f"{path}/*.parquet"):
        meta = pq.ParquetFile(f).metadata
        idx = next(
            i for i in range(meta.num_columns)
            if meta.row_group(0).column(i).path_in_schema == "l_shipdate"
        )
        mins = [meta.row_group(g).column(idx).statistics.min for g in range(meta.num_row_groups)]
        maxs = [meta.row_group(g).column(idx).statistics.max for g in range(meta.num_row_groups)]
        file_ranges.append((min(mins), max(maxs)))
    assert len(file_ranges) >= 4
    file_ranges.sort()
    overlaps = sum(1 for a, b in zip(file_ranges, file_ranges[1:]) if a[1] > b[0])
    assert overlaps == 0, file_ranges
    # data intact
    assert spark.read.parquet(path).count() == li.count()


def test_stable_row_id_plan_is_distributed(spark):
    """stable_row_id must not funnel the data through a global
    single-partition window: the data path is a range repartition + local
    sort + broadcast join of per-partition offsets. The only
    SinglePartition exchange allowed is the one over the per-partition
    stats frame (<= #partitions rows, post-aggregation)."""
    from event_data_etl_gcs_spark.functions.ids import stable_row_id

    ev = load_table(spark, SF, "events").select("event_id", "user_id")
    out = stable_row_id(ev, order_by=["event_id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange rangepartitioning" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    # any Window must read aggregated partition stats, not raw rows:
    # a HashAggregate appears between the Window and its table scan
    after_window = plan.split("Window", 1)[1]
    agg_pos = after_window.find("HashAggregate")
    scan_pos = after_window.find("InMemoryTableScan")
    assert 0 <= agg_pos < scan_pos, plan
    # dense, deterministic, matches the explicit order
    rows = out.orderBy("row_id").collect()
    ids = [r.row_id for r in rows]
    assert ids == list(range(1, len(rows) + 1))
    assert [r.event_id for r in rows] == sorted(r.event_id for r in rows)


def test_zorder_write_clusters_both_columns(spark, tmp_path):
    """Z-order layout: every file covers a small hyper-rectangle, so the
    SECOND z-column also gets tight per-file ranges — a lexicographic
    sort leaves it spanning ~the full range in every file."""
    import glob

    from event_data_etl_gcs_spark.sources.parquet_sink import (
        write_parquet_table,
        write_zordered,
    )

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )

    def mean_span(path, col):
        spans = []
        lo, hi = None, None
        metas = []
        for f in glob.glob(path + "/*.parquet"):
            meta = pq.ParquetFile(f).metadata
            idx = next(
                i for i in range(meta.num_columns)
                if meta.row_group(0).column(i).path_in_schema == col
            )
            mns = [meta.row_group(g).column(idx).statistics.min for g in range(meta.num_row_groups)]
            mxs = [meta.row_group(g).column(idx).statistics.max for g in range(meta.num_row_groups)]
            metas.append((min(mns), max(mxs)))
        lo = min(m for m, _ in metas)
        hi = max(m for _, m in metas)
        for m, x in metas:
            spans.append((x - m) / max(hi - lo, 1))
        return sum(spans) / len(spans)

    zpath = str(tmp_path / "zordered")
    write_zordered(li, zpath, zorder_by=["l_orderkey", "l_partkey"], target_partitions=16)
    lpath = str(tmp_path / "lexsorted")
    write_parquet_table(
        li, lpath, target_partitions=16,
        range_by=["l_orderkey"], sort_within_by=["l_orderkey", "l_partkey"],
    )

    # leading column: both layouts cluster it
    assert mean_span(zpath, "l_orderkey") < 0.6
    # second column: z-order clusters it, lexicographic cannot
    z2 = mean_span(zpath, "l_partkey")
    l2 = mean_span(lpath, "l_partkey")
    assert z2 < 0.6 < l2, (z2, l2)
    assert spark.read.parquet(zpath).count() == li.count()


def test_dynamic_partition_pruning_plan(spark, tmp_path):
    """A selective dim filter must prune the partitioned fact scan at
    RUNTIME (dynamic partition pruning): the executed plan carries a
    dynamicpruning subquery on the fact side's partition column — at
    100 TB this is the difference between scanning one month and
    scanning the table."""
    from event_data_etl_gcs_spark.sources.catalog import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    fact_dir = str(tmp_path / "fact_part")
    ev.write.partitionBy("day").parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)
    days = sorted(r["day"] for r in ev.select("day").distinct().collect())
    assert len(days) > 2, "fixture needs multiple partitions to prune"

    dim_dir = str(tmp_path / "dim")
    spark.createDataFrame(
        [(d, f"t{i}") for i, d in enumerate(days)], "day string, tag string"
    ).write.parquet(dim_dir)
    dim = spark.read.parquet(dim_dir).filter(F.col("tag") == "t1")

    j = fact.join(dim, "day").groupBy("tag").agg(F.count("*").alias("n"))
    rows = j.collect()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan
    assert "SubqueryAdaptiveBroadcast" in plan or "SubqueryBroadcast" in plan
    # and the result is exactly the one day's worth of events
    want = ev.filter(F.col("day") == days[1]).count()
    assert rows[0]["n"] == want
