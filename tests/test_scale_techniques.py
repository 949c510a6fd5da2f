"""Scale-technique operators: salted joins, two-phase aggregation,
bucketed co-located joins, pandas-UDF escape hatch. Each is checked for
correctness AND for the plan property it exists to produce."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_data_etl_gcs_spark.functions.time import epoch_millis_to_timestamp
from event_data_etl_gcs_spark.functions.udf import epoch_millis_to_timestamp_pudf
from event_data_etl_gcs_spark.operators.skew import salted_join, two_phase_agg_count
from event_data_etl_gcs_spark.sources.bucketed import write_bucketed_table
from event_data_etl_gcs_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_salted_join_matches_plain_join(spark):
    orders = load_table(spark, SF, "orders")
    cust = load_table(spark, SF, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = orders.join(cust, "o_custkey").groupBy("o_custkey").count()
    salted = (
        salted_join(orders, cust, "o_custkey").groupBy("o_custkey").count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_two_phase_agg_matches_plain(spark):
    ev = load_table(spark, SF, "events")
    plain = {r.user_id: r[1] for r in ev.groupBy("user_id").count().collect()}
    two = {r.user_id: r.n for r in two_phase_agg_count(ev, "user_id").collect()}
    assert plain == two


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    orders = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    write_bucketed_table(
        orders.withColumnRenamed("o_orderkey", "okey"), "b_orders", "okey", 8,
        path=str(tmp_path / "b_orders"),
    )
    write_bucketed_table(
        li.withColumnRenamed("l_orderkey", "okey"), "b_lineitem", "okey", 8,
        path=str(tmp_path / "b_lineitem"),
    )
    # small inputs would be broadcast (which also skips the shuffle);
    # force the sort-merge path to show bucket co-location doing the work
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(spark.table("b_lineitem"), "okey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan  # no shuffle
        assert "Bucketed: true" in plan, plan
        assert joined.count() == li.count()  # FK: every lineitem matches
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_pandas_udf_matches_native_timestamp(spark):
    df = spark.createDataFrame(
        [(1541000000123.0,), (1546400000999.0,), (0.0,)], "ts double"
    )
    out = df.select(
        epoch_millis_to_timestamp("ts").alias("native"),
        epoch_millis_to_timestamp_pudf()("ts").alias("pudf"),
    ).collect()
    for r in out:
        assert r.native == r.pudf
