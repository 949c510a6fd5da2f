"""User-facing Bloom filter: guarantees + map-only probe plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_data_etl_gcs_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
)
from event_data_etl_gcs_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    customer = load_table(spark, SF, "customer")
    members = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey"
    )
    bloom = bloom_build(members, "c_custkey")
    probe = load_table(spark, SF, "orders").select("o_custkey").distinct()
    probed = bloom_might_contain(probe, bloom, "o_custkey")
    truth = {r.c_custkey for r in members.collect()}
    rows = probed.collect()
    misses = [r for r in rows if r.o_custkey in truth and not r.might_contain]
    assert misses == [], f"false negatives: {misses[:5]}"
    non_members = [r for r in rows if r.o_custkey not in truth]
    fps = sum(1 for r in non_members if r.might_contain)
    # m/n ~ 1800 bits/key at this SF: expected FP rate is ~0.
    assert fps <= max(1, len(non_members) // 20), (fps, len(non_members))


def test_bloom_probe_is_map_only(spark):
    """The probe side must not shuffle: the filter arrives by broadcast and
    the membership test is a projection. Only the tiny build side may
    exchange."""
    li = load_table(spark, SF, "lineitem")
    members = load_table(spark, SF, "customer").select("c_custkey")
    bloom = bloom_build(members, "c_custkey")
    probed = bloom_might_contain(li, bloom, "l_orderkey")
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan, plan
    # Exactly the build side's exchanges; none on the lineitem branch —
    # the probe scan feeds the broadcast join directly.
    probe_branch = plan.split("BroadcastNestedLoopJoin")[1]
    scan_side = [
        ln for ln in probe_branch.splitlines() if "Exchange" in ln and "lineitem" in ln
    ]
    assert scan_side == [], plan
    assert probed.filter(F.col("might_contain")).count() >= 0
