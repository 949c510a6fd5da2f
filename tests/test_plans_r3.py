"""Physical-plan assertions for the round-3 operators: the scale claims
in their docstrings must be visible in the executed plan, not just
asserted in prose."""

from __future__ import annotations

from event_data_etl_gcs_spark.queries import get_query

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = get_query(name).fn(spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_kmeans_assign_broadcasts_centroids(spark):
    plan = plan_of(spark, "kmeans_assign")
    # centroids reach the corpus by broadcast; the corpus side never
    # sort-merge-joins (which would mean a corpus shuffle)
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_srp_bits_is_map_only(spark):
    plan = plan_of(spark, "embedding_srp_bits")
    assert "Exchange" not in plan  # signature computation: scan + project


def test_srp_groups_join_is_equi_not_cartesian(spark):
    plan = plan_of(spark, "srp_hamming_groups")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # candidate generation is a hash equi-join on the band key
    assert "band_val" in plan


def test_ann_pq_adc_broadcasts_codebook_and_queries(spark):
    plan = plan_of(spark, "ann_pq_adc")
    assert "CartesianProduct" not in plan
    # both small sides (codebook, query subvectors) arrive by broadcast
    assert plan.count("BroadcastHashJoin") >= 2 or (
        "BroadcastHashJoin" in plan and "BroadcastExchange" in plan
    )


def test_interval_overlap_is_slab_equi_join(spark):
    plan = plan_of(spark, "interval_overlap_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "__slab" in plan  # the equi-join runs on (user_id, slab)


def test_hll_rollup_partial_aggregates(spark):
    plan = plan_of(spark, "hll_distinct_rollup")
    # sketch aggregation is two-phase: a partial sketch before the
    # exchange (ObjectHashAggregate for typed-imperative aggs), then the
    # merge — events never cross the wire raw
    assert "hll_sketch_agg" in plan
    assert "ObjectHashAggregate" in plan


def test_containment_probe_is_equi_join(spark):
    """dedup_containment (round 7): candidates must come from the
    prefix-probe EQUI-join on the shingle hash — never a cross
    product — and the verify stage joins sets back by id."""
    plan = plan_of(spark, "dedup_containment")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
