"""Physical-plan assertions for the PCA/ANN compositions (VERDICT r8
directive #1): the 100 TB claims in the docstrings must be visible in
the executed plan."""

from __future__ import annotations

from event_data_etl_gcs_spark.queries import get_query

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = get_query(name).fn(spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_pca_ivf_topk_candidate_join_broadcasts_query_routing(spark):
    """The candidate join routes n_query x n_probe query rows to cells;
    without F.broadcast(qr) Catalyst planned a SortMergeJoin that
    shuffled the FULL corpus cell assignment on `cell` to meet ~45
    routing rows (VERDICT r8 #1). The routing side must broadcast so
    the corpus assignment never moves."""
    plan = plan_of(spark, "pca_ivf_topk")
    # no sort-merge join anywhere in the composition
    assert "SortMergeJoin" not in plan, plan
    # the candidate join runs on the cell key as a broadcast hash join
    assert "BroadcastHashJoin [cell#" in plan, plan
    # and the corpus cell assignment is never hash-repartitioned on cell
    assert "Exchange hashpartitioning(cell" not in plan, plan


def test_pca_project_whiten_is_map_only(spark):
    """Projection/whitening with literal eigenvectors: one scan, no
    exchange, no broadcast — the plan that survives any corpus size."""
    plan = plan_of(spark, "pca_project_whiten")
    assert "Exchange" not in plan, plan
