"""KMV sketch quality: the estimator must actually estimate (relative
error ~ O(1/sqrt(k))) once distinct counts exceed k, and be exact below
k. The oracle gate already pins cross-engine value equality; this pins
statistical sanity."""

from __future__ import annotations

from event_data_etl_gcs_spark.operators.kmv import KMV_K
from event_data_etl_gcs_spark.queries.sketches import kmv_distinct_users_by_type


def test_kmv_exact_below_k(spark):
    rows = kmv_distinct_users_by_type(spark, "/root/testdata/sf0.001").collect()
    for r in rows:
        if r["exact_distinct"] < KMV_K:
            assert r["kmv_estimate"] == float(r["exact_distinct"])


def test_kmv_estimates_above_k(spark):
    rows = kmv_distinct_users_by_type(spark, "/root/testdata/sf0.1").collect()
    estimating = [r for r in rows if r["exact_distinct"] >= 4 * KMV_K]
    assert estimating, "sf0.1 should have groups well above k distinct users"
    for r in estimating:
        rel = abs(r["kmv_estimate"] - r["exact_distinct"]) / r["exact_distinct"]
        # std error ~ 1/sqrt(k-2) ~ 0.127; allow 4 sigma
        assert rel < 0.51, (r["event_type"], r["kmv_estimate"], r["exact_distinct"])
