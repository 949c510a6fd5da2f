"""Membership-filter queries: user-facing Bloom filter build + probe.

Complements the planner-internal runtime bloom filter (asserted in
tests/test_scale_techniques2.py) with an explicit, reusable operator —
the shape a 100 TB pipeline uses to pre-filter a huge probe table against
a selective key set without shuffling the probe side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bloom import (
    bloom_build,
    bloom_might_contain,
    duck_bloom_ctes,
    duck_bloom_probe_select,
)
from ..sources.catalog import load_table
from .registry import query

_M_BITS = 61_440

_BLOOM_ORACLE = (
    "WITH members AS (SELECT DISTINCT c_custkey AS k FROM customer "
    "WHERE c_mktsegment = 'BUILDING'), "
    + duck_bloom_ctes("members", "k", _M_BITS)
    + ", probed AS ("
    + duck_bloom_probe_select("(SELECT DISTINCT o_custkey FROM orders)", "o_custkey", _M_BITS)
    + ") "
    "SELECT probed.k AS o_custkey, probed.might_contain, "
    "(m.k IS NOT NULL) AS is_member "
    "FROM probed LEFT JOIN members m ON m.k = probed.k"
)


@query(
    "bloom_filter_members",
    oracle=_BLOOM_ORACLE,
    doc=(
        "Distributed Bloom filter: build over BUILDING-segment customer "
        "keys (bit_or word aggregation -> one-row dense array), probe every "
        "distinct orders customer map-side via broadcast. Emits the filter "
        "verdict beside ground truth — is_member=true rows must all be "
        "might_contain=true (no false negatives); the gap is the FP rate."
    ),
)
def bloom_filter_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    members = (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .distinct()
    )
    bloom = bloom_build(members, "c_custkey", _M_BITS)
    probe = orders.select(F.col("o_custkey")).distinct()
    probed = bloom_might_contain(probe, bloom, "o_custkey", _M_BITS)
    truth = members.select(
        F.col("c_custkey").alias("o_custkey"), F.lit(True).alias("is_member")
    )
    return probed.join(truth, "o_custkey", "left").select(
        "o_custkey",
        "might_contain",
        F.coalesce("is_member", F.lit(False)).alias("is_member"),
    )


@query(
    "hll_distinct_rollup",
    oracle=(
        "SELECT CAST(date_trunc('week', ts) AS DATE) AS week, "
        "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users, "
        "TRUE AS est_within_5pct "
        "FROM events GROUP BY 1"
    ),
    doc=(
        "Mergeable-sketch rollup: per-DAY Datasketches HLL sketches of "
        "distinct users (hll_sketch_agg), merged up to weeks with "
        "hll_union_agg — the two-level rollup a 100 TB pipeline "
        "materializes so ANY date range's distinct count is a sketch "
        "merge over daily partitions, never a re-scan. HLL is "
        "order-insensitive (register max), so the estimate is "
        "deterministic; the checked output pins the exact count plus an "
        "estimate-within-5%% gate (the approx_count_distinct oracle "
        "pattern — a cross-engine sketch value can't hash-match, a "
        "deterministic accuracy bound can)."
    ),
)
def hll_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("WEEK", "ts").alias("wk"),
        F.date_trunc("DAY", "ts").alias("day"),
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    weekly = daily.groupBy("wk").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users")
    )
    exact = ev.groupBy(F.date_trunc("WEEK", "ts").alias("wk")).agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        exact.join(weekly, "wk")
        .select(
            F.to_date("wk").alias("week"),
            F.col("exact_users").cast("bigint").alias("exact_users"),
            (
                F.abs(F.col("est_users") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("est_within_5pct"),
        )
    )
