"""General query surface, batch 2: the SQL front door (spark.sql over
registered views — CTEs, scalar/EXISTS subqueries), more TPC-H shapes
(Q4/Q6), distribution windows, argmax aggregates, exact percentiles,
lateral explode, and the array-function family."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table, register_views
from .registry import query


# --- SQL front door ---------------------------------------------------------

@query(
    "sql_cte_scalar_subquery",
    oracle=(
        "WITH seg_avg AS (SELECT AVG(o_totalprice) AS p FROM orders) "
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_totalprice > 2 * (SELECT p FROM seg_avg)"
    ),
    doc=(
        "SQL API surface: CTE + uncorrelated scalar subquery, executed via "
        "spark.sql over registered views. (Comparison is on filtered rows; "
        "the avg itself is a single partial-agg reduction — its last-ulp "
        "partition-order sensitivity cannot flip a 2x threshold on this "
        "data, and values in the output are raw column values.)"
    ),
)
def sql_cte_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        "WITH seg_avg AS (SELECT AVG(o_totalprice) AS p FROM orders) "
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_totalprice > 2 * (SELECT p FROM seg_avg)"
    )


@query(
    "sql_exists_correlated",
    oracle=(
        "SELECT o_orderkey, o_orderpriority FROM orders o "
        "WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey "
        "              AND l.l_quantity > 49)"
    ),
    doc="SQL API surface: correlated EXISTS subquery (planned as semi join).",
)
def sql_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT o_orderkey, o_orderpriority FROM orders o "
        "WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey "
        "              AND l.l_quantity > 49)"
    )


# --- More TPC-H shapes --------------------------------------------------------

@query(
    "q6_revenue_delta",
    oracle=(
        "SELECT "
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)"
        " AS promo_revenue, COUNT(*) AS n "
        "FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '2024-03-01' AND l_shipdate < TIMESTAMP '2024-09-01' "
        "AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24"
    ),
    doc=(
        "TPC-H Q6-style: pure scan + multi-predicate filter + global agg — "
        "the pushdown benchmark shape (no shuffle beyond the final reduce)."
    ),
)
def q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("2024-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("2024-09-01").cast("timestamp"))
            & F.col("l_discount").between(0.04, 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_discount").cast("decimal(18,2)")
            )
            .cast("double")
            .alias("promo_revenue"),
            F.count("*").alias("n"),
        )
    )


@query(
    "q4_order_priority",
    oracle=(
        "SELECT o_orderpriority, COUNT(*) AS order_count FROM orders o "
        "WHERE o_orderdate >= TIMESTAMP '2024-01-01' "
        "AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) "
        "GROUP BY o_orderpriority"
    ),
    doc="TPC-H Q4-style: EXISTS semi join + grouped count.",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2024-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# --- Window distribution family -------------------------------------------------

@query(
    "window_distribution",
    oracle=(
        "SELECT c_custkey, c_mktsegment, "
        "percent_rank() OVER w AS pct_rank, "
        "cume_dist() OVER w AS cume, "
        "CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn "
        "FROM customer WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)"
    ),
    doc="percent_rank / cume_dist distribution windows (exact rational doubles).",
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.row_number().over(w).cast("long").alias("rn"),
    )


@query(
    "first_last_value",
    oracle=(
        "SELECT event_id, user_id, "
        "first_value(event_type) OVER w AS first_type, "
        "last_value(event_type) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id "
        " ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type, "
        "nth_value(event_type, 2) OVER w AS second_type "
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
    ),
    doc="first_value / last_value / nth_value window family.",
)
def first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(wfull).alias("last_type"),
        F.nth_value("event_type", 2).over(w).alias("second_type"),
    )


# --- Argmax aggregates / percentiles ----------------------------------------------

@query(
    "argmax_aggregate",
    oracle=(
        "SELECT c_mktsegment, "
        "(max({'p': c_acctbal, 'k': c_custkey})).k AS richest_cust, "
        "(min({'p': c_acctbal, 'k': c_custkey})).k AS poorest_cust "
        "FROM customer GROUP BY c_mktsegment"
    ),
    doc=(
        "Argmax as an aggregate (max-of-struct pattern — deterministic "
        "tie-break via the key in the struct, unlike bare max_by)."
    ),
)
def argmax_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    s = F.struct(F.col("c_acctbal").alias("p"), F.col("c_custkey").alias("k"))
    return c.groupBy("c_mktsegment").agg(
        F.max(s)["k"].alias("richest_cust"),
        F.min(s)["k"].alias("poorest_cust"),
    )


@query(
    "exact_percentiles",
    oracle=(
        "SELECT l_returnflag, "
        "quantile_cont(l_quantity::DOUBLE, 0.5) AS median_qty, "
        "quantile_cont(l_quantity::DOUBLE, 0.9) AS p90_qty "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    doc=(
        "Exact interpolated percentiles (Spark percentile == DuckDB "
        "quantile_cont on integral doubles)."
    ),
)
def exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.expr("percentile(l_quantity, 0.9)").alias("p90_qty"),
    )


@query(
    "approx_count_distinct",
    oracle=(
        # The HLL estimate itself is engine-specific, so the checked output
        # is deterministic: the exact count plus a Spark-computed boolean
        # asserting the sketch landed within 3x the default rsd (0.05). The
        # oracle states the invariant (TRUE) next to the portable exact count.
        "SELECT o_orderpriority, "
        "COUNT(DISTINCT o_custkey) AS exact_custs, "
        "TRUE AS approx_within_tol "
        "FROM orders GROUP BY o_orderpriority"
    ),
    doc=(
        "Sketch aggregate: approx_count_distinct (HLL) validated against the "
        "exact count; the checked columns are the exact count and a "
        "within-tolerance boolean (|approx-exact|/exact <= 0.15 = 3*rsd), "
        "deterministic across engines."
    ),
)
def approx_count_distinct_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey").alias("approx_custs"),
        F.countDistinct("o_custkey").alias("exact_custs"),
    )
    return agg.select(
        "o_orderpriority",
        "exact_custs",
        (
            F.abs(F.col("approx_custs") - F.col("exact_custs"))
            / F.col("exact_custs")
            <= F.lit(0.15)
        ).alias("approx_within_tol"),
    )


# --- Lateral explode / array family ---------------------------------------------

@query(
    "explode_tokens",
    oracle=(
        "WITH base AS (SELECT doc_id, string_split(text, ' ') AS toks "
        "FROM documents WHERE doc_id < 50) "
        "SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, toks[i] AS tok "
        "FROM base, unnest(range(1, len(toks) + 1)) AS r(i)"
    ),
    doc=(
        "Lateral explode with position (posexplode) — row-generating "
        "operator over an array column."
    ),
)
def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    ).select("doc_id", F.col("pos").cast("int").alias("pos"), "tok")


@query(
    "array_functions",
    oracle=(
        "SELECT vec_id, "
        "CAST(len(embedding) AS INTEGER) AS dim, "
        "CAST(embedding[1] AS DOUBLE) AS first_component, "
        "CAST(embedding[3:4][1] AS DOUBLE) AS slice_head, "
        "CAST(list_contains(embedding, 0.0) AS BOOLEAN) AS has_zero, "
        "CAST(list_sort(embedding[1:4])[1] AS DOUBLE) AS min_of_head "
        "FROM embeddings WHERE vec_id < 100"
    ),
    doc="Array function family: size/element_at/slice/contains/sort.",
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    return emb.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_component"),
        F.element_at(F.slice("embedding", 3, 2), 1).cast("double").alias("slice_head"),
        F.array_contains("embedding", 0.0).alias("has_zero"),
        F.element_at(F.sort_array(F.slice("embedding", 1, 4)), 1)
        .cast("double")
        .alias("min_of_head"),
    )


@query(
    "union_all_counts",
    oracle=(
        "SELECT custkey, COUNT(*) AS n FROM ("
        "  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F' "
        "  UNION ALL "
        "  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000"
        ") GROUP BY custkey"
    ),
    doc="UNION ALL (bag semantics) with downstream aggregation.",
)
def union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.unionAll(b).groupBy("custkey").agg(F.count("*").alias("n"))


@query(
    "topn_per_key_salted",
    oracle=(
        "SELECT user_id, event_id, value, rank FROM ("
        "  SELECT user_id, event_id, value, "
        "  CAST(ROW_NUMBER() OVER (PARTITION BY user_id "
        "       ORDER BY value DESC, event_id) AS INTEGER) AS rank "
        "  FROM events"
        ") WHERE rank <= 3"
    ),
    doc=(
        "Top-3 events per user by value via the SALTED two-phase window "
        "(operators/skew.py salted_topn_per_key): phase 1 ranks within "
        "(key, salt) so no task ever sorts a whole hot key, phase 2 "
        "re-ranks the surviving salt*n rows. Exact — same result as the "
        "plain window the oracle states, without serializing hot keys."
    ),
)
def topn_per_key_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_topn_per_key

    ev = load_table(spark, sf_dir, "events")
    return salted_topn_per_key(
        ev, key="user_id", order_col="value", n=3, tiebreak="event_id"
    ).select("user_id", "event_id", "value", "rank")


@query(
    "running_sum_bucketed",
    oracle=(
        "SELECT event_id, user_id, ts, "
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value "
        "FROM events"
    ),
    doc=(
        "Per-user lifetime running sum via the BUCKETED distributed "
        "prefix-sum (operators/skew.py bucketed_running_sum): running "
        "sums within (user, event-time day-bucket), plus a per-bucket "
        "cumulative offset whose window runs over one row per bucket — "
        "no task ever holds a whole hot user's history, unlike the plain "
        "running-sum window the oracle states (which has no "
        "WindowGroupLimit rescue because every row is output). Exact: "
        "decimal sums are order-insensitive and bucket boundaries "
        "respect the order column."
    ),
)
def running_sum_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import bucketed_running_sum

    ev = load_table(spark, sf_dir, "events")
    return bucketed_running_sum(
        ev,
        key="user_id",
        order_col="ts",
        value_col="value",
        tiebreak="event_id",
        out_col="running_value",
    ).select("event_id", "user_id", "ts", "running_value")
