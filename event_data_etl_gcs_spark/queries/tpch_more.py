"""More TPC-H-shaped analytics over the testdata star schema — each
pinned to an exact DuckDB oracle. Together with q1/q3/q4/q5/q6 these
cover the canonical OLAP shapes: correlated subqueries, grouped HAVING,
disjunctive predicates, CASE aggregation, percentage-of-total."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import sql_exact_sum_disc_price
from ..sources.catalog import load_table, register_views
from .registry import query


@query(
    "q2_min_cost_supplier",
    oracle=(
        "SELECT s.s_suppkey, s.s_name, n.n_name AS nation, s.s_acctbal "
        "FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey "
        "WHERE s.s_acctbal = (SELECT MIN(s2.s_acctbal) FROM supplier s2 "
        "                     WHERE s2.s_nationkey = s.s_nationkey)"
    ),
    doc=(
        "TPC-H Q2 shape: correlated MIN subquery (min-cost supplier per "
        "nation) — planned as a self-join against the grouped minimum."
    ),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT s.s_suppkey, s.s_name, n.n_name AS nation, s.s_acctbal "
        "FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey "
        "WHERE s.s_acctbal = (SELECT MIN(s2.s_acctbal) FROM supplier s2 "
        "                     WHERE s2.s_nationkey = s.s_nationkey)"
    )


@query(
    "q10_returned_items",
    oracle=(
        "SELECT c.c_custkey, c.c_name, "
        f"{sql_exact_sum_disc_price('l.l_extendedprice', 'l.l_discount')} AS revenue "
        "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        "WHERE l.l_returnflag = 'R' "
        "GROUP BY c.c_custkey, c.c_name "
        "ORDER BY revenue DESC, c_custkey LIMIT 20"
    ),
    doc="TPC-H Q10 shape: returned-item revenue per customer, top 20.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    from ..functions.numeric import exact_sum_disc_price

    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_custkey", "c_name")
        .agg(exact_sum_disc_price("l_extendedprice", "l_discount").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q12_shipmode_priority",
    oracle=(
        "SELECT o_orderpriority, "
        "CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS finished_count, "
        "CAST(SUM(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS BIGINT) AS other_count "
        "FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey "
        "WHERE l.l_quantity >= 30 "
        "GROUP BY o_orderpriority"
    ),
    doc="TPC-H Q12 shape: CASE-based conditional counting after a join.",
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 30)
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias(
                "finished_count"
            ),
            F.sum(F.when(F.col("o_orderstatus") != "F", 1).otherwise(0)).alias(
                "other_count"
            ),
        )
    )


@query(
    "q14_promo_share",
    oracle=(
        "SELECT "
        "CAST(100.0 AS DOUBLE) * "
        "CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%' THEN "
        "  CAST(l.l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))) "
        "ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) / "
        f"{sql_exact_sum_disc_price('l.l_extendedprice', 'l.l_discount')} AS promo_pct "
        "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey"
    ),
    doc=(
        "TPC-H Q14 shape: percentage-of-total via conditional decimal sums "
        "(both numerator and denominator order-insensitive)."
    ),
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    joined = li.join(p, li["l_partkey"] == p["p_partkey"])
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(
                F.when(F.col("p_type").like("PROMO%"), disc).otherwise(
                    F.lit(0).cast("decimal(18,2)")
                )
            ).cast("double")
            / F.sum(disc).cast("double")
        ).alias("promo_pct")
    )


@query(
    "q18_large_orders",
    oracle=(
        "SELECT o.o_orderkey, o.o_totalprice, "
        "CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty "
        "FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey "
        "GROUP BY o.o_orderkey, o.o_totalprice "
        "HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) > 150 "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"
    ),
    doc="TPC-H Q18 shape: grouped HAVING over a join, deterministic top-k.",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.sum(F.col("l_quantity").cast("decimal(18,2)"))
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_totalprice")
        .agg(qty.cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@query(
    "q19_disjunctive_predicates",
    oracle=(
        "SELECT COUNT(*) AS n, "
        f"{sql_exact_sum_disc_price('l.l_extendedprice', 'l.l_discount')} AS revenue "
        "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
        "WHERE (p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1 AND 11 AND p.p_size BETWEEN 1 AND 5) "
        "   OR (p.p_brand = 'Brand#2' AND l.l_quantity BETWEEN 10 AND 20 AND p.p_size BETWEEN 1 AND 10) "
        "   OR (p.p_brand = 'Brand#3' AND l.l_quantity BETWEEN 20 AND 30 AND p.p_size BETWEEN 1 AND 15)"
    ),
    doc=(
        "TPC-H Q19 shape: disjunction of conjunctive range predicates "
        "across both join sides (the pushdown/CNF stress test)."
    ),
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    from ..functions.numeric import exact_sum_disc_price

    joined = li.join(p, li["l_partkey"] == p["p_partkey"])
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("l_quantity").between(1, 11) & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#2") & F.col("l_quantity").between(10, 20) & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#3") & F.col("l_quantity").between(20, 30) & F.col("p_size").between(1, 15))
    )
    return joined.filter(cond).agg(
        F.count("*").alias("n"),
        exact_sum_disc_price("l_extendedprice", "l_discount").alias("revenue"),
    )


@query(
    "lateral_top_orders_per_customer",
    oracle=(
        "SELECT c.c_custkey, t.o_orderkey, t.o_totalprice "
        "FROM customer c, LATERAL ("
        "SELECT o_orderkey, o_totalprice FROM orders o "
        "WHERE o.o_custkey = c.c_custkey "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t"
    ),
    doc=(
        "Correlated LATERAL subquery (identical SQL on both engines): "
        "top-2 orders per customer. Catalyst decorrelates this into the "
        "same ranked-window join a hand-written top-n-per-key produces "
        "— the modern SQL surface riding the existing physical "
        "strategy. Deterministic via the total (price desc, orderkey) "
        "order; o_totalprice compares EXACTLY because equal doubles are "
        "equal, and ties break on the integer key."
    ),
)
def lateral_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_lv")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_lv")
    return spark.sql(
        "SELECT c.c_custkey, t.o_orderkey, t.o_totalprice "
        "FROM customer_lv c, LATERAL ("
        "SELECT o_orderkey, o_totalprice FROM orders_lv o "
        "WHERE o.o_custkey = c.c_custkey "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t"
    )
