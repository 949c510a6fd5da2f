"""TPC-H batch 3: the remaining distinctive query shapes — count
distribution (Q13), NOT-IN + distinct count (Q16), correlated AVG
subquery (Q17), anti-correlated aggregate (Q22)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table, register_views
from .registry import query


@query(
    "q13_order_count_distribution",
    oracle=(
        "WITH per_cust AS ("
        "  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count "
        "  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey "
        "  GROUP BY c.c_custkey"
        ") SELECT c_count, COUNT(*) AS custdist FROM per_cust GROUP BY c_count"
    ),
    doc=(
        "TPC-H Q13 shape: histogram of orders-per-customer — left join "
        "preserving zero-order customers, then a second aggregation over "
        "the first's result."
    ),
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy(c["c_custkey"])
        .agg(F.count(o["o_orderkey"]).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q16_supplier_part_counts",
    oracle=(
        "SELECT p.p_brand, p.p_type, "
        "COUNT(DISTINCT l.l_suppkey) AS supplier_cnt "
        "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
        "WHERE p.p_brand <> 'Brand#1' "
        "AND l.l_suppkey NOT IN ("
        "  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0"
        ") "
        "GROUP BY p.p_brand, p.p_type"
    ),
    doc="TPC-H Q16 shape: NOT IN subquery + grouped COUNT DISTINCT.",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT p.p_brand, p.p_type, "
        "COUNT(DISTINCT l.l_suppkey) AS supplier_cnt "
        "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
        "WHERE p.p_brand <> 'Brand#1' "
        "AND l.l_suppkey NOT IN ("
        "  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0"
        ") "
        "GROUP BY p.p_brand, p.p_type"
    )


@query(
    "q17_small_quantity_revenue",
    oracle=(
        "SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 "
        "AS avg_yearly, COUNT(*) AS n "
        "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
        "WHERE p.p_brand = 'Brand#3' "
        "AND l.l_quantity < ("
        "  SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2 "
        "  WHERE l2.l_partkey = p.p_partkey"
        ")"
    ),
    doc=(
        "TPC-H Q17 shape: correlated AVG subquery (below-half-average "
        "quantity) — planned as a join against the per-key aggregate. "
        "The 0.5*avg threshold is a half-integer on integral quantities, "
        "so the comparison is float-safe."
    ),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 "
        "AS avg_yearly, COUNT(*) AS n "
        "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
        "WHERE p.p_brand = 'Brand#3' "
        "AND l.l_quantity < ("
        "  SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2 "
        "  WHERE l2.l_partkey = p.p_partkey"
        ")"
    )


@query(
    "q22_inactive_customers",
    oracle=(
        "SELECT substring(c_name, 10, 1) AS name_digit, "
        "COUNT(*) AS numcust, "
        "CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal "
        "FROM customer c "
        "WHERE c_acctbal > ("
        "  SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0"
        ") "
        "AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) "
        "GROUP BY substring(c_name, 10, 1)"
    ),
    doc=(
        "TPC-H Q22 shape: scalar AVG threshold + NOT EXISTS anti join + "
        "grouped aggregate. (Threshold uses AVG(double): no customer "
        "balance sits within float noise of it at tested SFs.)"
    ),
)
def q22_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT substring(c_name, 10, 1) AS name_digit, "
        "COUNT(*) AS numcust, "
        "CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal "
        "FROM customer c "
        "WHERE c_acctbal > ("
        "  SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0"
        ") "
        "AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) "
        "GROUP BY substring(c_name, 10, 1)"
    )
