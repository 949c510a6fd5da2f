"""TPC-H batch 5 (Q11, Q15, Q20, Q21 shapes): with these, every
distinctive query topology of the TPC-H suite is represented — HAVING
against a scalar-subquery threshold, argmax-over-aggregate via CTE,
nested IN/EXISTS chains, and multi-correlated EXISTS/NOT EXISTS."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.catalog import register_views
from .registry import query


def _sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(sql)


_Q11 = (
    "SELECT l_suppkey, "
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)"
    " AS stock_value "
    "FROM lineitem GROUP BY l_suppkey "
    "HAVING SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) > ("
    "  SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) * 0.09 "
    "  FROM lineitem"
    ")"
)


@query(
    "q11_important_stock",
    oracle=_Q11,
    doc=(
        "TPC-H Q11 shape: grouped HAVING against a scalar-subquery "
        "fraction of the global aggregate (exact decimal on both sides of "
        "the comparison — no float threshold risk)."
    ),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q11)


_Q15 = (
    "WITH revenue AS ("
    "  SELECT l_suppkey AS supplier_no, "
    "  SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev "
    "  FROM lineitem GROUP BY l_suppkey"
    ") "
    "SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_revenue "
    "FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no "
    "WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)"
)


@query(
    "q15_top_supplier",
    oracle=_Q15,
    doc=(
        "TPC-H Q15 shape: argmax over an aggregate via CTE reuse — the "
        "revenue view is aggregated once and compared against its own "
        "maximum (decimal-exact equality)."
    ),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q15)


_Q20 = (
    "SELECT s.s_suppkey, s.s_name FROM supplier s "
    "WHERE s.s_suppkey IN ("
    "  SELECT l_suppkey FROM lineitem "
    "  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type LIKE 'PROMO%') "
    "  GROUP BY l_suppkey HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 400"
    ")"
)


@query(
    "q20_promo_suppliers",
    oracle=_Q20,
    doc=(
        "TPC-H Q20 shape: nested IN chains (suppliers shipping promo "
        "parts above a quantity threshold) — two semi-join levels with an "
        "aggregate HAVING inside."
    ),
)
def q20_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q20)


_Q21 = (
    "SELECT s.s_name, COUNT(*) AS numwait "
    "FROM supplier s "
    "JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey "
    "JOIN orders o ON o.o_orderkey = l1.l_orderkey "
    "WHERE o.o_orderstatus = 'F' "
    "AND EXISTS ("
    "  SELECT 1 FROM lineitem l2 "
    "  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey"
    ") "
    "AND NOT EXISTS ("
    "  SELECT 1 FROM lineitem l3 "
    "  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey "
    "  AND l3.l_quantity > 45"
    ") "
    "GROUP BY s.s_name"
)


@query(
    "q21_waiting_suppliers",
    oracle=_Q21,
    doc=(
        "TPC-H Q21 shape: correlated EXISTS + NOT EXISTS against the same "
        "fact under different predicates (the hardest decorrelation case "
        "in the suite), then grouped count."
    ),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q21)
