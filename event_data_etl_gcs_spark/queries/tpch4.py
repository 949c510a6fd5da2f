"""TPC-H batch 4: nation-pair volume (Q7), market share (Q8), product
profit (Q9) — the remaining canonical join-topology shapes."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import exact_sum_disc_price, sql_exact_sum_disc_price
from ..sources.catalog import load_table
from .registry import query


@query(
    "q7_nation_pair_volume",
    oracle=(
        "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
        "CAST(year(l.l_shipdate) AS INTEGER) AS l_year, "
        f"{sql_exact_sum_disc_price('l.l_extendedprice', 'l.l_discount')} AS volume "
        "FROM supplier s "
        "JOIN lineitem l ON s.s_suppkey = l.l_suppkey "
        "JOIN orders o ON o.o_orderkey = l.l_orderkey "
        "JOIN customer c ON c.c_custkey = o.o_custkey "
        "JOIN nation n1 ON s.s_nationkey = n1.n_nationkey "
        "JOIN nation n2 ON c.c_nationkey = n2.n_nationkey "
        "WHERE n1.n_name <> n2.n_name "
        "GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)"
    ),
    doc=(
        "TPC-H Q7 shape: shipping volume between distinct nation pairs "
        "per year — the double-dimension-role join (nation joined twice "
        "under different roles)."
    ),
)
def q7_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(o, o["o_orderkey"] == li["l_orderkey"])
        .join(c, c["c_custkey"] == o["o_custkey"])
        .join(F.broadcast(n1), s["s_nationkey"] == F.col("n1_key"))
        .join(F.broadcast(n2), c["c_nationkey"] == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(exact_sum_disc_price("l_extendedprice", "l_discount").alias("volume"))
    )


@query(
    "q8_market_share",
    oracle=(
        "WITH volumes AS ("
        "  SELECT CAST(month(o.o_orderdate) AS INTEGER) AS o_month, "
        "  CAST(l.l_extendedprice AS DECIMAL(18,2)) * "
        "  (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))) AS vol, "
        "  n.n_name AS nation "
        "  FROM lineitem l "
        "  JOIN orders o ON o.o_orderkey = l.l_orderkey "
        "  JOIN supplier s ON s.s_suppkey = l.l_suppkey "
        "  JOIN nation n ON n.n_nationkey = s.s_nationkey"
        ") SELECT o_month, "
        "CAST(SUM(CASE WHEN nation = 'NATION_3' THEN vol ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)"
        " / CAST(SUM(vol) AS DOUBLE) AS mkt_share "
        "FROM volumes GROUP BY o_month"
    ),
    doc=(
        "TPC-H Q8 shape: one nation's share of total volume per period — "
        "conditional decimal sums ratioed in double."
    ),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    vol = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    volumes = (
        li.join(o, o["o_orderkey"] == li["l_orderkey"])
        .join(s, s["s_suppkey"] == li["l_suppkey"])
        .join(F.broadcast(n), n["n_nationkey"] == s["s_nationkey"])
        .select(
            F.month("o_orderdate").cast("int").alias("o_month"),
            vol.alias("vol"),
            F.col("n_name").alias("nation"),
        )
    )
    return volumes.groupBy("o_month").agg(
        (
            F.sum(
                F.when(F.col("nation") == "NATION_3", F.col("vol")).otherwise(
                    F.lit(0).cast("decimal(18,2)")
                )
            ).cast("double")
            / F.sum("vol").cast("double")
        ).alias("mkt_share")
    )


@query(
    "q9_product_profit",
    oracle=(
        "SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INTEGER) AS o_year, "
        "CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * "
        "(CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))) - "
        "CAST(p.p_retailprice AS DECIMAL(18,2)) * CAST(l.l_quantity AS DECIMAL(18,2))"
        ") AS DOUBLE) AS profit "
        "FROM lineitem l "
        "JOIN part p ON p.p_partkey = l.l_partkey "
        "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
        "JOIN orders o ON o.o_orderkey = l.l_orderkey "
        "JOIN nation n ON n.n_nationkey = s.s_nationkey "
        "WHERE contains(p.p_name, '1') "
        "GROUP BY n.n_name, year(o.o_orderdate)"
    ),
    doc=(
        "TPC-H Q9 shape: profit = revenue minus cost across a 5-table "
        "join, filtered by part-name containment, grouped by nation/year "
        "(exact decimal arithmetic end to end)."
    ),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("1"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    one = F.lit(1).cast("decimal(18,2)")
    profit_term = F.col("l_extendedprice").cast("decimal(18,2)") * (
        one - F.col("l_discount").cast("decimal(18,2)")
    ) - F.col("p_retailprice").cast("decimal(18,2)") * F.col("l_quantity").cast(
        "decimal(18,2)"
    )
    return (
        li.join(p, p["p_partkey"] == li["l_partkey"])
        .join(s, s["s_suppkey"] == li["l_suppkey"])
        .join(o, o["o_orderkey"] == li["l_orderkey"])
        .join(F.broadcast(n), n["n_nationkey"] == s["s_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(profit_term).cast("double").alias("profit"))
    )
