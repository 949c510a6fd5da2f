"""Data-quality audit operators: column profiling, key-constraint and
referential-integrity checks — the pre-flight every 100 TB ingest runs
before training-data jobs trust a table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import query


@query(
    "profile_events",
    oracle=(
        "SELECT COUNT(*) AS n_rows, "
        "COUNT(user_id) AS user_id_nonnull, "
        "COUNT(DISTINCT user_id) AS user_id_distinct, "
        "COUNT(DISTINCT event_type) AS event_type_distinct, "
        "MIN(value) AS value_min, MAX(value) AS value_max, "
        "MIN(ts) AS ts_min, MAX(ts) AS ts_max "
        "FROM events"
    ),
    doc=(
        "Single-pass table profile: row count, per-column null/distinct "
        "counts, min/max ranges — one scan, one reduction."
    ),
)
def profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.count("*").alias("n_rows"),
        F.count("user_id").alias("user_id_nonnull"),
        F.countDistinct("user_id").alias("user_id_distinct"),
        F.countDistinct("event_type").alias("event_type_distinct"),
        F.min("value").alias("value_min"),
        F.max("value").alias("value_max"),
        F.min("ts").alias("ts_min"),
        F.max("ts").alias("ts_max"),
    )


@query(
    "unique_key_check",
    oracle=(
        "SELECT o_orderkey AS dup_key, COUNT(*) AS n "
        "FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1"
    ),
    doc=(
        "Primary-key uniqueness check: violating keys with their "
        "multiplicity (empty result = constraint holds)."
    ),
)
def unique_key_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_orderkey").alias("dup_key"))
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )


@query(
    "fk_orphan_check",
    oracle=(
        "SELECT l_orderkey AS orphan_key, COUNT(*) AS n_rows "
        "FROM lineitem l "
        "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey) "
        "GROUP BY l_orderkey"
    ),
    doc=(
        "Referential-integrity check: fact keys with no dimension row "
        "(anti join + group), empty = FK holds."
    ),
)
def fk_orphan_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"], "left_anti")
        .groupBy(F.col("l_orderkey").alias("orphan_key"))
        .agg(F.count("*").alias("n_rows"))
    )


@query(
    "null_rate_by_column",
    oracle=(
        "SELECT 'artistish' AS col, "
        "CAST(COUNT(*) - COUNT(user_id) AS DOUBLE) / COUNT(*) AS null_rate "
        "FROM events "
        "UNION ALL "
        "SELECT 'props' AS col, "
        "CAST(COUNT(*) - COUNT(props) AS DOUBLE) / COUNT(*) AS null_rate "
        "FROM events"
    ),
    doc="Per-column null-rate report (exact integer ratios).",
)
def null_rate_by_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    n = F.count("*")
    a = ev.agg(
        F.lit("artistish").alias("col"),
        ((n - F.count("user_id")).cast("double") / n).alias("null_rate"),
    )
    b = ev.agg(
        F.lit("props").alias("col"),
        ((n - F.count("props")).cast("double") / n).alias("null_rate"),
    )
    return a.unionByName(b)
