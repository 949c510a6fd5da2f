"""String function family, batch 2 + ordered collect aggregation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import query


@query(
    "string_funcs2",
    oracle=(
        "SELECT p_partkey, "
        "lower(p_name) AS lower_name, "
        "trim(concat('  ', p_brand, '  ')) AS trimmed, "
        "lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key, "
        "repeat('-', p_size % 5 + 1) AS bar, "
        "reverse(p_brand) AS rev_brand, "
        "CAST(strpos(p_type, 'O') AS INTEGER) AS o_pos, "
        "translate(p_type, 'AEIOU', 'aeiou') AS folded, "
        "split_part(p_type, ' ', 1) AS first_word, "
        "CAST(starts_with(p_name, 'Part') AS BOOLEAN) AS is_part, "
        "CAST(contains(p_type, 'ECON') AS BOOLEAN) AS is_econ "
        "FROM part"
    ),
    doc=(
        "String family 2: lower/trim/lpad/repeat/reverse/instr/translate/"
        "split_part/startswith/contains."
    ),
)
def string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lower_name"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("trimmed"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded_key"),
        F.repeat(F.lit("-"), (F.col("p_size") % 5 + 1)).alias("bar"),
        F.reverse("p_brand").alias("rev_brand"),
        F.instr("p_type", "O").cast("int").alias("o_pos"),
        F.translate("p_type", "AEIOU", "aeiou").alias("folded"),
        F.split(F.col("p_type"), " ").getItem(0).alias("first_word"),
        F.col("p_name").startswith("Part").alias("is_part"),
        F.col("p_type").contains("ECON").alias("is_econ"),
    )


@query(
    "collect_sorted_agg",
    oracle=(
        "SELECT user_id, "
        "string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types_seen, "
        "COUNT(DISTINCT event_type) AS n_types "
        "FROM events GROUP BY user_id"
    ),
    doc=(
        "Ordered collect aggregation: per-key distinct values as a "
        "deterministic sorted CSV (collect_set -> sort_array -> "
        "concat_ws) — the portable form of array_agg."
    ),
)
def collect_sorted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("event_type"))).alias(
            "types_seen"
        ),
        F.countDistinct("event_type").alias("n_types"),
    )
