"""Null-handling and binary/bit function families."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import query


@query(
    "null_handling",
    oracle=(
        "SELECT e.event_id, "
        "CAST(e.user_id IS NOT DISTINCT FROM p.user_id AS BOOLEAN) AS same_user_nullsafe, "
        "TRY_CAST(e.props AS INTEGER) AS props_as_int, "
        "CAST(isnan(e.value / nullif(e.value - e.value, 0)) IS NOT NULL "
        "     AND isnan(e.value / nullif(e.value - e.value, 0)) AS BOOLEAN) AS is_nan_probe, "
        "COALESCE(NULLIF(e.event_type, 'error'), 'n/a') AS type_or_na "
        "FROM events e LEFT JOIN ("
        "  SELECT event_id + 1 AS event_id, user_id FROM events"
        ") p USING (event_id)"
    ),
    doc=(
        "Null-handling family: null-safe equality (<=> / IS NOT DISTINCT "
        "FROM), try_cast, isnan, coalesce/nullif over a self-join with "
        "genuine nulls."
    ),
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    shifted = ev.select(
        (F.col("event_id") + 1).alias("event_id"), F.col("user_id").alias("p_user_id")
    )
    joined = ev.join(shifted, "event_id", "left")
    nan_probe = F.isnan(
        F.col("value") / F.nullif(F.col("value") - F.col("value"), F.lit(0))
    )
    return joined.select(
        "event_id",
        F.col("user_id").eqNullSafe(F.col("p_user_id")).alias("same_user_nullsafe"),
        F.expr("try_cast(props AS INT)").alias("props_as_int"),
        (nan_probe.isNotNull() & nan_probe).alias("is_nan_probe"),
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("n/a")).alias(
            "type_or_na"
        ),
    )


@query(
    "binary_bit_functions",
    oracle=(
        "SELECT c_custkey, "
        "upper(to_hex(c_custkey)) AS key_hex, "
        "to_base64(encode(c_name)) AS name_b64, "
        "CAST(c_custkey & 255 AS BIGINT) AS low_byte, "
        "CAST(c_custkey | 4096 AS BIGINT) AS with_flag, "
        "CAST(xor(c_custkey, 21) AS BIGINT) AS xored, "
        "CAST(c_custkey << 2 AS BIGINT) AS shifted "
        "FROM customer"
    ),
    doc="Binary/bit family: hex, base64, AND/OR/XOR, shifts.",
)
def binary_bit_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper(F.hex("c_custkey")).alias("key_hex"),
        F.base64(F.encode("c_name", "utf-8")).alias("name_b64"),
        F.col("c_custkey").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("c_custkey").bitwiseOR(F.lit(4096)).alias("with_flag"),
        F.col("c_custkey").bitwiseXOR(F.lit(21)).alias("xored"),
        F.expr("shiftleft(c_custkey, 2)").alias("shifted"),
    )
