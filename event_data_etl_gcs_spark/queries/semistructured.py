"""Semi-structured data surface: JSON parse/serialize, struct build and
extract, embedding vector norms."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import duck_norm, norm_sql
from ..sources.catalog import load_table
from .registry import query


@query(
    "from_json_struct",
    oracle=(
        "SELECT event_id, CAST(json_extract(props, '$.k') AS INTEGER) AS k, "
        "CAST(json_extract(props, '$.k') AS INTEGER) * 2 AS k2 "
        "FROM events"
    ),
    doc=(
        "from_json into a typed struct then field math — the schema-on-read "
        "path for embedded JSON payloads."
    ),
)
def from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn("p", F.from_json("props", "k INT"))
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        (F.col("p.k") * 2).alias("k2"),
    )


@query(
    "to_json_roundtrip",
    oracle=(
        "SELECT event_id, "
        "concat('{\"type\":\"', event_type, '\",\"uid\":', CAST(user_id AS VARCHAR), '}')"
        " AS payload "
        "FROM events"
    ),
    doc=(
        "to_json serialization of a built struct (compact key order "
        "pinned by construction)."
    ),
)
def to_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.to_json(
            F.struct(
                F.col("event_type").alias("type"), F.col("user_id").alias("uid")
            )
        ).alias("payload"),
    )


@query(
    "struct_build_extract",
    oracle=(
        "SELECT o_orderkey, "
        "{'status': o_orderstatus, 'price': o_totalprice}.status AS status_out, "
        "round({'status': o_orderstatus, 'price': o_totalprice}.price, 0) AS price_rounded "
        "FROM orders WHERE o_orderkey < 100"
    ),
    doc="named_struct build + field extraction.",
)
def struct_build_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    s = F.struct(
        F.col("o_orderstatus").alias("status"), F.col("o_totalprice").alias("price")
    )
    return o.select(
        "o_orderkey",
        s["status"].alias("status_out"),
        F.round(s["price"], 0).alias("price_rounded"),
    )


@query(
    "embedding_norms",
    oracle=(
        f"SELECT vec_id, {duck_norm('embedding')} AS l2_norm, "
        f"CAST({duck_norm('embedding')} BETWEEN 0.9 AND 1.1 AS BOOLEAN) AS near_unit "
        "FROM embeddings"
    ),
    doc=(
        "Vector norms as a map-only expression (sequential double "
        "summation — deterministic and oracle-exact); the normalize step "
        "of any embedding pipeline."
    ),
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    nrm = F.expr(norm_sql("embedding"))
    return emb.select(
        "vec_id",
        nrm.alias("l2_norm"),
        nrm.between(0.9, 1.1).alias("near_unit"),
    )


@query(
    "map_functions",
    oracle=(
        "WITH c AS ("
        "  SELECT user_id, event_type, COUNT(*) * 2 AS v "
        "  FROM events GROUP BY user_id, event_type"
        ") "
        "SELECT user_id, "
        "array_to_string(COALESCE(list(event_type ORDER BY event_type) "
        "  FILTER (WHERE v >= 4), []), ',') AS kept_keys, "
        "array_to_string(COALESCE(list(v ORDER BY event_type) "
        "  FILTER (WHERE v >= 4), []), ',') AS kept_values, "
        "COUNT(*) FILTER (WHERE v >= 4) AS n_kept "
        "FROM c GROUP BY user_id"
    ),
    doc=(
        "Map-function family: map_from_entries -> transform_values -> "
        "map_filter over per-user event-type counts; the checked output "
        "is the key-sorted (keys, values) streams comma-joined into "
        "scalars: maps have no canonical order, struct-array cells "
        "stringify differently per engine, and raw array cells crash "
        "pandas-based result canonicalizers — the joined string is the "
        "hash-safe form that still value-checks every entry."
    ),
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    m = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "n"))
        ).alias("m")
    )
    out = m.select(
        "user_id",
        F.map_filter(
            F.transform_values("m", lambda k, v: v * 2), lambda k, v: v >= 4
        ).alias("mf"),
    )
    entries = F.sort_array(F.map_entries("mf"))
    return out.select(
        "user_id",
        F.array_join(
            F.transform(entries, lambda e: e["key"]), ","
        ).alias("kept_keys"),
        F.array_join(
            F.transform(entries, lambda e: e["value"].cast("string")), ","
        ).alias("kept_values"),
        F.size("mf").cast("long").alias("n_kept"),
    )


@query(
    "variant_extract",
    oracle=(
        "WITH v AS (SELECT event_type, "
        "CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events) "
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
        "CAST(min(k) AS BIGINT) AS min_k, CAST(max(k) AS BIGINT) AS max_k, "
        "CAST(sum(k) AS BIGINT) AS sum_k FROM v GROUP BY event_type"
    ),
    doc=(
        "Semi-structured VARIANT path (Spark 4): parse_json once into a "
        "binary variant, variant_get typed extraction — the "
        "shred-on-read pattern that replaces per-query JSON string "
        "parsing; aggregates are exact integers. DuckDB oracle uses its "
        "native JSON extraction over the same column."
    ),
)
def variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("k"),
    )
    return v.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.min("k").cast("long").alias("min_k"),
        F.max("k").cast("long").alias("max_k"),
        F.sum("k").cast("long").alias("sum_k"),
    )
