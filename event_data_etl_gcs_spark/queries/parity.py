"""Reference-parity operators (SURVEY.md §2) expressed over the driver
testdata tables (TESTDATA.md / FIXTURES.md §4 mapping: ``events`` plays
the role of the reference's log_data; lineitem/orders/customer/etc. back
the join and aggregation surface).

Each query cites the reference site it mirrors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.relational import argmax_latest
from ..sources.catalog import load_table
from .registry import query


# --- S/P: scans, projections, filters -----------------------------------

@query(
    "scan_project",
    oracle="SELECT l_orderkey, l_quantity, l_extendedprice FROM lineitem",
    doc="S1/S4+P1: parquet scan with column pruning (ref sparkify_etl.py:47).",
)
def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )


@query(
    "project_rename",
    oracle=(
        "SELECT c_custkey AS customer_key, c_name AS name, "
        "c_mktsegment AS segment FROM customer"
    ),
    doc="P2: projection with renames (ref sparkify_etl.py:58-65).",
)
def project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("customer_key"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
    )


@query(
    "filter_eq",
    oracle=(
        "SELECT event_id, user_id, value FROM events "
        "WHERE event_type = 'purchase'"
    ),
    doc="P3: pushed-down equality filter (ref page='NextSong', sparkify_etl.py:120).",
)
def filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "value"
    )


@query(
    "filter_compound",
    oracle=(
        "SELECT event_id, user_id, event_type, value FROM events "
        "WHERE value > 100.0 AND user_id IS NOT NULL AND event_type <> 'error'"
    ),
    doc="P4: conjunction + null-test + inequality (ref sparkify_etl.py:126-130).",
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        (F.col("value") > 100.0)
        & F.col("user_id").isNotNull()
        & (F.col("event_type") != "error")
    ).select("event_id", "user_id", "event_type", "value")


@query(
    "derived_column",
    oracle=(
        "SELECT l_orderkey, l_linenumber, "
        "l_extendedprice * (1 - l_discount) AS revenue FROM lineitem"
    ),
    doc="P5: withColumn derived expression (ref sparkify_etl.py:125,150).",
)
def derived_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


# --- A: distinct, windows, argmax ----------------------------------------

@query(
    "distinct_rows",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    doc="A1: full-row distinct (ref artists/time dedup, sparkify_etl.py:58-67,153-163).",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select("user_id", "event_type").distinct()


@query(
    "window_max",
    oracle=(
        "SELECT event_id, user_id, ts, "
        "MAX(ts) OVER (PARTITION BY user_id) AS max_ts_user FROM events"
    ),
    doc="A2: unbounded window max per key (ref sparkify_etl.py:125).",
)
def window_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    return ev.select(
        "event_id", "user_id", "ts", F.max("ts").over(w).alias("max_ts_user")
    )


@query(
    "argmax_latest",
    oracle=(
        "SELECT user_id, ts AS last_seen, event_type AS last_event_type, "
        "value AS last_value FROM ("
        "  SELECT *, MAX(ts) OVER (PARTITION BY user_id) AS max_ts FROM events"
        ") WHERE ts = max_ts"
    ),
    doc=(
        "A3: latest-record-wins with reference tie semantics (all max-ts "
        "rows kept; ref sparkify_etl.py:125-130)."
    ),
)
def argmax_latest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    latest = argmax_latest(ev, ["user_id"], "ts")
    return latest.select(
        "user_id",
        F.col("ts").alias("last_seen"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


@query(
    "users_latest",
    oracle=(
        "SELECT user_id, ts AS last_seen, event_type AS last_event_type, "
        "value AS last_value FROM ("
        "  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id "
        "         ORDER BY ts DESC, event_id DESC) AS rn"
        "  FROM events WHERE user_id IS NOT NULL"
        ") WHERE rn = 1"
    ),
    doc=(
        "Users dimension analog (SCD-1 'current state of every user', ref "
        "sparkify_etl.py:123-138) — deterministic row_number variant "
        "(SURVEY.md §4.3-6)."
    ),
)
def users_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("ts").alias("last_seen"),
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
        )
    )


# --- F/U: time dimension ---------------------------------------------------

@query(
    "time_dimension",
    oracle=(
        "SELECT DISTINCT date_trunc('second', ts) AS start_time, "
        "CAST(hour(ts) AS INTEGER) AS hour, "
        "CAST(dayofmonth(ts) AS INTEGER) AS day, "
        "CAST(weekofyear(ts) AS INTEGER) AS week, "
        "CAST(month(ts) AS INTEGER) AS month, "
        "CAST(year(ts) AS INTEGER) AS year, "
        "CAST(dayofweek(ts) + 1 AS INTEGER) AS weekday "
        "FROM events"
    ),
    doc=(
        "F1+U1+A1: time dimension — second-truncated timestamps with "
        "calendar attributes, distinct (ref sparkify_etl.py:146-163). "
        "Native timestamp functions replace the reference's Python UDF "
        "(SURVEY.md §4.3-1). DuckDB dayofweek is 0=Sunday; Spark is "
        "1=Sunday, hence the +1 in the oracle."
    ),
)
def time_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    from ..functions.time import time_dimension_columns

    cols = time_dimension_columns(F.col("start_time"))
    return (
        ev.select(F.date_trunc("second", F.col("ts")).alias("start_time"))
        .select("start_time", *[c.alias(n) for n, c in cols.items()])
        .distinct()
    )


@query(
    "surrogate_key_stable",
    oracle=(
        "SELECT ROW_NUMBER() OVER (ORDER BY event_id) AS row_id, "
        "event_id, user_id FROM events WHERE event_type = 'purchase'"
    ),
    doc=(
        "F3: deterministic surrogate key — the stable alternative to the "
        "reference's monotonically_increasing_id (sparkify_etl.py:206, "
        "SURVEY.md §4.3-5). Distributed form: range-partitioned sort + "
        "per-partition offsets (functions/ids.py), no global "
        "single-partition window."
    ),
)
def surrogate_key_stable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ids import stable_row_id

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return stable_row_id(
        ev.select("event_id", "user_id"), order_by=["event_id"]
    ).select("row_id", "event_id", "user_id")


# --- J: joins ---------------------------------------------------------------

@query(
    "join_full_outer",
    oracle=(
        "SELECT nationkey, s_suppkey, s_name, n_name FROM "
        "(SELECT s_nationkey AS nationkey, s_suppkey, s_name FROM supplier) s "
        "FULL JOIN "
        "(SELECT n_nationkey AS nationkey, n_name FROM nation) n "
        "USING (nationkey)"
    ),
    doc=(
        "J1: full outer USING-column equi-join with coalesced key (ref "
        "songs ⟗ artists on artist_id, sparkify_etl.py:177-181). Supplier "
        "covers few nations, so the outer side is exercised."
    ),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), "s_suppkey", "s_name"
    )
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nationkey"), "n_name"
    )
    return s.join(n, "nationkey", "full")


@query(
    "join_multikey_left",
    oracle=(
        "SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, d.pk AS matched_part "
        "FROM lineitem l LEFT JOIN "
        "(SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem "
        " WHERE l_quantity >= 45) d "
        "ON l.l_partkey = d.pk AND l.l_suppkey = d.sk"
    ),
    doc=(
        "J2: left outer multi-key equi-join across differently-named "
        "columns; unmatched rows keep nulls (ref log⟕songs 3-key join, "
        "sparkify_etl.py:182-190)."
    ),
)
def join_multikey_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    dim = (
        li.filter(F.col("l_quantity") >= 45)
        .select(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    return li.join(
        dim,
        (li["l_partkey"] == dim["pk"]) & (li["l_suppkey"] == dim["sk"]),
        "left",
    ).select("l_orderkey", "l_linenumber", "l_quantity", F.col("pk").alias("matched_part"))


@query(
    "join_left_using",
    oracle=(
        "SELECT custkey, o_orderkey, o_totalprice, c_name, c_mktsegment FROM "
        "(SELECT o_custkey AS custkey, o_orderkey, o_totalprice FROM orders) o "
        "LEFT JOIN "
        "(SELECT c_custkey AS custkey, c_name, c_mktsegment FROM customer) c "
        "USING (custkey)"
    ),
    doc=(
        "J3: left outer USING-column join attaching dimension attributes "
        "to a fact (ref songplays⟕time on start_time, sparkify_etl.py:191-193). "
        "Broadcast left to AQE (customer scales with SF)."
    ),
)
def join_left_using(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_orderkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_name", "c_mktsegment"
    )
    return o.join(c, "custkey", "left")


@query(
    "fact_enrich",
    oracle=(
        "SELECT e.event_id, e.ts AS start_time, e.user_id, e.value, "
        "CAST(year(e.ts) AS INTEGER) AS year, "
        "CAST(month(e.ts) AS INTEGER) AS month, "
        "u.n_events, u.first_seen "
        "FROM events e LEFT JOIN ("
        "  SELECT user_id, COUNT(*) AS n_events, MIN(ts) AS first_seen "
        "  FROM events GROUP BY user_id"
        ") u USING (user_id) "
        "WHERE e.event_type = 'purchase'"
    ),
    doc=(
        "Songplays-fact analog: filtered events enriched with derived "
        "calendar columns (idiomatic replacement of the redundant time "
        "join, SURVEY.md §4.3-2 / Q5) plus a broadcast user-dimension join "
        "(ref sparkify_etl.py:182-205)."
    ),
)
def fact_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    user_dim = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"), F.min("ts").alias("first_seen")
    )
    purchases = ev.filter(F.col("event_type") == "purchase")
    return purchases.join(user_dim, "user_id", "left").select(
        "event_id",
        F.col("ts").alias("start_time"),
        "user_id",
        "value",
        F.year("ts").alias("year"),
        F.month("ts").alias("month"),
        "n_events",
        "first_seen",
    )
