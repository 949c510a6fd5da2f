"""General query surface, batch 3: grouping sets, FILTER-clause
aggregates, bag set-ops (INTERSECT/EXCEPT ALL), unpivot/stack,
explode_outer, time-range window frames, discrete percentiles,
try_-safe arithmetic (ANSI mode), width_bucket histograms, and a
decimal-exact per-key linear regression.

Every float-producing query pins its arithmetic to an
engine-independent order (decimal sums of 2-decimal inputs, or double
expressions evaluated in the same textual order in both engines), per
the repo's oracle-portability rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table, register_views
from .registry import query


@query(
    "grouping_sets_revenue",
    oracle=(
        "SELECT o_orderpriority, o_orderstatus, "
        "CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_pri, "
        "CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status, "
        "COUNT(*) AS n, "
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue "
        "FROM orders "
        "GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())"
    ),
    doc=(
        "GROUPING SETS with GROUPING() markers — the general form rollup/"
        "cube specialize; one shuffle, partial aggregation per set."
    ),
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT o_orderpriority, o_orderstatus, "
        "CAST(GROUPING(o_orderpriority) AS INT) AS g_pri, "
        "CAST(GROUPING(o_orderstatus) AS INT) AS g_status, "
        "COUNT(*) AS n, "
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue "
        "FROM orders "
        "GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())"
    )


@query(
    "filter_clause_agg",
    oracle=(
        "SELECT o_orderpriority, "
        "COUNT(*) AS n_all, "
        "COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished, "
        "COUNT(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 200000) "
        "AS n_big_custs "
        "FROM orders GROUP BY o_orderpriority"
    ),
    doc=(
        "ANSI FILTER-clause aggregates — the declarative form of the "
        "CASE-WHEN-sum pattern; planned as conditional partial aggs."
    ),
)
def filter_clause_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT o_orderpriority, "
        "COUNT(*) AS n_all, "
        "COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished, "
        "COUNT(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 200000) "
        "AS n_big_custs "
        "FROM orders GROUP BY o_orderpriority"
    )


@query(
    "intersect_all_except_all",
    oracle=(
        "SELECT 'intersect' AS op, custkey FROM ("
        "  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F' "
        "  INTERSECT ALL "
        "  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000"
        ") UNION ALL "
        "SELECT 'except' AS op, custkey FROM ("
        "  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F' "
        "  EXCEPT ALL "
        "  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000"
        ")"
    ),
    doc=(
        "Bag-semantics set operators (INTERSECT ALL / EXCEPT ALL) — "
        "multiplicity-preserving, planned as counted hash aggregations."
    ),
)
def intersect_all_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.filter(F.col("o_totalprice") > 200000).select(
        F.col("o_custkey").alias("custkey")
    )
    inter = a.intersectAll(b).select(F.lit("intersect").alias("op"), "custkey")
    exc = a.exceptAll(b).select(F.lit("except").alias("op"), "custkey")
    return inter.unionByName(exc)


@query(
    "unpivot_stack_metrics",
    oracle=(
        "SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer "
        "UNION ALL "
        "SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) "
        "AS val FROM customer"
    ),
    doc=(
        "Unpivot (wide -> long) via stack(): the row-generating transpose; "
        "map-only, no shuffle."
    ),
)
def unpivot_stack_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.selectExpr(
        "c_custkey",
        "stack(2, 'acctbal', c_acctbal, "
        "'nationkey', CAST(c_nationkey AS DOUBLE)) AS (metric, val)",
    )


@query(
    "explode_outer_long_tokens",
    oracle=(
        "WITH base AS (SELECT doc_id, "
        "list_filter(string_split(text, ' '), t -> length(t) > 8) AS lst "
        "FROM documents WHERE doc_id < 200) "
        "SELECT doc_id, unnest("
        "CASE WHEN len(lst) = 0 THEN [CAST(NULL AS VARCHAR)] ELSE lst END"
        ") AS tok FROM base"
    ),
    doc=(
        "explode_outer: row generation that PRESERVES parents with empty "
        "arrays (null-extended) — the left-outer lateral view."
    ),
)
def explode_outer_long_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return docs.select(
        "doc_id",
        F.explode_outer(
            F.expr("filter(split(text, ' '), t -> length(t) > 8)")
        ).alias("tok"),
    )


@query(
    "time_range_rolling_count",
    oracle=(
        "SELECT event_id, user_id, "
        "COUNT(*) OVER (PARTITION BY user_id ORDER BY ts "
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) "
        "AS n_last_hour "
        "FROM events"
    ),
    doc=(
        "Time-RANGE window frame (count of events in the trailing hour "
        "per user) — value-based frames, not row offsets; one shuffle on "
        "the partition key."
    ),
)
def time_range_rolling_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id", "user_id", F.count("*").over(w).alias("n_last_hour")
    )


@query(
    "percentile_disc_quantities",
    oracle=(
        "SELECT l_returnflag, "
        "quantile_disc(l_quantity, 0.5) AS med_qty, "
        "quantile_disc(l_quantity, 0.9) AS p90_qty "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    doc=(
        "Discrete percentiles (order statistics, no interpolation) — "
        "WITHIN GROUP syntax; exact, unlike approx sketches."
    ),
)
def percentile_disc_quantities(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT l_returnflag, "
        "percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS med_qty, "
        "percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity) AS p90_qty "
        "FROM lineitem GROUP BY l_returnflag"
    )


@query(
    "try_arithmetic_safe",
    oracle=(
        "SELECT event_id, "
        "value / CAST(NULLIF(user_id % 3, 0) AS DOUBLE) AS safe_div, "
        "TRY_CAST(props AS DOUBLE) AS props_num "
        "FROM events WHERE event_id < 2000"
    ),
    doc=(
        "try_-family arithmetic under ANSI mode: NULL instead of error on "
        "division-by-zero and bad casts — the strict-mode escape hatches."
    ),
)
def try_arithmetic_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return ev.select(
        "event_id",
        F.expr("try_divide(value, CAST(user_id % 3 AS DOUBLE))").alias(
            "safe_div"
        ),
        F.expr("try_cast(props AS DOUBLE)").alias("props_num"),
    )


@query(
    "width_bucket_histogram",
    oracle=(
        # DuckDB has no width_bucket; the CASE mirrors Spark's semantics
        # exactly: bucket 0 below the range, n+1 at/above the upper bound,
        # else floor((x-lo)/((hi-lo)/n)) + 1 in double arithmetic.
        "SELECT CASE WHEN c_acctbal < 0.0 THEN 0 "
        "WHEN c_acctbal >= 10000.0 THEN 11 "
        "ELSE CAST(FLOOR((c_acctbal - 0.0) / 1000.0) + 1 AS BIGINT) END "
        "AS bucket, COUNT(*) AS n "
        "FROM customer GROUP BY 1"
    ),
    doc=(
        "Fixed-width histogram via width_bucket + count — the map-side "
        "binning every data-profiling pass runs."
    ),
)
def width_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select(
            F.expr("width_bucket(c_acctbal, 0.0, 10000.0, 10)").alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


# All moment sums stay EXACT (integer hours since the user's first
# purchase x integer cents) and every quantity stays below 2^53, so the
# decimal->double casts are value-preserving in both engines and the
# final division is the only (identical) float operation. Raw epoch
# seconds would put n*Sxx near 1e22 — above 2^53, where decimal->double
# rounding is engine-specific and the n*Sxx - Sx^2 cancellation amplifies
# a 1-ulp difference into a visible slope change (observed at sf0.01).
_REGRESSION_BODY = """
WITH pts0 AS (
  SELECT user_id,
         CAST({epoch_expr} AS BIGINT) AS sec,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS DECIMAL(18,0)) AS y100
  FROM events WHERE event_type = 'purchase'
), pts AS (
  SELECT user_id,
         CAST((sec - MIN(sec) OVER (PARTITION BY user_id)) {intdiv} 3600
              AS BIGINT) AS x,
         y100
  FROM pts0
), s AS (
  SELECT user_id, COUNT(*) AS n,
         SUM(x) AS sx, SUM(x * x) AS sxx,
         SUM(y100) AS sy100, SUM(x * y100) AS sxy100
  FROM pts GROUP BY user_id
)
SELECT user_id, n,
  (CAST(n * sxy100 - sx * sy100 AS DOUBLE)
   / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE), 0.0)) / 100.0
  AS slope_per_hour
FROM s
"""


@query(
    "user_value_regression",
    oracle=_REGRESSION_BODY.format(
        epoch_expr="epoch_us(ts) // 1000000", intdiv="//"
    ),
    doc=(
        "Per-key OLS slope (purchase value per hour since the user's "
        "first purchase) from exact integer moment sums — the grouped "
        "feature-engineering shape; one shuffle, map-side partials, and "
        "engine-identical float arithmetic by construction."
    ),
)
def user_value_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        _REGRESSION_BODY.format(
            epoch_expr="unix_micros(ts) div 1000000", intdiv="div"
        )
    )


_STATS_BODY = """
WITH pts0 AS (
  SELECT event_type,
         CAST({epoch_expr} AS BIGINT) AS sec,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS DECIMAL(18,0)) AS y100
  FROM events
), pts AS (
  SELECT event_type,
         CAST((sec - MIN(sec) OVER (PARTITION BY event_type)) {intdiv} 3600
              AS BIGINT) AS x,
         CAST(y100 AS BIGINT) AS y
  FROM pts0
), s AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(x) AS sx, SUM(x * x) AS sxx,
         SUM(y) AS sy, SUM(y * y) AS syy,
         SUM(x * y) AS sxy
  FROM pts GROUP BY event_type
)
SELECT event_type, n,
  CAST(sy AS DOUBLE) / n / 100.0 AS mean_value,
  CAST(n * syy - sy * sy AS DOUBLE) / (CAST(n AS DOUBLE) * n) / 10000.0
    AS var_pop_value,
  sqrt(CAST(n * syy - sy * sy AS DOUBLE) / (CAST(n AS DOUBLE) * n)) / 100.0
    AS stddev_pop_value,
  CAST(n * sxy - sx * sy AS DOUBLE) / (CAST(n AS DOUBLE) * n) / 100.0
    AS covar_pop_hr_value,
  CAST(n * sxy - sx * sy AS DOUBLE)
    / NULLIF(sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
             * sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 0.0) AS corr_hr_value
FROM s
"""


@query(
    "stats_aggregates",
    oracle=_STATS_BODY.format(epoch_expr="epoch_us(ts) // 1000000", intdiv="//"),
    doc=(
        "Grouped statistical aggregates — mean, population variance / "
        "stddev, covariance and correlation of (hours-since-group-min, "
        "value) — from exact integer moment sums (the var_pop/covar_pop/"
        "corr family, engine-identical by construction: every integer "
        "stays < 2^53 and IEEE sqrt is correctly rounded, so the doubles "
        "match bit-for-bit; Spark's native stddev/corr use running "
        "float updates whose partition-order sensitivity would break "
        "the cross-engine hash)."
    ),
)
def stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        _STATS_BODY.format(epoch_expr="unix_micros(ts) div 1000000", intdiv="div")
    )


@query(
    "regex_funcs",
    oracle=(
        "SELECT doc_id, "
        "regexp_extract(text, '([a-z]+)a([a-z]+)', 1) AS before_a, "
        "regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled_head, "
        "CAST(len(regexp_extract_all(text, '[a-z]{5,}')) AS BIGINT) AS n_long_words, "
        "regexp_matches(text, 'data|spark') AS mentions_engine "
        "FROM (SELECT doc_id, substring(text, 1, 80) AS text FROM documents)"
    ),
    doc=(
        "Regex function family over the Java/RE2-identical subset: group "
        "extraction, global replace, match counting, boolean match — all "
        "JVM-native, map-only, pushdown-friendly."
    ),
)
def regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 80).alias("text")
    )
    return docs.select(
        "doc_id",
        F.regexp_extract("text", r"([a-z]+)a([a-z]+)", 1).alias("before_a"),
        F.regexp_replace("text", r"[aeiou]", "_").alias("devoweled_head"),
        F.size(F.regexp_extract_all("text", F.lit(r"[a-z]{5,}"), F.lit(0)))
        .cast("long")
        .alias("n_long_words"),
        F.col("text").rlike("data|spark").alias("mentions_engine"),
    )


@query(
    "approx_percentile_check",
    oracle=(
        # Same pattern as approx_count_distinct: the t-digest/GK sketch is
        # engine-specific, so the checked output is the exact percentile
        # plus a Spark-computed within-tolerance boolean; the oracle
        # states the invariant (TRUE) next to the portable exact value.
        "SELECT event_type, "
        "CAST(quantile_disc(CAST(value AS DECIMAL(18,2)), 0.5) AS DOUBLE) "
        "AS exact_median, "
        "TRUE AS approx_within_tol "
        "FROM events GROUP BY event_type"
    ),
    doc=(
        "Sketch percentile: approx_percentile audited against the exact "
        "discrete median per group; checked columns are the exact median "
        "and the within-5%-relative-error boolean, deterministic across "
        "engines (the sketch itself is not)."
    ),
)
def approx_percentile_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    agg = ev.groupBy("event_type").agg(
        F.percentile_approx(dec, 0.5, 1000).alias("approx_median"),
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP "
            "(ORDER BY CAST(value AS DECIMAL(18,2)))"
        ).alias("exact_median"),
    )
    return agg.select(
        "event_type",
        F.col("exact_median").cast("double").alias("exact_median"),
        (
            F.abs(
                F.col("approx_median").cast("double")
                - F.col("exact_median").cast("double")
            )
            / F.abs(F.col("exact_median").cast("double"))
            <= F.lit(0.05)
        ).alias("approx_within_tol"),
    )
