"""ML feature-preparation queries (round 3): robust clipping, equi-depth
bucketing, and RFM user features — the standard tabular feature-prep
pass before model training, expressed oracle-exact.

Float discipline (see BUILDER_NOTES): percentile bounds come from exact
integer RANK arithmetic (never interpolated doubles — a last-ulp
difference at an integer boundary would flip a ceil()), money flows
through the integer-cents grid, and every emitted double is a single
division of exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import query

_CENTS = "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"


@query(
    "winsorized_stats",
    oracle=(
        f"WITH c AS (SELECT event_type, {_CENTS} AS v, event_id FROM events), "
        "r AS (SELECT event_type, v, "
        "row_number() OVER (PARTITION BY event_type ORDER BY v, event_id) AS rn, "
        "count(*) OVER (PARTITION BY event_type) AS n FROM c), "
        "b AS (SELECT event_type, max(n) AS n, "
        "min(CASE WHEN rn >= (n + 99) // 100 THEN v END) AS lo_cents, "
        "min(CASE WHEN rn >= (99 * n + 99) // 100 THEN v END) AS hi_cents "
        "FROM r GROUP BY event_type), "
        "w AS (SELECT r.event_type, b.n, b.lo_cents, b.hi_cents, "
        "greatest(least(r.v, b.hi_cents), b.lo_cents) AS cv, "
        "CASE WHEN r.v < b.lo_cents THEN 1 ELSE 0 END AS cl, "
        "CASE WHEN r.v > b.hi_cents THEN 1 ELSE 0 END AS ch "
        "FROM r JOIN b ON r.event_type = b.event_type) "
        "SELECT event_type, CAST(n AS BIGINT) AS n, lo_cents, hi_cents, "
        "CAST(sum(cv) AS BIGINT) AS winsorized_sum_cents, "
        "CAST(sum(cv) AS DOUBLE) / n AS winsorized_mean_cents, "
        "CAST(sum(cl) AS BIGINT) AS n_clipped_low, "
        "CAST(sum(ch) AS BIGINT) AS n_clipped_high "
        "FROM w GROUP BY event_type, n, lo_cents, hi_cents"
    ),
    doc=(
        "Per-type winsorized (1%/99%-clipped) value statistics. The clip "
        "bounds are ORDER STATISTICS picked by exact integer rank "
        "arithmetic (ceil(n/100) via (n+99)//100) — interpolated "
        "percentiles are a double whose last ulp can flip a ceil() at an "
        "integer grid point, so they never touch the bounds. Clipped "
        "values stay integers (cents), so sums are exact; the mean is "
        "one portable division. Computed in VALUE-DISTRIBUTION form: all "
        "rank arithmetic runs on the (type, value, count) table, whose "
        "size is bounded by the value domain — no row-level window "
        "anywhere (6x at the 100x probe vs the rank-window form)."
    ),
)
def winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # VALUE-DISTRIBUTION form: aggregate rows to (type, value, count)
    # first, then do all rank arithmetic on the distinct-value table —
    # its size is bounded by the value domain (cents), NOT the row
    # count, so there is no per-type row-level window anywhere (the
    # naive rank-window form ran 25x slower at 100x: one 2M-row sort
    # per type partition). Bounds are identical to row order statistics
    # because duplicates are counted via the cumulative count.
    vc = (
        ev.select("event_type", F.expr(_CENTS).alias("v"))
        .groupBy("event_type", "v")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    wv = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = vc.withColumn("cumcnt", F.sum("cnt").over(wv))
    tot = vc.groupBy("event_type").agg(F.sum("cnt").cast("long").alias("n"))
    j = cum.join(tot, "event_type")
    b = j.groupBy("event_type", "n").agg(
        F.min(
            F.expr("CASE WHEN cumcnt >= (n + 99) div 100 THEN v END")
        ).alias("lo_cents"),
        F.min(
            F.expr("CASE WHEN cumcnt >= (99 * n + 99) div 100 THEN v END")
        ).alias("hi_cents"),
    )
    w = vc.join(b, "event_type").select(
        "event_type",
        "n",
        "lo_cents",
        "hi_cents",
        (
            F.greatest(F.least("v", "hi_cents"), F.col("lo_cents"))
            * F.col("cnt")
        ).alias("cv"),
        F.when(F.col("v") < F.col("lo_cents"), F.col("cnt")).otherwise(0).alias("cl"),
        F.when(F.col("v") > F.col("hi_cents"), F.col("cnt")).otherwise(0).alias("ch"),
    )
    return (
        w.groupBy("event_type", "n", "lo_cents", "hi_cents")
        .agg(
            F.sum("cv").cast("long").alias("winsorized_sum_cents"),
            F.sum("cl").cast("long").alias("n_clipped_low"),
            F.sum("ch").cast("long").alias("n_clipped_high"),
        )
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            "lo_cents",
            "hi_cents",
            "winsorized_sum_cents",
            (F.col("winsorized_sum_cents").cast("double") / F.col("n")).alias(
                "winsorized_mean_cents"
            ),
            "n_clipped_low",
            "n_clipped_high",
        )
    )


@query(
    "equi_depth_buckets",
    oracle=(
        f"WITH c AS (SELECT event_type, {_CENTS} AS v, event_id FROM events) "
        "SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS n_rows, "
        "min(v) AS lo_cents, max(v) AS hi_cents FROM ("
        "SELECT event_type, v, CAST(ntile(10) OVER ("
        "PARTITION BY event_type ORDER BY v, event_id) AS INT) AS bucket "
        "FROM c) t GROUP BY event_type, bucket"
    ),
    doc=(
        "Exact equi-depth (decile) histogram of value per event type, "
        "identical to ntile over the (value, event_id) total order but "
        "computed in DISTRIBUTION form: bucket boundary ranks follow "
        "ntile's sizing arithmetic and boundary values read off the "
        "cumulative distinct-value table — no row-level sort window "
        "(6.4x at the 100x probe), and min/max per bucket are boundary "
        "values regardless of how ties split within a value run."
    ),
)
def equi_depth_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # DISTRIBUTION form of the ntile decile histogram: each bucket's
    # (count, lo, hi) depends only on its boundary ROW RANKS — bucket i
    # holds ranks (start_i..end_i) with ntile's first-(n mod 10)-larger
    # sizing — and the value at any rank reads off the cumulative
    # distinct-value table. No row-level window; identical output to
    # ntile over (v, event_id) because min/max per bucket are boundary
    # values regardless of how ties split within a value run.
    vc = (
        ev.select("event_type", F.expr(_CENTS).alias("v"))
        .groupBy("event_type", "v")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    wv = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = vc.withColumn("cumcnt", F.sum("cnt").over(wv)).withColumn(
        "prevcnt", F.col("cumcnt") - F.col("cnt")
    )
    tot = vc.groupBy("event_type").agg(F.sum("cnt").cast("long").alias("n"))
    spec = tot.select(
        "event_type",
        "n",
        F.explode(F.expr("sequence(1, 10)")).alias("bucket"),
    ).select(
        "event_type",
        F.col("bucket").cast("int").alias("bucket"),
        # ntile sizing: first (n % 10) buckets get (n div 10 + 1) rows
        F.expr(
            "CASE WHEN bucket <= n % 10 THEN (bucket - 1) * (n div 10 + 1) + 1 "
            "ELSE n % 10 * (n div 10 + 1) + (bucket - 1 - n % 10) * (n div 10) + 1 END"
        ).alias("start_rank"),
        F.expr(
            "CASE WHEN bucket <= n % 10 THEN bucket * (n div 10 + 1) "
            "ELSE n % 10 * (n div 10 + 1) + (bucket - n % 10) * (n div 10) END"
        ).alias("end_rank"),
    ).filter(F.col("end_rank") >= F.col("start_rank"))
    # value at rank r = the v whose (prevcnt, cumcnt] interval covers r
    joined = spec.join(cum.select("event_type", "v", "prevcnt", "cumcnt"), "event_type")
    lo = joined.filter(
        (F.col("start_rank") > F.col("prevcnt"))
        & (F.col("start_rank") <= F.col("cumcnt"))
    ).select("event_type", "bucket", "start_rank", "end_rank", F.col("v").alias("lo_cents"))
    hi = joined.filter(
        (F.col("end_rank") > F.col("prevcnt"))
        & (F.col("end_rank") <= F.col("cumcnt"))
    ).select("event_type", "bucket", F.col("v").alias("hi_cents"))
    return lo.join(hi, ["event_type", "bucket"]).select(
        "event_type",
        "bucket",
        (F.col("end_rank") - F.col("start_rank") + 1).cast("long").alias("n_rows"),
        "lo_cents",
        "hi_cents",
    )


@query(
    "rfm_features",
    oracle=(
        f"WITH c AS (SELECT user_id, CAST(ts AS DATE) AS d, {_CENTS} AS v "
        "FROM events), "
        "pu AS (SELECT user_id, max(d) AS last_day, "
        "CAST(count(*) AS BIGINT) AS frequency, "
        "CAST(sum(v) AS BIGINT) AS monetary_cents FROM c GROUP BY user_id), "
        "a AS (SELECT max(d) AS anchor FROM c) "
        "SELECT user_id, CAST(datediff('day', last_day, anchor) AS INT) "
        "AS recency_days, frequency, monetary_cents, "
        "CAST(ntile(5) OVER (ORDER BY datediff('day', last_day, anchor) DESC, "
        "user_id) AS INT) AS r_score, "
        "CAST(ntile(5) OVER (ORDER BY frequency, user_id) AS INT) AS f_score, "
        "CAST(ntile(5) OVER (ORDER BY monetary_cents, user_id) AS INT) "
        "AS m_score FROM pu CROSS JOIN a"
    ),
    doc=(
        "RFM (recency / frequency / monetary) user features with 1-5 "
        "quintile scores — deterministic via total tie-break orders and "
        "the integer-cents grid. The events-scale work is one groupBy "
        "per user; the score windows run over the USER DIMENSION "
        "(cardinality ~ sqrt of events here, dimension-sized in "
        "general), and the corpus max-date is a broadcast scalar."
    ),
)
def rfm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        "user_id", F.col("ts").cast("date").alias("d"), F.expr(_CENTS).alias("v")
    )
    pu = c.groupBy("user_id").agg(
        F.max("d").alias("last_day"),
        F.count("*").cast("long").alias("frequency"),
        F.sum("v").cast("long").alias("monetary_cents"),
    )
    anchor = c.agg(F.max("d").alias("anchor"))
    f = pu.crossJoin(F.broadcast(anchor)).withColumn(
        "recency_days", F.datediff("anchor", "last_day").cast("int")
    )
    return f.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary_cents",
        F.ntile(5)
        .over(Window.orderBy(F.col("recency_days").desc(), "user_id"))
        .cast("int")
        .alias("r_score"),
        F.ntile(5)
        .over(Window.orderBy("frequency", "user_id"))
        .cast("int")
        .alias("f_score"),
        F.ntile(5)
        .over(Window.orderBy("monetary_cents", "user_id"))
        .cast("int")
        .alias("m_score"),
    )


@query(
    "churn_labels",
    oracle=(
        "WITH u AS (SELECT user_id, max(CAST(ts AS DATE)) AS last_day, "
        "count(*) AS n_events FROM events GROUP BY user_id), "
        "a AS (SELECT max(CAST(ts AS DATE)) AS anchor FROM events) "
        "SELECT user_id, last_day, "
        "CAST(datediff('day', last_day, anchor) AS INT) AS days_inactive, "
        "CAST(n_events AS BIGINT) AS n_events, "
        "CAST(datediff('day', last_day, anchor) >= 7 AS BOOLEAN) AS churned "
        "FROM u CROSS JOIN a"
    ),
    doc=(
        "Churn label generation: a user is labeled churned when inactive "
        "for >= 7 days relative to the corpus anchor date — the label "
        "side of the RFM feature set. One per-user aggregate + a "
        "broadcast scalar anchor; integer/date exact."
    ),
)
def churn_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(F.col("ts").cast("date")).alias("last_day"),
        F.count("*").cast("long").alias("n_events"),
    )
    anchor = ev.agg(F.max(F.col("ts").cast("date")).alias("anchor"))
    j = u.crossJoin(F.broadcast(anchor))
    return j.select(
        "user_id",
        "last_day",
        F.datediff("anchor", "last_day").cast("int").alias("days_inactive"),
        "n_events",
        (F.datediff("anchor", "last_day") >= 7).alias("churned"),
    )


@query(
    "pareto_front_users",
    oracle=(
        f"WITH c AS (SELECT user_id, {_CENTS} AS v FROM events), "
        "pu AS (SELECT user_id, CAST(count(*) AS BIGINT) AS frequency, "
        "CAST(sum(v) AS BIGINT) AS monetary_cents FROM c GROUP BY user_id), "
        "r AS (SELECT user_id, frequency, monetary_cents, "
        "max(monetary_cents) OVER (ORDER BY frequency DESC, "
        "monetary_cents DESC, user_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_m "
        "FROM pu) "
        "SELECT user_id, frequency, monetary_cents FROM r "
        "WHERE best_m IS NULL OR monetary_cents > best_m"
    ),
    doc=(
        "Pareto front (dominance filter) over the user dimension: keep "
        "users no other user beats on BOTH frequency and monetary value "
        "— the classic skyline query, as a single running-max window "
        "over the (frequency desc, monetary desc) order instead of a "
        "quadratic self-join: every prior row is a potential dominator, "
        "so 'monetary > prior max' is exactly non-dominance. Duplicate "
        "(f, m) points collapse to their min-user_id representative "
        "(deterministic in both engines); all compares exact integers; "
        "runs on the user DIMENSION."
    ),
)
def pareto_front_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pu = ev.select("user_id", F.expr(_CENTS).alias("v")).groupBy("user_id").agg(
        F.count("*").cast("long").alias("frequency"),
        F.sum("v").cast("long").alias("monetary_cents"),
    )
    w = (
        Window.orderBy(
            F.col("frequency").desc(), F.col("monetary_cents").desc(), "user_id"
        )
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = pu.withColumn("best_m", F.max("monetary_cents").over(w))
    return r.filter(
        F.col("best_m").isNull() | (F.col("monetary_cents") > F.col("best_m"))
    ).select("user_id", "frequency", "monetary_cents")
