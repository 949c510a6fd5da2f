"""Time-series completeness operators: date-spine generation, gap-filled
aggregates, forward-fill interpolation — the hypertable-rollup shapes."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import query


@query(
    "gap_fill_daily_counts",
    oracle=(
        "WITH spine AS ("
        "  SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-03-31', "
        "         INTERVAL 1 DAY)) AS DATE) AS day"
        "), daily AS ("
        "  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS n "
        "  FROM events WHERE event_type = 'signup' GROUP BY 1"
        ") "
        "SELECT s.day, COALESCE(d.n, 0) AS n FROM spine s LEFT JOIN daily d USING (day)"
    ),
    doc=(
        "Gap filling: generated date spine left-joined to daily counts, "
        "zeros where no events — the complete-series shape dashboards and "
        "training-data stats need."
    ),
)
def gap_fill_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    spine = spark.sql(
        "SELECT explode(sequence(DATE '2024-01-01', DATE '2024-03-31', "
        "interval 1 day)) AS day"
    )
    daily = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.count("*").alias("n"))
    )
    return spine.join(daily, "day", "left").select(
        "day", F.coalesce("n", F.lit(0)).alias("n")
    )


@query(
    "forward_fill_values",
    oracle=(
        "WITH spine AS ("
        "  SELECT u.user_id, CAST(unnest(generate_series(DATE '2024-01-01', "
        "         DATE '2024-01-31', INTERVAL 1 DAY)) AS DATE) AS day "
        "  FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 5) u"
        "), daily AS ("
        "  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, "
        "         MAX(value) AS day_max "
        "  FROM events WHERE user_id < 5 GROUP BY 1, 2"
        "), joined AS ("
        "  SELECT s.user_id, s.day, d.day_max FROM spine s "
        "  LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day"
        ") "
        "SELECT user_id, day, day_max, "
        "       last_value(day_max IGNORE NULLS) OVER "
        "       (PARTITION BY user_id ORDER BY day) AS filled "
        "FROM joined"
    ),
    doc=(
        "Forward-fill interpolation over a per-key date spine: "
        "last-observation-carried-forward via last(ignorenulls) — "
        "resampling for sparse per-entity series."
    ),
)
def forward_fill_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    users = ev.select("user_id").distinct()
    days = spark.sql(
        "SELECT explode(sequence(DATE '2024-01-01', DATE '2024-01-31', "
        "interval 1 day)) AS day"
    )
    spine = users.crossJoin(days)
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.max("value").alias("day_max"))
    joined = spine.join(daily, ["user_id", "day"], "left")
    w = Window.partitionBy("user_id").orderBy("day")
    return joined.select(
        "user_id",
        "day",
        "day_max",
        F.last("day_max", ignorenulls=True).over(w).alias("filled"),
    )
