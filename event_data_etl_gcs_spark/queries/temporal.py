"""Temporal/custom-join queries: as-of join, bucketed range join,
MERGE-style upsert — operators Spark's API lacks, built as compositions
and checked against native DuckDB equivalents (DuckDB has a real ASOF
JOIN, making this a strong cross-engine semantic check)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.temporal_joins import asof_join, range_join_bucketed
from ..operators.upsert import merge_upsert
from ..sources.catalog import load_table
from .registry import query


@query(
    "asof_join_last_purchase",
    oracle=(
        "SELECT e.event_id, e.user_id, e.ts, e.event_type, "
        "p.purchase_value, p.purchase_ts "
        "FROM events e ASOF LEFT JOIN ("
        "  SELECT user_id, ts, value AS purchase_value, ts AS purchase_ts "
        "  FROM events WHERE event_type = 'purchase'"
        ") p ON e.user_id = p.user_id AND e.ts >= p.ts"
    ),
    doc=(
        "As-of join: attach each user's most recent prior (or "
        "concurrent) purchase to every event. Spark side = union-sort-"
        "carry composition (one shuffle); oracle = DuckDB's native ASOF "
        "JOIN — a true cross-engine semantics check."
    ),
)
def asof_join_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("value").alias("purchase_value"),
        F.col("ts").alias("purchase_ts"),
    )
    out = asof_join(
        ev.select("event_id", "user_id", "ts", "event_type"),
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_values=["purchase_value", "purchase_ts"],
    )
    return out


@query(
    "range_join_value_bands",
    oracle=(
        "WITH bands AS ("
        "  SELECT i AS band_id, CAST(i * 40 AS DOUBLE) AS lo, "
        "         CAST(i * 40 + 60 AS DOUBLE) AS hi "
        "  FROM unnest(range(0, 5)) AS r(i)"
        ") "
        "SELECT e.event_id, b.band_id, b.lo, b.hi FROM events e "
        "JOIN bands b ON e.value >= b.lo AND e.value < b.hi"
    ),
    doc=(
        "Range (interval containment) join via fixed-width bucket "
        "co-partitioning: overlapping value bands x events without a "
        "cross join; exact BETWEEN filter on bucket candidates only."
    ),
)
def range_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    bands = (
        spark.range(0, 5)
        .select(
            F.col("id").alias("band_id"),
            (F.col("id") * 40).cast("double").alias("lo"),
            (F.col("id") * 40 + 60).cast("double").alias("hi"),
        )
    )
    joined = range_join_bucketed(
        ev, bands, point_col="value", start_col="lo", end_col="hi", bucket_width=20.0
    )
    return joined.select("event_id", "band_id", "lo", "hi")


@query(
    "merge_upsert_events",
    oracle=(
        "WITH updates AS ("
        "  SELECT event_id, user_id, value + 1000 AS value FROM events "
        "  WHERE event_id >= 700 AND event_id < 900"
        "), target AS ("
        "  SELECT event_id, user_id, value FROM events WHERE event_id < 800"
        ") "
        "SELECT * FROM updates "
        "UNION ALL "
        "SELECT t.* FROM target t WHERE NOT EXISTS ("
        "  SELECT 1 FROM updates u WHERE u.event_id = t.event_id)"
    ),
    doc=(
        "MERGE-style upsert (WHEN MATCHED UPDATE / WHEN NOT MATCHED "
        "INSERT) as anti-join + union — updates replace overlapping keys, "
        "new keys insert, untouched rows survive."
    ),
)
def merge_upsert_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    target = ev.filter(F.col("event_id") < 800).select("event_id", "user_id", "value")
    updates = (
        ev.filter((F.col("event_id") >= 700) & (F.col("event_id") < 900))
        .select("event_id", "user_id", (F.col("value") + 1000).alias("value"))
    )
    return merge_upsert(target, updates, keys=["event_id"])


@query(
    "scd2_event_type_history",
    oracle="""
WITH o AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN LAG(event_type) OVER w IS NULL
                   OR LAG(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), g AS (
  SELECT user_id, event_type, ts,
         SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM o
), runs AS (
  SELECT user_id, MIN(event_type) AS event_type, MIN(ts) AS valid_from,
         COUNT(*) AS n_events, grp
  FROM g GROUP BY user_id, grp
)
SELECT user_id, event_type, valid_from,
       LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY grp) AS valid_to,
       n_events,
       (LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY grp) IS NULL)
       AS is_current
FROM runs
""",
    doc=(
        "SCD2 (type-2 slowly-changing dimension) history build from an "
        "event log: consecutive runs of the same event_type per user "
        "collapse to one versioned row with [valid_from, valid_to) "
        "effective range, open-ended latest row flagged is_current — the "
        "gaps-and-islands pattern. One hash exchange on user_id serves "
        "the change-flag lag, the run-id prefix sum, the run aggregate, "
        "and the valid_to lead."
    ),
)
def scd2_event_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "chg",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        ).otherwise(0),
    )
    grouped = flagged.withColumn(
        "grp",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    runs = grouped.groupBy("user_id", "grp").agg(
        F.min("event_type").alias("event_type"),
        F.min("ts").alias("valid_from"),
        F.count("*").alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("grp")
    return runs.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_events",
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
    )


@query(
    "incremental_agg_maintenance",
    oracle=(
        "SELECT user_id, event_type, COUNT(*) AS n, "
        "CAST(SUM(CAST(value AS DECIMAL(38,2))) AS DOUBLE) AS sum_value "
        "FROM events GROUP BY user_id, event_type"
    ),
    doc=(
        "Materialized-view maintenance: per-(user, event_type) count/sum "
        "state built from the 'historical' 80% of events, then MERGED "
        "with the 'new batch' 20% (full-outer + coalesced addition, "
        "operators/upsert.py incremental_agg_merge) — the oracle is a "
        "full recompute over everything, so the gate proves incremental "
        "== from-scratch, bit-exact. Decimal state keeps the float sum "
        "associative; the raw history is never rescanned at merge time."
    ),
)
def incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.upsert import agg_state, incremental_agg_merge

    ev = load_table(spark, sf_dir, "events")
    keys = ["user_id", "event_type"]
    hist = agg_state(ev.filter(F.col("event_id") % 5 != 0), keys, "value")
    batch = agg_state(ev.filter(F.col("event_id") % 5 == 0), keys, "value")
    merged = incremental_agg_merge(hist, batch, keys)
    return merged.select(
        "user_id",
        "event_type",
        "n",
        F.col("sum_dec").cast("double").alias("sum_value"),
    )


from ..operators.temporal_joins import interval_overlap_join  # noqa: E402

_OVL_US = 30 * 60 * 1_000_000  # 30-minute activity intervals


@query(
    "interval_overlap_pairs",
    oracle=(
        "WITH p AS (SELECT user_id, event_id AS purchase_id, "
        "epoch_us(ts) AS p_start_us, "
        f"epoch_us(ts) + {_OVL_US} AS p_end_us "
        "FROM events WHERE event_type = 'purchase'), "
        "c AS (SELECT user_id, event_id AS click_id, "
        "epoch_us(ts) AS c_start_us, "
        f"epoch_us(ts) + {_OVL_US} AS c_end_us "
        "FROM events WHERE event_type = 'click') "
        "SELECT p.user_id, p.purchase_id, c.click_id, "
        "CAST(least(p_end_us, c_end_us) - greatest(p_start_us, c_start_us) "
        "AS BIGINT) AS overlap_us "
        "FROM p JOIN c ON p.user_id = c.user_id "
        "AND p_start_us <= c_end_us AND c_start_us <= p_end_us"
    ),
    doc=(
        "Interval-interval overlap join: every (purchase, click) pair of "
        "the same user whose 30-minute activity windows overlap, with the "
        "exact overlap duration. Both interval sets explode to 30-minute "
        "slabs and equi-join on (user_id, slab) — a bounded shuffle join, "
        "never a per-user cross join; the exact overlap predicate runs on "
        "slab-mates only (operators/temporal_joins.interval_overlap_join)."
    ),
)
def interval_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        us.alias("p_start_us"),
        (us + F.lit(_OVL_US)).alias("p_end_us"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        us.alias("c_start_us"),
        (us + F.lit(_OVL_US)).alias("c_end_us"),
    )
    joined = interval_overlap_join(
        p,
        c,
        keys=["user_id"],
        left_start="p_start_us",
        left_end="p_end_us",
        right_start="c_start_us",
        right_end="c_end_us",
        bucket_width=_OVL_US,
    )
    return joined.select(
        "user_id",
        "purchase_id",
        "click_id",
        (
            F.least("p_end_us", "c_end_us") - F.greatest("p_start_us", "c_start_us")
        ).cast("bigint").alias("overlap_us"),
    )


@query(
    "dedup_events_tumbling",
    oracle=(
        "SELECT user_id, event_type, "
        "CAST(to_timestamp((epoch_us(ts) // 300000000) * 300) AS TIMESTAMP) "
        "AS window_start, "
        "CAST(MIN(event_id) AS BIGINT) AS kept_event_id, "
        "CAST(COUNT(*) - 1 AS BIGINT) AS n_suppressed "
        "FROM events GROUP BY 1, 2, 3"
    ),
    doc=(
        "Time-windowed event dedup: one kept event (min id) per "
        "(user, event_type, 5-minute tumbling window), the rest counted "
        "as suppressed — the batch analogue of the streaming "
        "watermark-dedup stage (streaming/incremental.py), for replays "
        "and backfills. One hash aggregate, map-side partials; the "
        "window key is integer arithmetic on epoch micros so both "
        "engines bucket identically."
    ),
)
def dedup_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    win = F.timestamp_seconds(
        (F.floor(F.unix_micros("ts") / F.lit(300_000_000))) * F.lit(300)
    )
    return ev.groupBy(
        "user_id", "event_type", win.alias("window_start")
    ).agg(
        F.min("event_id").cast("bigint").alias("kept_event_id"),
        (F.count("*") - 1).cast("bigint").alias("n_suppressed"),
    )


def _scd2_pit_oracle() -> str:
    from .registry import get_query

    scd = get_query("scd2_event_type_history").oracle
    return (
        f"WITH scd AS ({scd}), "
        "probes AS (SELECT user_id, CAST(ts AS DATE) AS day, "
        "min(ts) AS probe_ts FROM events GROUP BY user_id, CAST(ts AS DATE)) "
        "SELECT p.user_id, p.probe_ts, s.event_type AS state_at_probe, "
        "s.valid_from, CAST(s.n_events AS BIGINT) AS version_n_events "
        "FROM probes p JOIN scd s ON p.user_id = s.user_id "
        "AND s.valid_from <= p.probe_ts "
        "AND (s.valid_to IS NULL OR p.probe_ts < s.valid_to)"
    )


@query(
    "scd2_point_in_time_join",
    oracle=_scd2_pit_oracle(),
    doc=(
        "Point-in-time (temporal) join against the SCD2 history: each "
        "probe timestamp (first event per user-day) picks up the "
        "dimension version whose [valid_from, valid_to) range covers it "
        "— the AS OF lookup every warehouse needs against versioned "
        "dims. Range predicate rides a user_id equi-join (per-user "
        "version counts are bounded), so no interval machinery is "
        "needed; at dimension scale the slab-bucketed interval join "
        "(operators/temporal_joins.py) is the drop-in upgrade."
    ),
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    scd = scd2_event_type_history(spark, sf_dir)
    probes = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(F.min("ts").alias("probe_ts"))
    p, s = probes.alias("p"), scd.alias("s")
    return (
        p.join(
            s,
            (F.col("p.user_id") == F.col("s.user_id"))
            & (F.col("s.valid_from") <= F.col("p.probe_ts"))
            & (
                F.col("s.valid_to").isNull()
                | (F.col("p.probe_ts") < F.col("s.valid_to"))
            ),
        )
        .select(
            F.col("p.user_id").alias("user_id"),
            F.col("p.probe_ts").alias("probe_ts"),
            F.col("s.event_type").alias("state_at_probe"),
            F.col("s.valid_from").alias("valid_from"),
            F.col("s.n_events").cast("long").alias("version_n_events"),
        )
    )
