"""Pipeline runner lifecycle: stage ordering, failure quarantine,
_SUCCESS gating, cleanup."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from event_data_etl_gcs_spark.plans.runner import (
    RunConfig,
    cleanup_transformed,
    is_load_ready,
    run,
)
from event_data_etl_gcs_spark.plans.sparkify import (
    build_users,
    load_log_data,
    next_song_events,
)
from event_data_etl_gcs_spark.sources.parquet_sink import write_parquet_table

from .test_sparkify_pipeline import _log_row


def _config(tmp_path, rows):
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "events.json").write_text("\n".join(json.dumps(r) for r in rows))
    return RunConfig(
        raw_dir=str(raw),
        output_dir=str(tmp_path / "out"),
        failed_dir=str(tmp_path / "failed"),
        run_id="test-run",
    )


def _users_stage(spark, cfg):
    events = next_song_events(load_log_data(spark, cfg.raw_dir))
    write_parquet_table(build_users(events), os.path.join(cfg.output_dir, "users"))


def _boom_stage(spark, cfg):
    raise RuntimeError("boom")


def test_happy_path_and_success_gate(spark, tmp_path):
    cfg = _config(tmp_path, [_log_row(userId="u1")])
    results = run(spark, cfg, [("users", _users_stage)])
    assert [r.status for r in results] == ["ok"]
    users_path = os.path.join(cfg.output_dir, "users")
    assert is_load_ready(users_path)  # _SUCCESS committed
    assert spark.read.parquet(users_path).count() == 1
    # raw NOT quarantined on success
    assert os.path.exists(cfg.raw_dir)
    cleanup_transformed(cfg)
    assert not os.path.exists(cfg.output_dir)


def test_failure_quarantines_and_skips(spark, tmp_path):
    cfg = _config(tmp_path, [_log_row(userId="u1")])
    results = run(
        spark, cfg, [("users", _users_stage), ("boom", _boom_stage), ("after", _users_stage)]
    )
    assert [r.status for r in results] == ["ok", "failed", "skipped"]
    assert "RuntimeError: boom" in results[1].error
    # raw moved to failed/<run_id>/ (O5 dead-letter)
    assert not os.path.exists(cfg.raw_dir)
    quarantined = os.path.join(cfg.failed_dir, cfg.run_id)
    assert os.path.exists(os.path.join(quarantined, "events.json"))


def test_partition_pruning_reaches_scan(spark, tmp_path):
    """Hive-partitioned output + partition predicate -> PartitionFilters
    in the scan, and only the matching partition's files are read."""
    from event_data_etl_gcs_spark.sources.catalog import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "month", F.month("ts")
    )
    path = str(tmp_path / "events_by_month")
    write_parquet_table(ev, path, partition_by=["month"])
    df = spark.read.parquet(path).filter(F.col("month") == 3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(month" in plan, plan
    want = ev.filter(F.col("month") == 3).count()
    assert df.count() == want


def test_month_partitioned_time_and_warehouse_load(spark, tmp_path):
    """The incremental variant's month-partitioned time layout
    (partition_overrides, ref sparkify_etl_1.py:106-110) + an exercised
    S9-analog warehouse load: the runner stage loads the committed
    Parquet into DuckDB behind the _SUCCESS gate and the loaded counts
    match Spark's."""
    import duckdb

    from event_data_etl_gcs_spark.plans.runner import warehouse_load_stage
    from event_data_etl_gcs_spark.plans.sparkify import run_pipeline

    cfg = _config(
        tmp_path,
        [
            _log_row(userId="u1"),
            _log_row(userId="u2", ts=_log_row()["ts"] + 90 * 24 * 3600 * 1000),
        ],
    )

    def _pipeline_stage(spark, cfg):
        run_pipeline(
            spark,
            song_data_path=None,
            log_data_path=cfg.raw_dir,
            output_dir=cfg.output_dir,
            partition_overrides={"time": ["year", "month"]},
        )

    db_path = str(tmp_path / "warehouse.duckdb")
    tables = {
        "users": os.path.join(cfg.output_dir, "users"),
        "time": os.path.join(cfg.output_dir, "time"),
    }
    results = run(
        spark,
        cfg,
        [("pipeline", _pipeline_stage), ("load", warehouse_load_stage(tables, db_path))],
    )
    assert [r.status for r in results] == ["ok", "ok"], [
        (r.name, r.error) for r in results
    ]
    # month-partitioned hive layout on disk
    year_dirs = [
        d for d in os.listdir(tables["time"]) if d.startswith("year=")
    ]
    assert year_dirs
    assert any(
        d.startswith("month=")
        for y in year_dirs
        for d in os.listdir(os.path.join(tables["time"], y))
    )
    # warehouse contents match the engine's view of its own output
    con = duckdb.connect(db_path)
    try:
        for name, path in tables.items():
            got = con.execute(f"SELECT COUNT(*) FROM {name}").fetchone()[0]
            assert got == spark.read.parquet(path).count(), name
    finally:
        con.close()


def test_warehouse_load_refuses_uncommitted_write(spark, tmp_path):
    """No _SUCCESS marker -> the load stage fails (and the runner
    quarantines), instead of loading a torn directory."""
    from event_data_etl_gcs_spark.plans.runner import warehouse_load_stage

    cfg = _config(tmp_path, [_log_row(userId="u1")])
    torn = tmp_path / "out" / "users"
    torn.mkdir(parents=True)
    (torn / "part-00000.parquet").write_bytes(b"not really parquet")
    results = run(
        spark,
        cfg,
        [("load", warehouse_load_stage({"users": str(torn)}, str(tmp_path / "w.db")))],
        quarantine_on_failure=False,
    )
    assert results[0].status == "failed"
    assert "_SUCCESS" in results[0].error
