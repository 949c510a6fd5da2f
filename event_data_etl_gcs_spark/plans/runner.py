"""Pipeline runner: the engine-native replacement for the reference's
Airflow orchestration layer (SURVEY.md §2.8, O1-O6).

The reference delegated lifecycle concerns to Cloud Composer:
  O1 parameterized trigger  -> RunConfig dataclass (vs REST conf dict)
  O2 ephemeral clusters     -> out of library scope (cluster-agnostic code)
  O3 templated job args     -> RunConfig fields
  O4 post-load cleanup      -> cleanup_transformed()
  O5 failure quarantine     -> quarantine-on-failure in run()
                               (vs `gsutil mv raw/ failed/`,
                               dags/sparkify_dag.py:137-143)
  O6 task DAG wiring        -> ordered stage list with per-stage status

Engine-level improvements over shelling out to gsutil:
  * corrupt rows are split to a dead-letter path DURING the run
    (PERMISSIVE read, sources/json_source.py) — a bad record doesn't
    poison the batch, and a failed batch quarantines only its inputs.
  * loads are gated on Spark's _SUCCESS marker files, the object-store
    equivalent of transactional visibility for directory outputs.
"""

from __future__ import annotations

import os
import shutil
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass
class RunConfig:
    raw_dir: str
    output_dir: str
    failed_dir: str
    run_id: str = field(default_factory=lambda: f"run-{int(time.time())}")


@dataclass
class StageResult:
    name: str
    status: str  # ok | failed | skipped
    error: str | None = None
    seconds: float = 0.0


Stage = tuple[str, Callable[[SparkSession, RunConfig], None]]


def run(
    spark: SparkSession,
    config: RunConfig,
    stages: list[Stage],
    quarantine_on_failure: bool = True,
) -> list[StageResult]:
    """Execute stages in order; on the first failure, skip the rest and
    (optionally) quarantine the raw inputs to failed_dir/<run_id>/."""
    results: list[StageResult] = []
    failed = False
    for name, fn in stages:
        if failed:
            results.append(StageResult(name, "skipped"))
            continue
        t0 = time.perf_counter()
        try:
            fn(spark, config)
            results.append(StageResult(name, "ok", seconds=round(time.perf_counter() - t0, 3)))
        except Exception as e:  # noqa: BLE001 — runner boundary
            results.append(
                StageResult(name, "failed", error=f"{type(e).__name__}: {e}",
                            seconds=round(time.perf_counter() - t0, 3))
            )
            failed = True
    if failed and quarantine_on_failure:
        quarantine_raw(config)
    return results


def quarantine_raw(config: RunConfig) -> str:
    """O5: move the raw inputs aside so a retry can't double-process and a
    human can inspect — the dead-letter pattern."""
    dest = os.path.join(config.failed_dir, config.run_id)
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    shutil.move(config.raw_dir, dest)
    return dest


def cleanup_transformed(config: RunConfig) -> None:
    """O4: idempotent re-run hygiene — drop intermediate outputs after a
    successful downstream load."""
    if os.path.exists(config.output_dir):
        shutil.rmtree(config.output_dir)


def is_load_ready(table_path: str) -> bool:
    """_SUCCESS-gated loads: only consume directory outputs whose write
    committed (the engine-level form of `max_bad_records=0` strictness)."""
    return os.path.exists(os.path.join(table_path, "_SUCCESS"))


def warehouse_load_stage(
    tables: dict[str, str], db_path: str
) -> Callable[[SparkSession, RunConfig], None]:
    """S9 analog: the warehouse-load task of the reference DAG
    (dags/sparkify_dag.py:102-120 loads the written Parquet into a second
    engine) as a runner stage — here the warehouse is DuckDB, so the
    stage runs anywhere with no cloud dependency.

    Each table load is gated on the _SUCCESS marker (the strict
    `max_bad_records=0` posture): an uncommitted write fails the stage,
    which quarantines the batch instead of loading partial data. Loads
    are CREATE OR REPLACE — idempotent on re-run, matching the
    WRITE_TRUNCATE disposition of the reference's load task."""

    def _stage(spark: SparkSession, config: RunConfig) -> None:
        import duckdb

        con = duckdb.connect(db_path)
        try:
            for name, path in tables.items():
                if not is_load_ready(path):
                    raise RuntimeError(
                        f"warehouse load: {name} at {path} has no _SUCCESS "
                        "marker; refusing to load an uncommitted write"
                    )
                con.execute(
                    f"CREATE OR REPLACE TABLE {name} AS "
                    f"SELECT * FROM read_parquet('{path}/**/*.parquet', "
                    "hive_partitioning = true)"
                )
        finally:
            con.close()

    return _stage
