#!/usr/bin/env python3
"""Vanilla-session probe: run every priority-listed query under a bare
``SparkSession.builder.master("local[N]").getOrCreate()`` — NO engine
config — exactly the way the correctness driver builds its session.

This is the failure class that went red in round 2 (TIMESTAMP_NTZ at
the catalog seam): queries that pass the pytest suite (engine session)
can still fail on a driver session if any required conf isn't pinned at
load time by ``sources/catalog``.

Round 11: the probe runs in CHUNKS of fresh bare processes (default 64
queries per session). A single bare 1 GiB local JVM — whose driver heap
also hosts executor storage in local mode — cannot endure ~190
sequential queries' retained blocks (localCheckpoint storage, broadcast
task binaries, codegen classes; the weak-ref ContextCleaner reaps them
slower than they accrue; ``spark.catalog.clearCache()`` cannot reach
checkpoint blocks). Measured: a driver ``OutOfMemoryError`` on query
#189 with every query individually green on a fresh bare session. The
probe's subject is the CONFIG seam, and the real correctness driver
runs ~50 queries per session, so bounded fresh-session chunks are the
FAITHFUL simulation — each chunk is still a completely vanilla builder.

Exit code 0 = every probed query ran and returned a schema + count.
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_PROBE_SF", "/root/testdata/sf0.001")
CHUNK = int(os.environ.get("SPARK_GRAFT_PROBE_CHUNK", "64"))


def run_slice(lo: int, hi: int) -> int:
    """Run _PRIORITY[lo:hi] in THIS process's bare session."""
    import gc

    from pyspark.sql import SparkSession

    from event_data_etl_gcs_spark.operators.graph import release_ann_caches
    from event_data_etl_gcs_spark.queries import all_queries
    from event_data_etl_gcs_spark.queries.registry import _PRIORITY

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    specs = all_queries()
    failed: list[tuple[str, str]] = []
    for name in _PRIORITY[lo:hi]:
        try:
            df = specs[name].fn(spark, SF)
            n = df.count()
            assert len(df.schema.fields) > 0
            print(f"ok   {name} ({n} rows)", flush=True)
            # within-chunk hygiene: drop refs eagerly so the cleaner can
            # reap between queries (see module docstring)
            del df
            gc.collect()
            spark.catalog.clearCache()
            release_ann_caches(all_threads=True)
            # Python gc drops py4j refs but never triggers a JVM GC; the
            # BlockManager holds checkpoint/broadcast blocks STRONGLY
            # until ContextCleaner processes the weak refs a JVM GC
            # enqueues — nudge one so the cleaner can drain between
            # queries instead of lagging into an OOM mid-allocation.
            spark.sparkContext._jvm.System.gc()
            import time

            time.sleep(0.2)
        except Exception as e:  # noqa: BLE001 — report, don't abort
            # keep the first CAUSE line too: py4j's first line is just
            # "An error occurred while calling oN.count"
            lines = [ln for ln in str(e).splitlines() if ln.strip()]
            cause = next(
                (ln.strip()[:200] for ln in lines[1:] if ":" in ln), ""
            )
            failed.append(
                (name, lines[0][:160] + (" | " + cause if cause else ""))
            )
            print(f"FAIL {name}: {failed[-1][1]}", flush=True)
    spark.stop()
    if failed:
        print(f"CHUNK_FAILED {len(failed)}")
        return 1
    return 0


def main() -> int:
    from event_data_etl_gcs_spark.queries.registry import _PRIORITY

    n = len(_PRIORITY)
    rc = 0
    for lo in range(0, n, CHUNK):
        hi = min(lo + CHUNK, n)
        print(f"--- chunk {lo}:{hi} (fresh bare session) ---", flush=True)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--slice", str(lo), str(hi)],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        rc |= proc.returncode
    if rc:
        print(f"\nvanilla probe FAILED (see chunk output above; {n} queries)")
        return 1
    print(f"\nall {n} priority queries green on vanilla sessions")
    return 0


if __name__ == "__main__":
    if len(sys.argv) == 4 and sys.argv[1] == "--slice":
        raise SystemExit(run_slice(int(sys.argv[2]), int(sys.argv[3])))
    raise SystemExit(main())
