#!/usr/bin/env python3
"""Vanilla-session probe: run every priority-listed query under a bare
``SparkSession.builder.master("local[N]").getOrCreate()`` — NO engine
config — exactly the way the correctness driver builds its session.

This is the failure class that went red in round 2 (TIMESTAMP_NTZ at
the catalog seam): queries that pass the pytest suite (engine session)
can still fail on a driver session if any required conf isn't pinned at
load time by ``sources/catalog``. Run this in a FRESH process (one JVM
can't host two differently-configured sessions).

Exit code 0 = every probed query ran and returned a schema + count.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_PROBE_SF", "/root/testdata/sf0.001")


def main() -> int:
    from pyspark.sql import SparkSession

    from event_data_etl_gcs_spark.queries import all_queries
    from event_data_etl_gcs_spark.queries.registry import _PRIORITY

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    specs = all_queries()
    failed: list[tuple[str, str]] = []
    for name in _PRIORITY:
        try:
            df = specs[name].fn(spark, SF)
            n = df.count()
            assert len(df.schema.fields) > 0
            print(f"ok   {name} ({n} rows)")
        except Exception as e:  # noqa: BLE001 — report, don't abort
            failed.append((name, str(e).splitlines()[0][:160]))
            print(f"FAIL {name}: {failed[-1][1]}")
    spark.stop()
    if failed:
        print(f"\n{len(failed)} of {len(_PRIORITY)} priority queries failed "
              "on a vanilla session:")
        for name, msg in failed:
            print(f"  {name}: {msg}")
        return 1
    print(f"\nall {len(_PRIORITY)} priority queries green on a vanilla session")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
