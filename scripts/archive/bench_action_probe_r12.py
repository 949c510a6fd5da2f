#!/usr/bin/env python3
"""Round-12 one-shot probe (VERDICT r11 #1): quantify the bench-action
discontinuity — per headline query at sf0.1, min-of-3 wall with the
OLD prunable count() action vs the NEW checksum-fold action bench.py
now uses. Backs the old-vs-new attribution table in BUILDER_NOTES.md
(round 12); archived immediately per the scripts/archive convention."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from bench import BENCH_QUERIES, force_result  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from event_data_etl_gcs_spark.queries import all_queries
    from event_data_etl_gcs_spark.session import get_spark

    spark = get_spark(
        app_name="bench-action-probe",
        extra_conf={"spark.sql.files.maxPartitionBytes": "4m"},
    )
    specs = all_queries()
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()

    out = {}
    for name in BENCH_QUERIES:
        spec = specs[name]
        runs = {"count": [], "fold": []}
        for action, fn in (
            ("count", lambda df: df.count()),
            ("fold", force_result),
        ):
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spec.fn(spark, SF_DIR))
                runs[action].append(round(time.perf_counter() - t0, 3))
        out[name] = {
            "count_min": min(runs["count"]),
            "fold_min": min(runs["fold"]),
            "ratio": round(min(runs["fold"]) / max(min(runs["count"]), 1e-9), 2),
            "spread": runs,
        }
    print(json.dumps({
        "sf_dir": SF_DIR,
        "load": [round(x, 2) for x in os.getloadavg()],
        "queries": out,
        "count_total": round(sum(v["count_min"] for v in out.values()), 3),
        "fold_total": round(sum(v["fold_min"] for v in out.values()), 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
