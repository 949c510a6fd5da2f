#!/usr/bin/env python3
"""Capture .explain("formatted") for every benched query into
plans/r13/<query>_<tag>.txt (tag = before/after, argv[1])."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
)

import bench  # noqa: E402
from event_data_etl_gcs_spark.queries import all_queries  # noqa: E402
from event_data_etl_gcs_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = list(dict.fromkeys(bench.BENCH_QUERIES + bench.BENCH_EXTENDED))
    if len(sys.argv) > 2:
        names = sys.argv[2].split(",")
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name="capture-plans-r13")
    specs = all_queries()
    for name in names:
        df = specs[name].fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{TAG}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
