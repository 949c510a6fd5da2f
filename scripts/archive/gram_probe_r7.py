#!/usr/bin/env python3
"""Round-7 Gram-matrix probe: relational fold vs per-partition numpy
partials at 200k and 1M vectors (ledger in SCALE_r7.md).

The history this reproduces: the first partial kernel materialized a
full Arrow batch's n x dim x dim product tensor and was
memory-bandwidth bound (30.7 s / 200k — losing to the fold's 9.9 s);
the shipped kernel tiles 256-row chunks inside the batch (1.14 s /
200k, 2.32 s / 1M). All spellings produce identical integers, so the
comparison is purely about kernel shape.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

G200K = "/tmp/spark_graft_scale_r6/gauss200000.parquet"
G1M = "/tmp/spark_graft_scale_r6/gauss1000000.parquet"
RUNS = int(os.environ.get("SCALE_PROBE_RUNS", "2"))


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    from event_data_etl_gcs_spark.operators.linalg import gram_matrix
    from event_data_etl_gcs_spark.session import get_spark

    spark = get_spark(app_name="gram_probe_r7")
    rows = []
    for label, path, mode in [
        ("gauss200k fold", G200K, "fold"),
        ("gauss200k partial (chunked)", G200K, "partial"),
        ("gauss1M partial (chunked)", G1M, "partial"),
    ]:
        emb = spark.read.parquet(path)
        best, n = None, None
        for _ in range(RUNS):
            t0 = time.time()
            n = gram_matrix(emb, scoring=mode).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        rows.append((label, best, n))
        print(rows[-1], flush=True)
    spark.stop()
    print("\n| probe | wall (min of %d) | entries |" % RUNS)
    print("|---|---|---|")
    for label, best, n in rows:
        print(f"| {label} | {best:.2f} s | {n} |")


if __name__ == "__main__":
    main()
