#!/usr/bin/env python3
"""Round-7 scale probe: dedup_containment (prefix-filtered shingle
containment) at 1x (sf0.1, 5k docs) vs 100x (500k docs, 100 exact
replicas per text — the duplicate-heavy worst case for a probe join,
since every replica would probe identical prefixes).

What the numbers must show: with collapse_identical (default), prefix
filtering runs over the ~5k DISTINCT sets regardless of replication —
the 100x wall should be dominated by the OUTPUT expansion (the pair
contract is inherently quadratic in dup-group size: 5k groups x
100x99 ordered member pairs ~ 49.5M rows), not by candidate explosion.
The collapse-off build at 100x is the hazard being avoided; it is
measured at 10x only (its probe join is quadratic in replication).

Output: appended ledger rows printed to stdout; copy into SCALE_r7.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/tmp/spark_graft_scale_r3"
SRC = "/root/testdata/sf0.1"
RUNS = int(os.environ.get("SCALE_PROBE_RUNS", "2"))


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    from event_data_etl_gcs_spark.operators.dedup import containment_pairs
    from event_data_etl_gcs_spark.session import get_spark

    spark = get_spark(app_name="scale_probe_r7")
    rows = []
    for label, path, collapse in [
        ("1x collapse=on", SRC, True),
        ("1x collapse=off", SRC, False),
        ("100x collapse=on", f"{BASE}/x100", True),
    ]:
        docs = spark.read.parquet(f"{path}/documents.parquet")
        best, n = None, None
        for _ in range(RUNS):
            t0 = time.time()
            n = containment_pairs(docs, collapse_identical=collapse).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        rows.append((label, best, n))
        print(f"{label:20s} {best:8.2f}s  {n} pairs", flush=True)
    spark.stop()
    print("\n| corpus | wall (min of %d) | pairs |" % RUNS)
    print("|---|---|---|")
    for label, best, n in rows:
        print(f"| {label} | {best:.2f} s | {n:,} |")


if __name__ == "__main__":
    main()
