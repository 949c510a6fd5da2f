#!/usr/bin/env python3
"""Round-8 probe: training_corpus v4 (with the containment stage) vs v3
at 1x (sf0.1, 5k docs) and 100x (the r3 replication, 500k docs).

What the numbers must show: the containment stage's marginal cost sits
AFTER exact dedup, so at 100x it runs over the ~5k distinct surviving
texts — the stage's cost must be roughly scale-invariant and the
v4/v3 wall ratio modest. Output columns are fully aggregated (probe
honesty). Ledger rows go to SCALE_r8.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

X100 = "/tmp/spark_graft_scale_r3/x100"
SRC = "/root/testdata/sf0.1"
RUNS = int(os.environ.get("SCALE_PROBE_RUNS", "2"))


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    from pyspark.sql import functions as F

    from event_data_etl_gcs_spark.queries.corpus_v3 import (
        training_corpus_v3_select,
        training_corpus_v4_select,
    )
    from event_data_etl_gcs_spark.session import get_spark

    spark = get_spark(app_name="corpus_v4_probe_r8")
    rows = []
    for label, fn, path in [
        ("v3 1x (sf0.1)", training_corpus_v3_select, SRC),
        ("v4 1x (sf0.1)", training_corpus_v4_select, SRC),
        ("v3 100x", training_corpus_v3_select, X100),
        ("v4 100x", training_corpus_v4_select, X100),
    ]:
        best, out = None, None
        for _ in range(RUNS):
            t0 = time.time()
            r = (
                fn(spark, path)
                .agg(
                    F.count("*").alias("n"),
                    F.sum("mean_lr").alias("slr"),
                    F.sum("n_tokens").alias("st"),
                    F.sum(F.col("doc_id") * F.col("rk")).alias("sx"),
                )
                .collect()[0]
            )
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            out = f"n={r['n']} sum_lr={r['slr']:.4f} sum_tok={r['st']}"
        rows.append((label, best, out))
        print(rows[-1], flush=True)
    spark.stop()
    print("\n| pipeline | wall (min of %d) | selected |" % RUNS)
    print("|---|---|---|")
    for label, best, out in rows:
        print(f"| {label} | {best:.2f} s | {out} |")


if __name__ == "__main__":
    main()
