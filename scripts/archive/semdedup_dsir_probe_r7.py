#!/usr/bin/env python3
"""Round-7 scale probe, part 2: SemDeDup and the LM-curation scores at
100x.

* semdedup_pairs on the realistic Gaussian-mixture 200k corpus
  (seed-42, 64-dim), k auto-derived (n / 4096 ~ 49 clusters): the
  cluster-local blocked-matmul pass must keep the wall flat while the
  candidate space is sum |c|^2 ~ 0.8B.
* semdedup_pairs on the duplicate-heavy 100x replica embeddings
  (200k rows, 100 copies each of 2k vectors): collapse_identical must
  keep the quadratic work on DISTINCT vectors.
* unigram_surprisal_scores + dsir_importance_weights on the 100x
  documents corpus (500k docs): both are explode -> aggregate -> join
  plans that should scale linearly.

Output: ledger rows for SCALE_r7.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GAUSS = "/tmp/spark_graft_scale_r6/gauss200000.parquet"
X100 = "/tmp/spark_graft_scale_r3/x100"
SRC = "/root/testdata/sf0.1"
RUNS = int(os.environ.get("SCALE_PROBE_RUNS", "2"))


def timed(fn, runs=RUNS):
    best, n = None, None
    for _ in range(runs):
        t0 = time.time()
        n = fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best, n


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    from event_data_etl_gcs_spark.operators.clustering import semdedup_pairs
    from event_data_etl_gcs_spark.queries.lm_quality import (
        _dsir_weights,
        unigram_surprisal_scores,
    )
    from event_data_etl_gcs_spark.session import get_spark

    spark = get_spark(app_name="semdedup_dsir_probe_r7")
    rows = []

    emb1 = spark.read.parquet(f"{SRC}/embeddings.parquet")
    best, n = timed(lambda: semdedup_pairs(emb1).count())
    rows.append(("semdedup_pairs 1x (5k, k=8)", best, n))
    print(rows[-1], flush=True)

    gauss = spark.read.parquet(GAUSS)
    best, n = timed(lambda: semdedup_pairs(gauss, k=None, n_iter=2).count())
    rows.append(("semdedup_pairs gauss200k (k auto=49, lloyd=2)", best, n))
    print(rows[-1], flush=True)

    embx = spark.read.parquet(f"{X100}/embeddings.parquet")
    best, n = timed(lambda: semdedup_pairs(embx, k=None).count())
    rows.append(("semdedup_pairs 100x replicas (200k)", best, n))
    print(rows[-1], flush=True)

    best, n = timed(lambda: unigram_surprisal_scores(spark, SRC).count())
    rows.append(("unigram_surprisal 1x (5k docs)", best, n))
    print(rows[-1], flush=True)
    best, n = timed(lambda: unigram_surprisal_scores(spark, X100).count())
    rows.append(("unigram_surprisal 100x (500k docs)", best, n))
    print(rows[-1], flush=True)

    best, n = timed(lambda: _dsir_weights(spark, SRC).count())
    rows.append(("dsir_weights 1x (5k docs)", best, n))
    print(rows[-1], flush=True)
    best, n = timed(lambda: _dsir_weights(spark, X100).count())
    rows.append(("dsir_weights 100x (500k docs)", best, n))
    print(rows[-1], flush=True)

    spark.stop()
    print("\n| probe | wall (min of %d) | rows |" % RUNS)
    print("|---|---|---|")
    for label, best, n in rows:
        print(f"| {label} | {best:.2f} s | {n:,} |")


if __name__ == "__main__":
    main()
