#!/usr/bin/env python3
"""Round-9 probe: bigram-LM scoring at 100x (ledger in SCALE_r9.md).

The claim under test: cost is OCCURRENCE-BOUND (explode + model join),
with the model tables bounded by DISTINCT bigrams, not corpus size.
Two 100x corpora stress the two components separately:

* 100x replicas (500k docs, 100 copies of each): distinct-bigram count
  UNCHANGED vs 1x — the model aggregates see 100x input rows but emit
  the same model; probes pure explode/shuffle scaling.
* 100x realistic (copy-suffixed tokens): vocabulary AND corpus scale
  100x — the production scale-up; model join flips broadcast -> SMJ
  when the model outgrows the broadcast threshold, which is the
  at-scale plan documented in PLANS.md.

Probe honesty (r7 lesson): the timed run checksums EVERY output column
(xxhash64 over doc_id/n_bigrams/mean_inv_p/min_bigram_count) so neither
the fold nor the model join can be pruned from the measurement.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

X100 = "/tmp/spark_graft_scale_r3/x100"


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    from pyspark.sql import functions as F

    from event_data_etl_gcs_spark.queries.lm_bigram import bigram_scores
    from event_data_etl_gcs_spark.session import get_spark

    spark = get_spark(app_name="lm_bigram_probe_r9")
    if not os.path.exists(f"{X100}/documents.parquet/_SUCCESS"):
        from scale_probe_r3 import synthesize

        synthesize(spark)
    raw = spark.read.parquet(f"{X100}/documents.parquet")
    real100 = raw.withColumn(
        "text",
        F.array_join(
            F.expr(
                "transform(split(text, ' '), t -> "
                "concat(t, '_', CAST(doc_id div 1000000 AS STRING)))"
            ),
            " ",
        ),
    )
    sf01 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def run(label, docs, n_runs: int = 2):
        best, r = None, None
        for _ in range(n_runs):
            t0 = time.time()
            r = _measure(docs)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(
            f"| {label} | {best:.2f} s | docs={r['n']:,} "
            f"bigrams={r['nb']:,} | h={r['h']} |",
            flush=True,
        )
        return best

    def _measure(docs):
        return (
            bigram_scores(docs)
            .agg(
                F.count("*").alias("n"),
                F.sum(
                    F.pmod(
                        F.xxhash64(
                            "doc_id", "n_bigrams", "mean_inv_p",
                            "min_bigram_count",
                        ),
                        F.lit(1_000_000_007),
                    )
                ).alias("h"),
                F.sum("n_bigrams").alias("nb"),
            )
            .collect()[0]
        )

    # JVM/session warmup so the first timed row isn't startup-dominated
    _measure(sf01.limit(100))

    print("| corpus | wall (min of 2) | result | checksum |")
    print("|---|---|---|---|")
    t1 = run("1x (sf0.1, 5k docs)", sf01)
    t2 = run("100x replicas (500k docs, model size unchanged)", raw)
    t3 = run("100x realistic (500k docs, 100x vocabulary)", real100)
    print(
        f"\nscale ratios vs 1x: replicas {t2 / t1:.1f}x, "
        f"realistic {t3 / t1:.1f}x for 100x docs",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
