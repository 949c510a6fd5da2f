#!/usr/bin/env python3
"""Round-9 probe: LM-gated ingest per-delivery cost at 100x corpus.

Claim under test (SCALE_r9.md §6): per-delivery cost is the batch's
own explode + one scoring join against VOCABULARY-BOUND state — it
must stay flat as deliveries accumulate, modulo the partial-count
merge-read term that counts_merge compaction caps. The probe drains
the 100x realistic corpus (500k docs, 100x vocabulary — the
model-heavy worst case) in 10 deliveries of 50k docs, timing each
ingest+gate increment, then compacts and times one more delivery.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

X100 = "/tmp/spark_graft_scale_r3/x100"
N_DELIVERIES = 10
THRESHOLD = 1e6  # generous: gate passes most docs; cost is identical


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    import shutil

    from pyspark.sql import functions as F

    from event_data_etl_gcs_spark.session import get_spark
    from event_data_etl_gcs_spark.streaming.compaction import (
        compact_batch_state,
        counts_merge,
    )
    from event_data_etl_gcs_spark.streaming.lm_bigram import (
        lm_gated_ingest_batch,
        read_accepted,
    )

    spark = get_spark(app_name="lm_gate_probe_r9")
    if not os.path.exists(f"{X100}/documents.parquet/_SUCCESS"):
        from scale_probe_r3 import synthesize

        synthesize(spark)
    raw = spark.read.parquet(f"{X100}/documents.parquet").withColumn(
        "text",
        F.array_join(
            F.expr(
                "transform(split(text, ' '), t -> "
                "concat(t, '_', CAST(doc_id div 1000000 AS STRING)))"
            ),
            " ",
        ),
    )
    bounds = raw.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
    lo, hi = bounds[0], bounds[1] + 1
    step = (hi - lo + N_DELIVERIES - 1) // N_DELIVERIES
    state = "/tmp/spark_graft_lm_gate_probe"
    shutil.rmtree(state, ignore_errors=True)

    print("| delivery | docs | wall | accepted (cum) |")
    print("|---|---|---|---|")
    walls = []
    for b in range(N_DELIVERIES):
        batch = raw.filter(
            (F.col("doc_id") >= lo + b * step)
            & (F.col("doc_id") < lo + (b + 1) * step)
        )
        t0 = time.time()
        lm_gated_ingest_batch(batch, b, state, THRESHOLD)
        dt = time.time() - t0
        walls.append(dt)
        n_acc = read_accepted(spark, state).count()
        n_batch = batch.count()
        print(f"| {b} | {n_batch:,} | {dt:.2f} s | {n_acc:,} |", flush=True)

    t0 = time.time()
    for sub, keys in (("uni", ("tok",)), ("bi", ("prev", "cur"))):
        compact_batch_state(
            spark, os.path.join(state, sub), merge=counts_merge(*keys)
        )
    t_compact = time.time() - t0
    # one more delivery after compaction: the corpus is exhausted, so
    # re-time the LAST slice as a replay-shaped increment
    t0 = time.time()
    last = raw.filter(
        (F.col("doc_id") >= lo + (N_DELIVERIES - 1) * step)
        & (F.col("doc_id") < lo + N_DELIVERIES * step)
    )
    lm_gated_ingest_batch(last, N_DELIVERIES - 1, state, THRESHOLD)
    t_after = time.time() - t0
    print(
        f"\nfirst delivery {walls[0]:.2f} s, last {walls[-1]:.2f} s "
        f"(ratio {walls[-1] / walls[0]:.2f}); compaction {t_compact:.2f} s; "
        f"same-size delivery after compaction {t_after:.2f} s",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
