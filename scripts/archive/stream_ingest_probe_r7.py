#!/usr/bin/env python3
"""Round-7 probe: incremental corpus ingest vs re-running the batch
pipeline per delivery, at 100x (500k docs in 10 deliveries of 50k).

Corpus: the r3 100x replication with a copy-specific suffix token
appended, so every replica is TEXT-DISTINCT but still a near-dup of
its original (3-gram Jaccard ~0.9 >> the 0.5 threshold). That routes
every delivery through the FULL incremental path — exact-dedup
anti-join (nothing drops there), signature computation for the
delivery, banded candidate join against the ever-growing signature
index, decontamination — instead of short-circuiting at the hash
index the way pure replicas would.

Measured: per-delivery ingest wall (should stay ~flat: each increment
touches the delivery + the (delivery bands x index bands) equi-join,
never re-hashing history) vs the batch pipeline re-run over the
growing prefix after deliveries 1, 5 and 10 (re-hashes everything,
so per-delivery cost grows with history). Appended to SCALE_r7.md by
hand."""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/tmp/spark_graft_scale_r3/x100"
WORK = "/tmp/spark_graft_scale_r7"
N_BATCHES = 10


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    from pyspark.sql import functions as F

    from event_data_etl_gcs_spark.plans.training_corpus import (
        decontaminate,
        exact_dedup_keep_min,
        near_dedup_keep_min,
        quality_gate,
    )
    from event_data_etl_gcs_spark.session import get_spark
    from event_data_etl_gcs_spark.streaming.corpus import (
        corpus_ingest_batch,
        read_streamed_corpus,
    )

    spark = get_spark(app_name="stream_ingest_probe_r7")
    docs = (
        spark.read.parquet(f"{BASE}/documents.parquet")
        # text-distinct near-dups: copy k appends one token ' vK'
        .withColumn(
            "text",
            F.concat(
                F.col("text"),
                F.lit(" v"),
                (F.col("doc_id") / 1_000_000).cast("long").cast("string"),
            ),
        )
    )
    bench = (
        docs.filter((F.col("doc_id") % 97 == 0) & (F.col("doc_id") < 1_000_000))
        .select("text")
        .localCheckpoint(eager=True)
    )
    # doc_id-ordered deliveries: exact decile cuts over doc_id
    qs = [i / N_BATCHES for i in range(1, N_BATCHES)]
    cuts = docs.approxQuantile("doc_id", qs, 0.0)
    cuts = [float("-inf")] + cuts + [float("inf")]

    idx = f"{WORK}/ingest_idx"
    shutil.rmtree(idx, ignore_errors=True)
    os.makedirs(WORK, exist_ok=True)

    inc_walls = []
    for i in range(N_BATCHES):
        b = docs.filter(
            (F.col("doc_id") > cuts[i]) & (F.col("doc_id") <= cuts[i + 1])
        )
        t0 = time.time()
        corpus_ingest_batch(b, i, idx, bench)
        dt = time.time() - t0
        inc_walls.append(dt)
        print(f"delivery {i}: {dt:6.2f}s", flush=True)
    n_corpus = read_streamed_corpus(spark, idx).count()
    print(f"streamed corpus rows: {n_corpus}", flush=True)

    rebuild_walls = {}
    for k in (1, 5, 10):
        prefix = docs.filter(F.col("doc_id") <= cuts[k])
        t0 = time.time()
        ref = decontaminate(
            near_dedup_keep_min(exact_dedup_keep_min(quality_gate(prefix))),
            bench,
        )
        nk = ref.count()
        rebuild_walls[k] = time.time() - t0
        print(f"rebuild after {k} deliveries: {rebuild_walls[k]:6.2f}s "
              f"({nk} rows)", flush=True)
        if k == 10:
            streamed = read_streamed_corpus(spark, idx).select("doc_id")
            ref_ids = ref.select("doc_id")
            extra = streamed.exceptAll(ref_ids).count()
            missing = ref_ids.exceptAll(streamed).count()
            print(f"equality vs batch: extra={extra} missing={missing}",
                  flush=True)

    print("\nincrement walls:", " ".join(f"{w:.2f}" for w in inc_walls))
    print(f"increment total: {sum(inc_walls):.2f}s; "
          f"rebuild-per-delivery total ~ {rebuild_walls[1]:.1f} + ... + "
          f"{rebuild_walls[10]:.1f} (10 deliveries)")
    spark.stop()


if __name__ == "__main__":
    main()
