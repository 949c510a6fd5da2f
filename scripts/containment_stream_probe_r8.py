#!/usr/bin/env python3
"""Round-8 probe (VERDICT r7 #4): streamed==batch parity for the
incremental containment index at the 100x replica corpus, ledger-style
(the containment sibling of stream_ingest_probe_r7).

Corpus: the r3 100x replication (500k docs, 100 exact text replicas
per original) drained in 4 deliveries of 125k through
containment_check_batch. The pin: the union of per-delivery pair
emissions equals the one-shot batch containment_pairs build — compared
by count + order-free xxhash64 checksum over ALL columns of all ~54.6M
pairs (probe honesty), not a sample.

Honest cost note (expected, documented in SCALE_r7.md): the
incremental form CANNOT collapse identical sets (collapse keys depend
on full-corpus membership — emission would become batch-dependent), so
on a replica-heavy corpus it verifies every member pair individually
where the batch build verifies reps and expands. Per-delivery wall is
reported so that growth is visible.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

X100 = "/tmp/spark_graft_scale_r3/x100"
WORK = "/tmp/spark_graft_scale_r8_contain"
N_BATCHES = 4


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    from pyspark.sql import functions as F

    from event_data_etl_gcs_spark.operators.dedup import containment_pairs
    from event_data_etl_gcs_spark.session import get_spark
    from event_data_etl_gcs_spark.streaming.neardedup import (
        containment_check_batch,
    )

    spark = get_spark(app_name="containment_stream_probe_r8")
    docs = spark.read.parquet(f"{X100}/documents.parquet")
    n = docs.count()

    def checksum(df):
        r = df.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("id_a", "id_b", "containment")).alias("h"),
        ).collect()[0]
        return r["n"], r["h"]

    # one-shot batch build (collapse-on default)
    t0 = time.time()
    want = checksum(containment_pairs(docs))
    t_batch = time.time() - t0
    print(f"batch build: {t_batch:.2f} s, pairs={want[0]:,}", flush=True)

    # incremental drain: 4 doc_id-ordered deliveries
    shutil.rmtree(WORK, ignore_errors=True)
    state = os.path.join(WORK, "state")
    pairs_path = os.path.join(WORK, "pairs")
    ids = docs.select("doc_id")
    bounds = [
        r[0]
        for r in ids.agg(
            *[
                F.expr(f"percentile_approx(doc_id, {i / N_BATCHES}, 10000)")
                .alias(f"p{i}")
                for i in range(1, N_BATCHES)
            ]
        ).collect()[0]
    ]
    cuts = [None] + bounds + [None]
    walls = []
    for b in range(N_BATCHES):
        lo, hi = cuts[b], cuts[b + 1]
        part = docs
        if lo is not None:
            part = part.filter(F.col("doc_id") > lo)
        if hi is not None:
            part = part.filter(F.col("doc_id") <= hi)
        t0 = time.time()
        containment_check_batch(part, state, pairs_path, b)
        walls.append(time.time() - t0)
        print(f"delivery {b}: {walls[-1]:.2f} s", flush=True)

    got = checksum(spark.read.parquet(pairs_path))
    ok = got == want
    print(f"parity: streamed={got} batch={want} -> {'MATCH' if ok else 'MISMATCH'}")
    assert ok, "streamed pair set != batch pair set"
    spark.stop()
    print("\n| probe | result |")
    print("|---|---|")
    print(f"| batch containment build 100x (500k docs) | {t_batch:.2f} s, {want[0]:,} pairs |")
    print(
        "| incremental drain, 4 deliveries | "
        + ", ".join(f"{w:.1f} s" for w in walls)
        + " |"
    )
    print(f"| streamed == batch checksum over all pairs | {'MATCH' if ok else 'MISMATCH'} |")
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
