#!/usr/bin/env python3
"""Round-8 probe (VERDICT r7 #4): streamed==batch parity for the
incremental containment index at scale, ledger-style (the containment
sibling of stream_ingest_probe_r7).

Two corpora, two different questions:

* **10x replica corpus** (50k docs = the first 10 copies of the r3
  replication, 100->10 exact text replicas per original): the
  ADVERSARIAL duplication shape. The incremental form cannot collapse
  identical sets (collapse keys depend on full-corpus membership —
  emission would become batch-dependent), so every replica probes full
  posting lists; r7 already capped the collapse-off batch build at 10x
  for exactly this reason. A first attempt at 100x replicas spilled
  past the machine's 78 GB of free disk in delivery 1 — that shape is
  the DOCUMENTED hazard (SCALE_r7.md: "collapse off at 100x is the
  hazard, not a measurement"), and the incremental index carries the
  same contract: replica-heavy backlogs belong in the batch build
  (collapse-on) with the incremental index taking over at the clean
  frontier.

* **100x realistic corpus** (500k docs: the r3 replication with every
  token made copy-specific, so copies are fully DISTINCT documents and
  the dup-rate per 5k block equals sf0.1): the scale-up question —
  100x the data at 1x the duplication. This is the shape a production
  ingest actually sees, and the per-delivery walls show the growth
  trend of the index join.

The pin in both cases: the union of per-delivery pair emissions equals
the one-shot batch containment_pairs build — count + order-free
mod-prime xxhash64 checksum over ALL columns of every pair (probe
honesty), not a sample.
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
    raw = spark.read.parquet(f"{X100}/documents.parquet")

    rep10 = raw.filter(F.col("doc_id") < 10_000_000)
    # realistic 100x: every token suffixed with its copy id -> copies are
    # fully distinct docs; per-copy dup structure equals sf0.1
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

    def checksum(df):
        # pmod before summing: raw xxhash64 sums overflow ANSI int64
        r = df.agg(
            F.count("*").alias("n"),
            F.sum(
                F.pmod(
                    F.xxhash64("id_a", "id_b", "containment"),
                    F.lit(1_000_000_007),
                )
            ).alias("h"),
        ).collect()[0]
        return r["n"], r["h"]

    ledger = []
    for label, docs in [("10x replicas (50k docs)", rep10),
                        ("100x realistic (500k docs)", real100)]:
        docs = docs.localCheckpoint(eager=True)
        t0 = time.time()
        want = checksum(containment_pairs(docs))
        t_batch = time.time() - t0
        print(f"{label} batch build: {t_batch:.2f} s, pairs={want[0]:,}",
              flush=True)

        shutil.rmtree(WORK, ignore_errors=True)
        state = os.path.join(WORK, "state")
        pairs_path = os.path.join(WORK, "pairs")
        bounds = list(
            docs.agg(
                *[
                    F.expr(
                        f"percentile_approx(doc_id, {i / N_BATCHES}, 10000)"
                    ).alias(f"p{i}")
                    for i in range(1, N_BATCHES)
                ]
            ).collect()[0]
        )
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
            print(f"  delivery {b}: {walls[-1]:.2f} s", flush=True)

        got = checksum(spark.read.parquet(pairs_path))
        ok = got == want
        print(f"  parity: streamed={got} batch={want} -> "
              f"{'MATCH' if ok else 'MISMATCH'}", flush=True)
        assert ok, f"{label}: streamed pair set != batch pair set"
        ledger.append((label, t_batch, want[0], walls, ok))
        shutil.rmtree(WORK, ignore_errors=True)

    spark.stop()
    print("\n| corpus | batch build | pairs | per-delivery walls | parity |")
    print("|---|---|---|---|---|")
    for label, tb, n, walls, ok in ledger:
        print(
            f"| {label} | {tb:.2f} s | {n:,} | "
            + ", ".join(f"{w:.1f} s" for w in walls)
            + f" | {'MATCH' if ok else 'MISMATCH'} |"
        )


if __name__ == "__main__":
    main()
