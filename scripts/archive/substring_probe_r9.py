#!/usr/bin/env python3
"""Round-9 probe: exact substring dedup at 100x (ledger in SCALE_r9.md).

The claim under test is EXPLODE-BOUND, NOT PAIR-BOUND cost: every stage
of substring_dedup_frame is linear in gram OCCURRENCES (the dup-gram
equi-join emits one row per occurrence of a duplicated gram — never one
row per document pair). The two corpora stress the two extremes:

* 100x replicas (500k docs, 100 exact copies each): the shape that is
  INFEASIBLE for the incremental containment index (pair-bound, >78 GB
  spill documented in SCALE_r8.md). Here every gram is duplicated, so
  hits == every gram occurrence — the worst case is exactly
  token-linear, and the probe proves the operator survives the corpus
  containment could not.
* 100x realistic (copy-suffixed tokens, 1x dup-rate): the production
  scale-up — 100x data, same duplication density as sf0.1.

Probe honesty: the timed run aggregates EVERY output column (xxhash64
mod-prime over doc_id/source/counts/text_clean), so the string rebuild
cannot be pruned out of the measurement (r7 lesson a).
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

    from event_data_etl_gcs_spark.queries.substring_dedup import (
        substring_dedup_frame,
    )
    from event_data_etl_gcs_spark.session import get_spark

    spark = get_spark(app_name="substring_probe_r9")
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

    def run(label, docs):
        t0 = time.time()
        r = (
            substring_dedup_frame(docs)
            .agg(
                F.count("*").alias("n"),
                F.sum(
                    F.pmod(
                        F.xxhash64(
                            "doc_id", "source", "n_tokens", "n_hits",
                            "n_removed", "text_clean",
                        ),
                        F.lit(1_000_000_007),
                    )
                ).alias("h"),
                F.sum("n_removed").alias("rm"),
                F.sum("n_tokens").alias("nt"),
            )
            .collect()[0]
        )
        dt = time.time() - t0
        print(
            f"| {label} | {dt:.2f} s | docs={r['n']:,} "
            f"removed={r['rm']:,}/{r['nt']:,} tokens | h={r['h']} |",
            flush=True,
        )
        return dt, r

    print("| corpus | wall | result | checksum |")
    print("|---|---|---|---|")
    t1, _ = run("1x (sf0.1, 5k docs)", sf01)
    t2, _ = run("100x realistic (500k docs, 1x dup-rate)", real100)
    t3, r3 = run("100x replicas (500k docs, every gram duplicated)", raw)
    print(
        f"\nscale ratio realistic/1x: {t2 / t1:.1f}x wall for 100x docs; "
        f"replica worst case {t3 / t1:.1f}x (token-linear even with 100 "
        "copies of every doc)",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
