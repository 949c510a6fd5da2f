#!/usr/bin/env python3
"""Round-10 probe: HTML extraction at 100x (ledger in SCALE_r10.md).

Claim under test: extract_text is MAP-ONLY — cost strictly linear in
input bytes, zero shuffle at any corpus size (the plan pin in
tests/test_html_extract.py asserts no Exchange; this probe measures the
wall-clock consequence at 100x documents).

Probe honesty (r7 lesson): the timed run aggregates EVERY output column
(xxhash64 mod-prime over ids, counters, and text_clean), so the string
pipeline cannot be pruned out of the measurement.
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

    from event_data_etl_gcs_spark.queries.html import extract_frame
    from event_data_etl_gcs_spark.session import get_spark

    spark = get_spark(app_name="html_extract_probe_r10")
    sf01 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    x100 = spark.read.parquet(f"{X100}/documents.parquet")

    def run(label, docs):
        t0 = time.time()
        r = (
            extract_frame(docs)
            .agg(
                F.count("*").alias("n"),
                F.sum(
                    F.pmod(
                        F.xxhash64(
                            "doc_id", "source", "n_blocks", "n_blocks_kept",
                            "n_chars_html", "n_chars_text", "text_clean",
                        ),
                        F.lit(1_000_000_007),
                    )
                ).alias("h"),
                F.sum("n_chars_html").alias("ch"),
                F.sum("n_chars_text").alias("ct"),
            )
            .collect()[0]
        )
        dt = time.time() - t0
        print(
            f"| {label} | {dt:.2f} s | docs={r['n']:,} "
            f"chars {r['ct']:,}/{r['ch']:,} retained | h={r['h']} |",
            flush=True,
        )
        return dt

    print("| corpus | wall | result | checksum |")
    print("|---|---|---|---|")
    t1 = run("1x (sf0.1, 5k docs)", sf01)
    t1 = min(t1, run("1x repeat (warm)", sf01))
    t2 = run("100x (500k docs)", x100)
    print(
        f"\nscale ratio: {t2 / t1:.1f}x wall for 100x docs (map-only — "
        "the gap from 100x is fixed task overhead amortizing out)",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
