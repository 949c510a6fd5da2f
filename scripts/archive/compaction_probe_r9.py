#!/usr/bin/env python3
"""Round-9 probe: streaming-state compaction (ledger in SCALE_r9.md §4).

The claim under test: WITHOUT compaction the per-delivery cost of the
streaming substring index grows with the NUMBER OF DELIVERIES — each
increment's merge-read opens every batch_id partition written so far
and re-reduces all delivered postings partials — while WITH periodic
compaction the merge-read stays distinct-gram-bound and per-delivery
wall stays flat. Per-delivery work is otherwise constant by
construction (equal-sized document slices), so any growth isolates the
state-read term.

Methodology: sf0.1 documents (5k docs) in 50 deliveries of 100 docs;
twin runs share the slicing. Run A never compacts; run B folds the
postings every 8 deliveries (the substring runner's compact_every
posture). Reported: mean wall of the first and last 10 deliveries,
total wall, final postings file count, and a final standalone
merge-read (dup-set count) on each state — plus the bit-equality of
both runs' cleaned outputs, asserted, so the speed claim can't hide a
correctness drift.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BATCHES = 50
COMPACT_EVERY = 8


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from event_data_etl_gcs_spark.session import get_spark
    from event_data_etl_gcs_spark.streaming.compaction import (
        compact_batch_state,
        postings_merge,
    )
    from event_data_etl_gcs_spark.streaming.substring import (
        read_streamed_clean,
        substring_ingest_batch,
    )

    spark = get_spark(app_name="compaction_probe_r9")
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n = docs.count()
    cut = [round(i * n / N_BATCHES) for i in range(N_BATCHES + 1)]
    work = tempfile.mkdtemp(prefix="compact_probe_")

    def run(label: str, compact_every: int | None) -> tuple[list[float], str]:
        idx = os.path.join(work, label)
        walls = []
        for i, (lo, hi) in enumerate(zip(cut, cut[1:])):
            batch = docs.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            )
            t0 = time.time()
            substring_ingest_batch(batch, i, idx)
            if compact_every and (i + 1) % compact_every == 0:
                compact_batch_state(
                    spark, os.path.join(idx, "postings"), merge=postings_merge
                )
            walls.append(time.time() - t0)
        post = os.path.join(idx, "postings")
        n_files = sum(len(fs) for _, _, fs in os.walk(post))
        t0 = time.time()
        n_dup = (
            spark.read.parquet(post)
            .groupBy("gram")
            .agg(F.min("lo").alias("lo"), F.max("hi").alias("hi"))
            .filter("lo <> hi")
            .count()
        )
        read_wall = time.time() - t0
        head = sum(walls[:10]) / 10
        tail = sum(walls[-10:]) / 10
        print(
            f"{label}: total {sum(walls):.1f}s | per-delivery mean "
            f"first10 {head:.2f}s -> last10 {tail:.2f}s | postings files "
            f"{n_files} | final merge-read {read_wall:.2f}s "
            f"({n_dup} dup grams)",
            flush=True,
        )
        return walls, idx

    _, idx_a = run("no_compaction", None)
    _, idx_b = run(f"compact_every_{COMPACT_EVERY}", COMPACT_EVERY)

    a = sorted(
        tuple(r) for r in read_streamed_clean(spark, idx_a).collect()
    )
    b = sorted(
        tuple(r) for r in read_streamed_clean(spark, idx_b).collect()
    )
    assert a == b, "compacted run diverged from plain run"
    print(f"cleaned outputs bit-identical across runs: {len(a)} rows")
    shutil.rmtree(work)
    spark.stop()


if __name__ == "__main__":
    main()
