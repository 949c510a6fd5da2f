#!/usr/bin/env python3
"""Round-7 scale probe, part 3: the second-half text-curation operators
at 1x (sf0.1, 5k docs) vs 100x (500k docs, 100 exact replicas/text).

* segment_dedup_reconstruct — the groupBy(segment) min-struct must
  collapse the 100x-replicated segments map-side (every segment's
  occurrence count multiplies by 100, but the distinct-segment set and
  therefore the shuffle output stay fixed).
* span_decontaminate — the benchmark gram set is fixed; the train-side
  gram explode is 100x rows but map-only; hit marking is doc-local.
* training_corpus_v3_select — the composed pipeline.
* shard_assignment_token_balanced — the distributed prefix-sum
  (map-local windows + a 64-row offsets window) must stay flat.

Output: ledger rows for SCALE_r7.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

X100 = "/tmp/spark_graft_scale_r3/x100"
SRC = "/root/testdata/sf0.1"
RUNS = int(os.environ.get("SCALE_PROBE_RUNS", "2"))


def force(df):
    """Checksum every output column: a bare count() lets Catalyst prune
    the expensive string-rebuild columns (measured: reconstruct 100x
    "ran" in 0.5 s as a count but takes 2.0 s materialized)."""
    from pyspark.sql import functions as F

    aggs = [
        F.sum(F.length(F.col(f.name).cast("string"))).alias(f.name)
        for f in df.schema.fields
    ]
    return df.agg(*aggs).collect()[0][0]


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
    from event_data_etl_gcs_spark.queries.corpus_v3 import (
        training_corpus_v3_select,
    )
    from event_data_etl_gcs_spark.queries.decontam_span import span_decontaminate
    from event_data_etl_gcs_spark.queries.layout import (
        shard_assignment_token_balanced,
    )
    from event_data_etl_gcs_spark.queries.segdedup import (
        segment_dedup_reconstruct,
    )
    from event_data_etl_gcs_spark.session import get_spark

    spark = get_spark(app_name="segdedup_span_probe_r7")
    rows = []
    for label, fn in [
        ("segment_dedup_reconstruct 1x", lambda: force(segment_dedup_reconstruct(spark, SRC))),
        ("segment_dedup_reconstruct 100x", lambda: force(segment_dedup_reconstruct(spark, X100))),
        ("span_decontaminate 1x", lambda: force(span_decontaminate(spark, SRC))),
        ("span_decontaminate 100x", lambda: force(span_decontaminate(spark, X100))),
        ("training_corpus_v3_select 1x", lambda: force(training_corpus_v3_select(spark, SRC))),
        ("training_corpus_v3_select 100x", lambda: force(training_corpus_v3_select(spark, X100))),
        ("shard_assignment 1x", lambda: force(shard_assignment_token_balanced(spark, SRC))),
        ("shard_assignment 100x", lambda: force(shard_assignment_token_balanced(spark, X100))),
    ]:
        best, n = timed(fn)
        rows.append((label, best, n))
        print(rows[-1], flush=True)

    spark.stop()
    print("\n| probe | wall (min of %d) | rows |" % RUNS)
    print("|---|---|---|")
    for label, best, n in rows:
        print(f"| {label} | {best:.2f} s | chk {n} |")


if __name__ == "__main__":
    main()
