#!/usr/bin/env python3
"""Ring-hybrid probe: measures the knn_edges_ann skew controls against
the 100x embeddings corpus (200k vectors, every vector ~99 epsilon-near
copies — the duplicate-concentration shape that creates LSH hot
buckets; synthesized by scripts/scale_probe_r3.py).

Configs (all band_bits=8, n_bands=4, k=3 — the log(n)-scaled banding
from SCALE_r5.md):

  skip    max_bucket=512                 hot buckets dropped (r5 row)
  hybrid  max_bucket=512, ring_cap=128   hot buckets ring-sampled
  ring    ring_cap=128                   bounded rings everywhere

Metrics: wall (min of RUNS), edge count, and near-dup NODE COVERAGE —
the fraction of the 200k nodes that carry at least one cos>0.999 edge.
On this corpus every node's true nearest neighbors are its epsilon
copies, so coverage is exact recall@"found any true neighbor", which is
what a near-dup graph build is for. Appends a section to SCALE_r5.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/tmp/spark_graft_scale_r3"
FACTOR = int(os.environ.get("SCALE_PROBE_FACTOR", "100"))
RUNS = int(os.environ.get("SCALE_PROBE_RUNS", "2"))

CONFIGS = [
    ("skip", {"max_bucket": 512}),
    ("hybrid", {"max_bucket": 512, "ring_cap": 128}),
    ("ring", {"ring_cap": 128}),
]


def main() -> None:
    from pyspark.sql import functions as F

    from event_data_etl_gcs_spark.operators.graph import knn_edges_ann
    from event_data_etl_gcs_spark.session import get_spark
    from event_data_etl_gcs_spark.sources.catalog import load_table

    spark = get_spark(
        app_name="ring_probe_r5",
        extra_conf={"spark.sql.files.maxPartitionBytes": "16m"},
    )
    x_dir = f"{BASE}/x{FACTOR}"
    if not os.path.exists(f"{x_dir}/embeddings.parquet/_SUCCESS"):
        from scripts.scale_probe_r3 import synthesize

        synthesize(spark)
    emb = load_table(spark, x_dir, "embeddings")
    n_nodes = emb.count()

    rows = []
    for name, kw in CONFIGS:
        wall = float("inf")
        for _ in range(RUNS):
            edges = knn_edges_ann(
                emb, k=3, n_bands=4, band_bits=8, **kw
            ).cache()
            t0 = time.perf_counter()
            n_edges = edges.count()
            wall = min(wall, time.perf_counter() - t0)
        dup = edges.filter(F.col("cos_sim") > 0.999)
        covered = (
            dup.select(F.col("u").alias("node"))
            .unionByName(dup.select(F.col("v").alias("node")))
            .distinct()
            .count()
        )
        edges.unpersist()
        rows.append((name, kw, wall, n_edges, covered / n_nodes))
        print(
            f"{name:8s} {wall:7.2f}s  {n_edges:7d} edges  "
            f"coverage {covered / n_nodes:.3f}"
        )

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_r5.md",
    )
    with open(out, "a") as f:
        f.write(
            f"\n## Ring-hybrid probe ({FACTOR}x embeddings, {n_nodes} "
            "vectors, band_bits=8, k=3)\n\n"
            "Near-dup coverage = fraction of nodes carrying a cos>0.999 "
            "edge (every node has ~99 epsilon copies, so this is exact "
            "recall of 'found a true neighbor'). Min of "
            f"{RUNS} runs.\n\n"
            "| config | wall (s) | edges | near-dup coverage |\n"
            "|---|---|---|---|\n"
        )
        for name, kw, wall, n_edges, cov in rows:
            kws = ", ".join(f"{k}={v}" for k, v in kw.items())
            f.write(f"| {name} ({kws}) | {wall:.2f} | {n_edges} | {cov:.3f} |\n")
    spark.stop()


if __name__ == "__main__":
    main()
