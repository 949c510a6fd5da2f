#!/usr/bin/env python3
"""VERDICT r10 directive #1 probe: the ANN-substrate PageRank
(`graph_pagerank_ann`'s composition) scales sub-quadratically where the
exact brute-force substrate cannot run.

Corpus: the SCALE_r6 Gaussian-mixture family (64 dims, 64 clusters,
power-law sizes, seed 43) at 10k / 20k (exact substrate: quadratic wall
doubles twice for 2x rows) and 20k / 200k (ANN substrate: bucket-local
scorer, near-linear). Every stage checksums its full output (xxhash64
fold + PageRank mass sum) so Catalyst cannot prune the measured work.

Appends rows to SCALE_r11.md by hand — run, then copy the numbers.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

DIM = 64
CLUSTERS = 64
ROOT = "/tmp/spark_graft_scale_r11"


def synth(spark, n: int) -> str:
    import numpy as np
    import pandas as pd

    out = os.path.join(ROOT, f"gauss{n}.parquet")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    rng = np.random.default_rng(43)
    centers = rng.normal(0, 1.0, size=(CLUSTERS, DIM))
    w = 1.0 / np.arange(1, CLUSTERS + 1) ** 0.8
    sizes = np.floor(w / w.sum() * n).astype(int)
    sizes[0] += n - sizes.sum()
    chunks, idchunks, vid = [], [], 0
    for c, sz in enumerate(sizes):
        chunks.append(
            (centers[c] + rng.normal(0, 0.35, size=(sz, DIM))).astype(np.float32)
        )
        idchunks.append(np.arange(vid, vid + sz, dtype=np.int64))
        vid += sz
    pdf = pd.DataFrame(
        {
            "vec_id": np.concatenate(idchunks),
            "embedding": list(np.concatenate(chunks)),
        }
    )
    spark.createDataFrame(pdf).repartition(64).write.mode("overwrite").parquet(out)
    return out


def run_one(spark, path: str, substrate: str, label: str) -> None:
    from pyspark.sql import functions as F

    from event_data_etl_gcs_spark.operators.graph import (
        knn_edges,
        knn_edges_ann,
        pagerank_quantized,
    )

    emb = spark.read.parquet(path)
    t0 = time.perf_counter()
    if substrate == "exact":
        edges = knn_edges(emb, k=3)
    else:
        edges = knn_edges_ann(emb, k=3)
    edges = edges.select("u", "v").localCheckpoint(eager=True)
    e_chk = edges.agg(
        F.count("*").alias("n"),
        (F.sum(F.xxhash64("u", "v") % 1_000_003)).alias("h"),
    ).collect()[0]
    t_edges = time.perf_counter() - t0

    t1 = time.perf_counter()
    pr = pagerank_quantized(edges, iterations=10)
    p_chk = pr.agg(
        F.count("*").alias("n"),
        F.sum("pr_scaled").alias("mass"),
        (F.sum(F.xxhash64("node", "pr_scaled") % 1_000_003)).alias("h"),
    ).collect()[0]
    t_pr = time.perf_counter() - t1
    print(
        f"{label}: edges {t_edges:.2f}s (n={e_chk['n']} h={e_chk['h']}) "
        f"pagerank {t_pr:.2f}s (nodes={p_chk['n']} mass={p_chk['mass']} "
        f"h={p_chk['h']}) total {t_edges + t_pr:.2f}s"
    )


def main() -> None:
    from event_data_etl_gcs_spark.session import get_spark

    spark = get_spark(
        app_name="graph_ann_probe_r11",
        extra_conf={"spark.sql.files.maxPartitionBytes": "16m"},
    )
    print("load:", os.getloadavg())
    p10k = synth(spark, 10_000)
    p20k = synth(spark, 20_000)
    p200k = synth(spark, 200_000)
    # warm the JVM on a small ANN build, then ONE exact run at 10k: the
    # quadratic substrate is already 150+ s there (measured), so 20k
    # extrapolates to ~4x that and 200k to ~400x — the infeasibility IS
    # the probe's point; the ANN rows demonstrate the near-linear path.
    run_one(spark, p10k, "ann", "warmup ann 10k")
    run_one(spark, p10k, "exact", "exact 10k")
    run_one(spark, p20k, "ann", "ann 20k")
    run_one(spark, p200k, "ann", "ann 200k")
    print("load:", os.getloadavg())
    spark.stop()


if __name__ == "__main__":
    main()
