#!/usr/bin/env python3
"""500x probe: knn_edges_ann zero-argument defaults on a 1M-vector
Gaussian-mixture corpus (same generator family as the SCALE_r6 200k
corpus: 64 dims, 64 clusters, power-law sizes, seed 43). Demonstrates
the bucket-local scorer's scaling one decade past the required 100x
probe; auto band_bits resolves to 12 here (occupancy ~244).

Appends a row to SCALE_r6.md by hand — run, then copy the numbers.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

N = 1_000_000
DIM = 64
CLUSTERS = 64
OUT = f"/tmp/spark_graft_scale_r6/gauss{N}.parquet"


def main() -> None:
    import numpy as np
    import pandas as pd

    from event_data_etl_gcs_spark.operators.graph import knn_edges_ann
    from event_data_etl_gcs_spark.session import get_spark

    spark = get_spark(
        app_name="knn_1m_probe",
        extra_conf={"spark.sql.files.maxPartitionBytes": "16m"},
    )
    if not os.path.exists(os.path.join(OUT, "_SUCCESS")):
        rng = np.random.default_rng(43)
        centers = rng.normal(0, 1.0, size=(CLUSTERS, DIM))
        w = 1.0 / np.arange(1, CLUSTERS + 1) ** 0.8
        sizes = np.floor(w / w.sum() * N).astype(int)
        sizes[0] += N - sizes.sum()
        chunks, idchunks, vid = [], [], 0
        for c, n in enumerate(sizes):
            chunks.append(
                (centers[c] + rng.normal(0, 0.35, size=(n, DIM))).astype(np.float32)
            )
            idchunks.append(np.arange(vid, vid + n, dtype=np.int64))
            vid += n
        pdf = pd.DataFrame(
            {
                "vec_id": np.concatenate(idchunks),
                "embedding": list(np.concatenate(chunks)),
            }
        )
        spark.createDataFrame(pdf).repartition(128).write.mode("overwrite").parquet(OUT)
        print("synthesized", OUT)
    gdf = spark.read.parquet(OUT)
    for run in range(2):
        t0 = time.perf_counter()
        n_edges = knn_edges_ann(gdf, k=3).count()
        print(f"run{run}: {time.perf_counter() - t0:.2f}s edges={n_edges}")
    spark.stop()


if __name__ == "__main__":
    main()
