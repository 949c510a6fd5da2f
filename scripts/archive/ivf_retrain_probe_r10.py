#!/usr/bin/env python3
"""Round-10 probe: IVF retrain recovers search recall on a drifted
corpus (ledger in SCALE_r10.md §2; VERDICT r9 directive #4).

Scenario: an index built on the original corpus absorbs a drift burst —
50k vectors from 8 NEW Gaussian clusters in a region the original
centroids never saw (appends route against FROZEN centroids, so the new
region's neighbors scatter across whichever old cells happen to be
nearest). Search recall for drift-region queries collapses; the stats
thresholds fire; retrain_ivf_index rebuilds centroids (Lloyd in the
projected space, same PCA model) and recall recovers.

Probe honesty: ground truth is an independent numpy exact cosine top-k
over the full corpus; recall is measured against it before and after.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_OLD, N_DRIFT, DIM = 100_000, 50_000, 64
K_CELLS, TOP_K = 32, 10
N_PROBES = (1, 2, 4)
IDX = "/tmp/spark_graft_scale_r10/ivf_drift_idx"


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    import shutil

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from event_data_etl_gcs_spark.operators.ivf_store import (
        append_ivf_index,
        ivf_index_stats,
        retrain_ivf_index,
        search_ivf_index,
        write_ivf_index,
    )
    from event_data_etl_gcs_spark.operators.linalg import pca_fit
    from event_data_etl_gcs_spark.session import get_spark

    rng = np.random.default_rng(42)
    old_centers = rng.normal(0, 1.0, size=(16, DIM))
    old = old_centers[rng.integers(0, 16, N_OLD)] + rng.normal(
        0, 0.35, size=(N_OLD, DIM)
    )
    # drifted region OVERLAPPING the old one (+1.5 offset): its clusters
    # straddle the frozen cell boundaries, so true neighbors scatter
    # across cells — the shape that hurts low-n_probe recall
    drift_centers = rng.normal(0, 1.0, size=(8, DIM)) + 1.5
    drift = drift_centers[rng.integers(0, 8, N_DRIFT)] + rng.normal(
        0, 0.35, size=(N_DRIFT, DIM)
    )

    spark = get_spark(app_name="ivf_retrain_probe_r10")

    def frame(X, start):
        pdf = pd.DataFrame(
            {
                "vec_id": np.arange(start, start + len(X), dtype=np.int64),
                "embedding": list(X.astype(np.float32)),
            }
        )
        # pandas-created frames land in ONE partition — spread them or
        # every downstream stage runs on a single core
        return spark.createDataFrame(pdf).repartition(32).localCheckpoint(
            eager=True
        )

    old_df = frame(old, 0)
    drift_df = frame(drift, N_OLD)

    t0 = time.time()
    qe, qw, _ = pca_fit(old_df, scoring="partial")
    print(f"pca fit (old corpus): {time.time() - t0:.1f} s", flush=True)

    shutil.rmtree(IDX, ignore_errors=True)
    t0 = time.time()
    write_ivf_index(old_df, qe, IDX, k_cells=K_CELLS, qw=qw)
    print(f"build {N_OLD:,}: {time.time() - t0:.1f} s", flush=True)
    t0 = time.time()
    append_ivf_index(drift_df, IDX, qe, qw=qw)
    print(f"append {N_DRIFT:,} drifted: {time.time() - t0:.1f} s", flush=True)

    # independent exact ground truth over the FULL corpus (float32 cast
    # mirrors what the index stores)
    X = np.concatenate([old, drift]).astype(np.float32).astype(np.float64)
    nrm = np.linalg.norm(X, axis=1)
    q_drift = list(range(N_OLD, N_OLD + 15))  # drift-region queries
    q_old = list(range(15))  # original-region queries

    def truth_for(qids):
        out = {}
        for qid in qids:
            cos = (X @ X[qid]) / (nrm * nrm[qid])
            cos[qid] = -np.inf
            # deterministic top-k: score desc, id asc (the engine's rule)
            order = np.lexsort((np.arange(len(cos)), -cos))
            out[qid] = set(order[:TOP_K].tolist())
        return out

    truth = {**truth_for(q_drift), **truth_for(q_old)}

    def recall(label):
        # query frame keyed by the real corpus ids
        qpdf = pd.DataFrame(
            {
                "vec_id": np.array(q_drift + q_old, dtype=np.int64),
                "embedding": list(X[q_drift + q_old].astype(np.float32)),
            }
        )
        qdf = spark.createDataFrame(qpdf)
        stats = ivf_index_stats(spark, IDX)
        for n_probe in N_PROBES:
            t0 = time.time()
            got = (
                search_ivf_index(
                    spark, IDX, qdf, qe, qw=qw, top_k=TOP_K, n_probe=n_probe
                )
                .groupBy("query_id")
                .agg(F.collect_list("neighbor_id").alias("nbrs"))
                .collect()
            )
            dt = time.time() - t0
            by_q = {r["query_id"]: set(r["nbrs"]) for r in got}
            rec = lambda qs: sum(
                len(by_q.get(q, set()) & truth[q]) for q in qs
            ) / (TOP_K * len(qs))
            print(
                f"| {label} | n_probe={n_probe} | "
                f"drift-q recall@{TOP_K} {rec(q_drift):.3f} | "
                f"old-q recall@{TOP_K} {rec(q_old):.3f} | "
                f"hot-cell {stats['max_cell_fraction']:.3f} "
                f"imb {stats['imbalance']:.1f} | v{stats['index_version']} | "
                f"search {dt:.1f} s |",
                flush=True,
            )
        return stats

    print(f"\n| state | n_probe | drift recall | old recall | balance | ver | wall |")
    print("|---|---|---|---|---|---|---|")
    stats = recall("frozen centroids + drift burst")
    t0 = time.time()
    out = retrain_ivf_index(spark, IDX, qe, qw=qw, lloyd_iters=3)
    print(
        f"retrain: {time.time() - t0:.1f} s, trigger={out['trigger']}, "
        f"-> index_version {out['index_version']}",
        flush=True,
    )
    recall("after retrain (Lloyd x3, same PCA model)")
    spark.stop()


if __name__ == "__main__":
    main()
