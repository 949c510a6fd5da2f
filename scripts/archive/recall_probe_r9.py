#!/usr/bin/env python3
"""Round-9 probes (ledger in SCALE_r9.md):

1. Recall-vs-n_probe-vs-wall sweep for the reduced-space ANN search
   (pca_ivf_topk_frame) on the realistic Gaussian-mixture 200k corpus —
   picks/justifies the default n_probe (VERDICT r8 directive #5).
2. Persisted IVF index at 1M: build-once wall vs SEARCH-ONLY wall
   (VERDICT r8 directive #3 — the amortization SCALE_r8.md:19 named,
   now measured on the registered capability).

Probe honesty (r7 lesson): timed searches aggregate every output
column; ground truth for recall is an independent numpy brute force.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

G200K = "/tmp/spark_graft_scale_r6/gauss200000.parquet"
G1M = "/tmp/spark_graft_scale_r6/gauss1000000.parquet"
IDX_1M = "/tmp/spark_graft_scale_r9/ivf_index_1m"
RUNS = int(os.environ.get("SCALE_PROBE_RUNS", "2"))
N_QUERY, TOP_K = 15, 5


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    import numpy as np
    from pyspark.sql import functions as F

    from event_data_etl_gcs_spark.operators.clustering import K_CLUSTERS
    from event_data_etl_gcs_spark.operators.ivf_store import (
        search_ivf_index,
        write_ivf_index,
    )
    from event_data_etl_gcs_spark.operators.linalg import pca_fit
    from event_data_etl_gcs_spark.queries.pca import pca_ivf_topk_frame
    from event_data_etl_gcs_spark.session import get_spark

    spark = get_spark(app_name="recall_probe_r9")
    e200 = spark.read.parquet(G200K)

    t0 = time.time()
    qe, qw, _ = pca_fit(e200, scoring="partial")
    print(f"fit 200k: {time.time() - t0:.2f} s", flush=True)

    # independent numpy ground truth (exact cosine top-k over 200k)
    pd200 = e200.select("vec_id", "embedding").toPandas()
    X = np.stack(pd200["embedding"].to_numpy()).astype(np.float64)
    ids = pd200["vec_id"].to_numpy()
    nrm = np.linalg.norm(X, axis=1)
    keep = nrm > 0
    X, ids, nrm = X[keep], ids[keep], nrm[keep]
    truth = {}
    for qi in range(N_QUERY):
        qpos = np.nonzero(ids == qi)[0]
        if not len(qpos):
            continue
        q = X[qpos[0]]
        cos = (X @ q) / (nrm * np.linalg.norm(q))
        mask = ids != qi
        cand = np.argsort(-cos[mask])[: TOP_K + 8]
        mids = ids[mask]
        order = sorted(
            ((-cos[mask][i], mids[i]) for i in cand)
        )
        truth[qi] = {nid for _c, nid in order[:TOP_K]}
    total = sum(len(t) for t in truth.values())

    print("\n| n_probe | recall@5 (200k) | search wall (min of %d) |" % RUNS)
    print("|---|---|---|")
    sweep = []
    for n_probe in range(1, K_CLUSTERS + 1):
        best = None
        got = {}
        for _ in range(RUNS):
            t0 = time.time()
            rows = (
                pca_ivf_topk_frame(
                    e200, qe, n_query=N_QUERY, n_probe=n_probe, top_k=TOP_K
                )
                .select("query_id", "neighbor_id", "cos_sim", "rank")
                .collect()
            )
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            got = {}
            for r in rows:
                got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        hit = sum(len(got.get(q, set()) & t) for q, t in truth.items())
        rec = hit / total
        sweep.append((n_probe, rec, best))
        print(f"| {n_probe} | {rec:.3f} | {best:.2f} s |", flush=True)

    # monotonicity sanity on the sweep itself
    for (p1, r1, _), (p2, r2, _) in zip(sweep, sweep[1:]):
        assert r2 >= r1 - 1e-12, sweep

    # ---- persisted index at 1M: build once, search many ----
    e1m = spark.read.parquet(G1M)
    shutil.rmtree(IDX_1M, ignore_errors=True)
    t0 = time.time()
    manifest = write_ivf_index(e1m, qe, IDX_1M, qw=qw)
    build_wall = time.time() - t0
    print(f"\nbuild persisted index 1M: {build_wall:.2f} s "
          f"(n_rows={manifest['n_rows']})", flush=True)

    queries = e1m.filter(F.col("vec_id") < N_QUERY)
    for n_probe in (1, 3):
        best = None
        for _ in range(RUNS):
            t0 = time.time()
            r = (
                search_ivf_index(
                    spark, IDX_1M, queries, qe, qw=qw,
                    top_k=TOP_K, n_probe=n_probe,
                )
                .agg(
                    F.count("*").alias("n"),
                    F.sum("cos_sim").alias("sc"),
                    F.sum(F.col("rank") * F.col("neighbor_id")).alias("sx"),
                )
                .collect()[0]
            )
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(
            f"search-only 1M n_probe={n_probe}: {best:.2f} s "
            f"(n={r['n']} sum_cos={r['sc']:.4f})",
            flush=True,
        )

    spark.stop()


if __name__ == "__main__":
    main()
