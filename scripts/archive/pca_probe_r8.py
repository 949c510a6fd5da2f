#!/usr/bin/env python3
"""Round-8 PCA probe: fit + projection + IVF composition at 200k and 1M
vectors (100x-500x the sf0.1 corpus; ledger in SCALE_r8.md).

Probe honesty (r7 lesson): every timed stage aggregates EVERY output
column (sums of proj/whitened/sqdist), so Catalyst cannot prune the
expensive arithmetic out of the measurement. The fold-vs-partial
bit-identity is asserted on the full 200k projection via a join.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

G200K = "/tmp/spark_graft_scale_r6/gauss200000.parquet"
G1M = "/tmp/spark_graft_scale_r6/gauss1000000.parquet"
RUNS = int(os.environ.get("SCALE_PROBE_RUNS", "2"))


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    from pyspark.sql import functions as F

    from event_data_etl_gcs_spark.operators.clustering import (
        K_CLUSTERS,
        assign_clusters,
        initial_centroids,
    )
    from event_data_etl_gcs_spark.operators.linalg import (
        pca_fit,
        pca_project,
        pca_project_array,
    )
    from event_data_etl_gcs_spark.session import get_spark

    spark = get_spark(app_name="pca_probe_r8")
    rows = []

    def timed(label, fn):
        best = None
        out = None
        for _ in range(RUNS):
            t0 = time.time()
            out = fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        rows.append((label, best, out))
        print(rows[-1], flush=True)
        return out

    e200 = spark.read.parquet(G200K)
    e1m = spark.read.parquet(G1M)

    # fit: one distributed Gram pass (partial kernel) + driver eigensolve
    model = {}

    def fit200():
        qe, qw, lams = pca_fit(e200, scoring="partial")
        model["qe"], model["qw"] = qe, qw
        return f"lam1={lams[0]:.1f}"

    timed("fit 200k (partial gram + eigensolve)", fit200)
    qe, qw = model["qe"], model["qw"]

    # projection, every output column aggregated
    def proj(emb, mode):
        def run():
            r = (
                pca_project(emb, qe, qw, scoring=mode)
                .agg(
                    F.count("*").alias("n"),
                    F.sum("proj").alias("sp"),
                    F.sum("whitened").alias("sw"),
                    F.sum(F.col("component") * F.col("vec_id")).alias("sx"),
                )
                .collect()[0]
            )
            return f"n={r['n']} sp={r['sp']:.3f} sw={r['sw']:.3f}"

        return run

    timed("project 200k partial", proj(e200, "partial"))
    timed("project 200k fold", proj(e200, "fold"))
    timed("project 1M partial", proj(e1m, "partial"))

    # bit-identity of the two spellings on the full 200k projection
    def identity():
        a = pca_project(e200, qe, scoring="fold").withColumnRenamed("proj", "pa")
        b = pca_project(e200, qe, scoring="partial").withColumnRenamed("proj", "pb")
        bad = (
            a.join(b, ["vec_id", "component"])
            .filter(F.col("pa") != F.col("pb"))
            .count()
        )
        assert bad == 0, f"{bad} mismatching projections"
        return "bit-identical"

    timed("fold==partial identity join 200k", identity)

    # composition: projected IVF build at 1M (map-only assignment)
    def ivf1m():
        parr = pca_project_array(e1m, qe)
        cents = initial_centroids(
            parr, k=K_CLUSTERS, id_col="vec_id", vec_col="pvec"
        )
        r = (
            assign_clusters(parr, cents, id_col="vec_id", vec_col="pvec")
            .agg(
                F.count("*").alias("n"),
                F.sum("sqdist").alias("sd"),
                F.sum("cluster_id").alias("sc"),
            )
            .collect()[0]
        )
        return f"n={r['n']} sum_sqdist={r['sd']:.1f}"

    timed("pca->ivf assign 1M", ivf1m)

    # end-to-end reduced-space ANN search at 1M (routing + cell-pruned
    # candidate join + exact re-rank; every output column aggregated)
    def topk1m():
        from event_data_etl_gcs_spark.queries.pca import pca_ivf_topk_frame

        r = (
            pca_ivf_topk_frame(e1m, qe)
            .agg(
                F.count("*").alias("n"),
                F.sum("cos_sim").alias("sc"),
                F.sum(F.col("rank") * F.col("neighbor_id")).alias("sx"),
            )
            .collect()[0]
        )
        return f"n={r['n']} sum_cos={r['sc']:.4f}"

    timed("pca->ivf topk search 1M (15 queries)", topk1m)

    spark.stop()
    print("\n| probe | wall (min of %d) | result |" % RUNS)
    print("|---|---|---|")
    for label, best, out in rows:
        print(f"| {label} | {best:.2f} s | {out} |")


if __name__ == "__main__":
    main()
