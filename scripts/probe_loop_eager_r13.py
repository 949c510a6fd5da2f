#!/usr/bin/env python3
"""Round-13 A/B: lazy-final vs eager-final checkpoint in the
pagerank_quantized loop (ADVICE r12 medium). Same session, interleaved
arms (old/new/old2/new2), identical checksums required.

The loop body below replicates operators/graph.pagerank_quantized
exactly; the only difference between arms is the `eager` flag of the
final iteration's localCheckpoint (old: lazy -> adj.unpersist() runs
before materialization and every iteration recomputes the adjacency
join; new: eager -> the loop materializes while adj is persisted)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def checksum(df) -> tuple:
    from pyspark.sql import functions as F

    row = df.agg(
        F.count("*").alias("n"),
        *[
            F.max(F.xxhash64(df[c].cast("string"))).alias(f"h{i}")
            for i, c in enumerate(df.columns)
        ],
    ).collect()[0]
    return tuple(row)


def pq_loop(edges, iterations: int, eager_final: bool):
    from pyspark.sql import functions as F

    from event_data_etl_gcs_spark.operators.graph import (
        PR_DAMP_DEN,
        PR_DAMP_NUM,
        PR_SCALE,
        symmetrize,
    )

    scale = PR_SCALE
    sym = symmetrize(edges).localCheckpoint(eager=True)
    deg = sym.groupBy(F.col("u").alias("node")).agg(F.count("*").alias("degree"))
    n_nodes = deg.count()
    adj = (
        sym.alias("s")
        .join(deg.alias("g"), F.col("s.u") == F.col("g.node"))
        .select(
            F.col("s.u").alias("src"),
            F.col("s.v").alias("dst"),
            F.col("g.degree").alias("degree"),
        )
        .cache()
    )
    base = (scale * (PR_DAMP_DEN - PR_DAMP_NUM)) // (PR_DAMP_DEN * n_nodes)
    ckpt_every = 2
    ranks = deg.select(
        "node", F.lit(scale // n_nodes).cast("long").alias("r")
    ).localCheckpoint(eager=True)
    for i in range(iterations):
        contribs = (
            adj.alias("a")
            .join(ranks.alias("rk"), F.col("a.src") == F.col("rk.node"))
            .select(
                F.col("a.dst").alias("node"),
                F.expr("rk.r DIV a.degree").alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").cast("long").alias("in_mass"))
        )
        ranks = (
            ranks.select("node")
            .join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        f"({PR_DAMP_NUM} * coalesce(in_mass, 0L)) DIV {PR_DAMP_DEN}"
                    )
                ).cast("long").alias("r"),
            )
        )
        if (i + 1) % ckpt_every == 0 or i == iterations - 1:
            ranks = ranks.localCheckpoint(
                eager=(eager_final and i == iterations - 1)
            )
    adj.unpersist()
    return ranks.select(
        "node",
        F.col("r").alias("pr_scaled"),
        (F.col("r").cast("double") / F.lit(float(PR_SCALE))).alias("pagerank"),
    )


def main() -> None:
    from pyspark.sql import functions as F

    from event_data_etl_gcs_spark.operators.graph import knn_edges_ann
    from event_data_etl_gcs_spark.session import get_spark
    from event_data_etl_gcs_spark.sources.catalog import load_table

    spark = get_spark(app_name="probe_loop_eager_r13")
    sc = spark.sparkContext

    emb = load_table(spark, SF_DIR, "embeddings")
    edges = knn_edges_ann(emb, k=3).select("u", "v").localCheckpoint(eager=True)
    edges.count()

    results: dict[str, list[float]] = {}
    chks = {}
    for arm in ("old", "new", "old2", "new2", "old3", "new3"):
        eager_final = arm.startswith("new")
        sc.setJobDescription(f"loop [{arm}]")
        t0 = time.perf_counter()
        pr = pq_loop(edges, 10, eager_final)
        chk = checksum(pr)
        dt = time.perf_counter() - t0
        results.setdefault(arm[:3], []).append(dt)
        chks[arm] = chk
        print(f"{arm}: {dt:.3f}s n={chk[0]}", flush=True)
    sc.setJobDescription(None)
    vals = set(chks.values())
    print(f"checksums identical: {len(vals) == 1}")
    print({k: [round(x, 3) for x in v] for k, v in results.items()})
    spark.stop()


if __name__ == "__main__":
    main()
