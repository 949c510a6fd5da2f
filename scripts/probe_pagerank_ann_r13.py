#!/usr/bin/env python3
"""Round-13 directive #2 probe: per-stage wall profile of
graph_pagerank_ann's composition at sf0.1 (VERDICT r12 "Next round" #2).

Decomposes the 9.5-10.8 s row into its physical stages, each forced
with a checksum action (no count() pruning), labeled for the UI:

  A  base projection + count          (norm fold over 2000 x 64)
  B  banded signature table           (_plane_bits_sql: 16 interpreted
                                       plane folds/row) + persist
  C  candidate pairs                  (sizes agg + exact join + hot ring)
  D  edges: join-backs + cos fold + per-node top-k window + distinct
  E  pagerank_quantized 10-iteration loop on checkpointed edges

Run: python scripts/probe_pagerank_ann_r13.py [repeats]
"""
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


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from pyspark.sql import functions as F

    from event_data_etl_gcs_spark.operators.graph import (
        KNN_ANN_MAX_BUCKET,
        KNN_ANN_RING_CAP,
        banded_srp_candidates,
        derive_band_bits,
        pagerank_quantized,
        release_ann_caches,
    )
    from event_data_etl_gcs_spark.operators.similarity import dot_sql, norm_sql
    from event_data_etl_gcs_spark.session import get_spark
    from event_data_etl_gcs_spark.sources.catalog import load_table
    from pyspark.sql import Window

    spark = get_spark(app_name="probe_pagerank_ann_r13")
    sc = spark.sparkContext

    for rep in range(repeats):
        release_ann_caches()
        t_all = time.perf_counter()

        sc.setJobDescription("A: base projection")
        t0 = time.perf_counter()
        emb = load_table(spark, SF_DIR, "embeddings")
        base = emb.select(
            F.col("vec_id").alias("id"),
            "embedding",
            F.expr(norm_sql("embedding")).alias("nrm"),
        ).filter(F.col("nrm") > 0)
        n = base.count()
        band_bits = derive_band_bits(n)
        tA = time.perf_counter() - t0

        sc.setJobDescription("C: candidate pairs")
        t0 = time.perf_counter()
        cand = banded_srp_candidates(
            base, 4, band_bits, KNN_ANN_MAX_BUCKET, KNN_ANN_RING_CAP
        )
        c_chk = checksum(cand)
        tC = time.perf_counter() - t0

        sc.setJobDescription("D: edges (join-back + cos + topk window)")
        t0 = time.perf_counter()
        va = base.select(
            F.col("id").alias("ida"), F.col("embedding").alias("ea"),
            F.col("nrm").alias("na"),
        )
        vb = base.select(
            F.col("id").alias("idb"), F.col("embedding").alias("eb"),
            F.col("nrm").alias("nb"),
        )
        scored = (
            cand.join(F.broadcast(va), "ida")
            .join(F.broadcast(vb), "idb")
            .select(
                "ida", "idb",
                (F.expr(dot_sql("ea", "eb")) / (F.col("na") * F.col("nb"))).alias(
                    "cos_sim"
                ),
            )
        )
        both = scored.select(
            F.explode(
                F.array(
                    F.struct(F.col("ida").alias("query_id"), F.col("idb").alias("neighbor_id")),
                    F.struct(F.col("idb").alias("query_id"), F.col("ida").alias("neighbor_id")),
                )
            ).alias("qn"),
            "cos_sim",
        ).select("qn.query_id", "qn.neighbor_id", "cos_sim")
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos_sim").desc(), F.col("neighbor_id")
        )
        edges = (
            both.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 3)
            .select(
                F.least("query_id", "neighbor_id").alias("u"),
                F.greatest("query_id", "neighbor_id").alias("v"),
            )
            .distinct()
        )
        e_chk = checksum(edges)
        tD = time.perf_counter() - t0

        sc.setJobDescription("E: pagerank loop")
        t0 = time.perf_counter()
        pr = pagerank_quantized(edges, iterations=10)
        p_chk = checksum(pr)
        tE = time.perf_counter() - t0
        sc.setJobDescription(None)

        total = time.perf_counter() - t_all
        print(
            f"rep{rep}: A(base+count)={tA:.3f} C(cand)={tC:.3f} "
            f"D(edges)={tD:.3f} E(loop)={tE:.3f} total={total:.3f} "
            f"n={n} cand={c_chk[0]} edges={e_chk[0]} pr={p_chk[0]}",
            flush=True,
        )
        print(f"  chk cand={c_chk} edges={e_chk}", flush=True)
        print(f"  chk pr={p_chk}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
