#!/usr/bin/env python3
"""Round-13 sub-probe: decompose graph_pagerank_ann's candidate stage and
A/B the codegen-able unroll levers in ONE session (interleaved arms).

Sub-stages of banded_srp_candidates at sf0.1 (n=2000, band_bits=4):
  C1 banded signature persist+count (16 plane folds/row)
  C2 exact small-bucket pairs checksum
  C3 full candidate set checksum (adds hot-bucket ring + distinct)
  D  scoring join-back + cos + topk + distinct (fold vs unrolled dot)
  E  loop on a PRE-CHECKPOINTED edge list (isolates the iteration cost)
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


def build_edges(spark, base, unroll_dot: bool):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from event_data_etl_gcs_spark.operators.graph import (
        KNN_ANN_MAX_BUCKET,
        KNN_ANN_RING_CAP,
        banded_srp_candidates,
    )
    from event_data_etl_gcs_spark.operators.similarity import dot_sql

    cand = banded_srp_candidates(base, 4, 4, KNN_ANN_MAX_BUCKET, KNN_ANN_RING_CAP)
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
            (
                F.expr(dot_sql("ea", "eb", unroll=unroll_dot))
                / (F.col("na") * F.col("nb"))
            ).alias("cos_sim"),
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
    return (
        both.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            F.least("query_id", "neighbor_id").alias("u"),
            F.greatest("query_id", "neighbor_id").alias("v"),
        )
        .distinct()
    )


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from pyspark.sql import functions as F

    from event_data_etl_gcs_spark.operators.graph import (
        KNN_ANN_MAX_BUCKET,
        banded_srp_candidates,
        pagerank_quantized,
        release_ann_caches,
    )
    from event_data_etl_gcs_spark.operators.similarity import norm_sql
    from event_data_etl_gcs_spark.session import get_spark
    from event_data_etl_gcs_spark.sources.catalog import load_table

    spark = get_spark(app_name="probe_pagerank_ann_sub_r13")
    sc = spark.sparkContext

    emb = load_table(spark, SF_DIR, "embeddings")
    base = emb.select(
        F.col("vec_id").alias("id"),
        "embedding",
        F.expr(norm_sql("embedding")).alias("nrm"),
    ).filter(F.col("nrm") > 0)
    base.count()  # warm the scan

    for rep in range(repeats):
        release_ann_caches()
        # --- C sub-stages (fold plane path, current code) ---
        from event_data_etl_gcs_spark.operators.graph import (
            _plane_bits_sql,
            _track_ann_cache,
        )

        sc.setJobDescription("C1: banded persist")
        t0 = time.perf_counter()
        banded = base.select(
            "id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(band).alias("band"),
                            F.expr(
                                _plane_bits_sql([band * 4 + b for b in range(4)])
                            ).cast("int").alias("bkt"),
                        )
                        for band in range(4)
                    ]
                )
            ).alias("bb"),
        ).select("id", "bb.band", "bb.bkt")
        banded = _track_ann_cache(banded.persist())
        banded.count()
        tC1 = time.perf_counter() - t0

        sc.setJobDescription("C2: exact small pairs")
        t0 = time.perf_counter()
        sizes = banded.groupBy("band", "bkt").agg(F.count("*").alias("__bsz"))
        sized = banded.join(F.broadcast(sizes), ["band", "bkt"])
        small = sized.filter(F.col("__bsz") <= KNN_ANN_MAX_BUCKET).drop("__bsz")
        a, b = small.alias("a"), small.alias("b")
        ep = a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkt") == F.col("b.bkt"))
            & (F.col("a.id") < F.col("b.id")),
        ).select(F.col("a.id").alias("ida"), F.col("b.id").alias("idb"))
        c2 = checksum(ep)
        tC2 = time.perf_counter() - t0

        release_ann_caches()
        sc.setJobDescription("C3: full candidates")
        t0 = time.perf_counter()
        cand = banded_srp_candidates(base, 4, 4, KNN_ANN_MAX_BUCKET, 128)
        c3 = checksum(cand)
        tC3 = time.perf_counter() - t0

        # --- D arms: fold vs unrolled dot (edges checksums must match) ---
        res = {}
        for arm in ("fold", "unroll", "fold2"):
            release_ann_caches()
            sc.setJobDescription(f"D+edges [{arm}]")
            t0 = time.perf_counter()
            edges = build_edges(spark, base, unroll_dot=(arm == "unroll"))
            chk = checksum(edges)
            res[arm] = (time.perf_counter() - t0, chk)

        # --- E: loop on pre-checkpointed edges ---
        release_ann_caches()
        edges = build_edges(spark, base, unroll_dot=False)
        eck = edges.localCheckpoint(eager=True)
        sc.setJobDescription("E: loop on checkpointed edges")
        t0 = time.perf_counter()
        pr = pagerank_quantized(eck, iterations=10)
        p = checksum(pr)
        tE = time.perf_counter() - t0
        sc.setJobDescription(None)

        print(
            f"rep{rep}: C1={tC1:.3f} C2={tC2:.3f} ({c2[0]}) C3={tC3:.3f} ({c3[0]}) "
            f"D_fold={res['fold'][0]:.3f} D_unroll={res['unroll'][0]:.3f} "
            f"D_fold2={res['fold2'][0]:.3f} E_loop={tE:.3f} pr_n={p[0]}",
            flush=True,
        )
        same = res["fold"][1] == res["unroll"][1] == res["fold2"][1]
        print(f"  edge checksums identical: {same} {res['fold'][1]}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
