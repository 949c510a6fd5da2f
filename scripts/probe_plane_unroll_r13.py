#!/usr/bin/env python3
"""Round-13 A/B: interpreted plane-sign folds vs the unrolled
constant-sign chains (VERDICT r12 #2, guide §4.1), same session,
interleaved arms with a repeat of the first arm last.

Arms measured at sf0.1:
  cand:   banded_srp_candidates fold vs unroll_planes (checksummed)
  lsh:    lsh_bucket_topk's bucket projection fold vs unroll
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
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from event_data_etl_gcs_spark.operators.graph import (
        banded_srp_candidates,
        release_ann_caches,
    )
    from event_data_etl_gcs_spark.operators.similarity import (
        bucket_sql,
        dot_sql,
        norm_sql,
    )
    from event_data_etl_gcs_spark.session import get_spark
    from event_data_etl_gcs_spark.sources.catalog import load_table

    spark = get_spark(app_name="probe_plane_unroll_r13")
    sc = spark.sparkContext

    emb = load_table(spark, SF_DIR, "embeddings")
    base = emb.select(
        F.col("vec_id").alias("id"),
        "embedding",
        F.expr(norm_sql("embedding")).alias("nrm"),
    ).filter(F.col("nrm") > 0)
    base.count()

    def lsh_query(unroll: bool):
        q = emb.filter(F.col("vec_id") < 100).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
            F.expr(norm_sql("embedding")).alias("qnorm"),
            F.expr(bucket_sql("embedding", unroll=unroll)).alias("bucket"),
        ).filter(F.col("qnorm") > 0)
        c = emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("cv"),
            F.expr(norm_sql("embedding")).alias("cnorm"),
            F.expr(bucket_sql("embedding", unroll=unroll)).alias("bucket"),
        ).filter(F.col("cnorm") > 0)
        scored = (
            c.join(F.broadcast(q), "bucket")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .withColumn(
                "cos_sim",
                F.expr(dot_sql("qv", "cv")) / (F.col("qnorm") * F.col("cnorm")),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos_sim").desc(), F.col("neighbor_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= 5)
            .select("query_id", "neighbor_id", "cos_sim", "rank")
        )

    for name, fn in (
        ("cand", lambda u: banded_srp_candidates(base, 4, 4, 512, 128, unroll_planes=u)),
        ("lsh", lsh_query),
    ):
        times: dict[str, list[float]] = {"fold": [], "unroll": []}
        chks = set()
        for arm in ("fold", "unroll", "fold", "unroll", "fold", "unroll"):
            release_ann_caches()
            sc.setJobDescription(f"{name} [{arm}]")
            t0 = time.perf_counter()
            chk = checksum(fn(arm == "unroll"))
            dt = time.perf_counter() - t0
            times[arm].append(dt)
            chks.add(chk)
            print(f"{name} {arm}: {dt:.3f}s n={chk[0]}", flush=True)
        print(
            f"{name}: fold={[round(x,3) for x in times['fold']]} "
            f"unroll={[round(x,3) for x in times['unroll']]} "
            f"identical={len(chks) == 1}",
            flush=True,
        )
    sc.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
