#!/usr/bin/env python3
"""Round-13 A/B: distributed vs one-task-local pagerank_quantized
iteration (PR_LOCAL_MAX_NODES switch), composed as the real
graph_pagerank / graph_pagerank_ann queries at sf0.1. Interleaved arms
in one session; checksums must be identical (integer-exact loop)."""
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
    from pyspark.sql import functions as F

    from event_data_etl_gcs_spark.operators.graph import (
        knn_edges,
        knn_edges_ann,
        pagerank_quantized,
        release_ann_caches,
    )
    from event_data_etl_gcs_spark.session import get_spark
    from event_data_etl_gcs_spark.sources.catalog import load_table

    spark = get_spark(app_name="probe_pr_local_r13")
    sc = spark.sparkContext

    def ann_query(local_max):
        emb = load_table(spark, SF_DIR, "embeddings")
        return pagerank_quantized(
            knn_edges_ann(emb, k=3).select("u", "v"),
            iterations=10,
            local_max_nodes=local_max,
        )

    def exact_query(local_max):
        emb = load_table(spark, SF_DIR, "embeddings", fan_out=True)
        return pagerank_quantized(
            knn_edges(emb, k=3).select("u", "v"),
            iterations=10,
            local_max_nodes=local_max,
        )

    for qname, q in (("graph_pagerank_ann", ann_query), ("graph_pagerank", exact_query)):
        times: dict[str, list[float]] = {"dist": [], "local": []}
        chks = set()
        for arm in ("dist", "local", "dist", "local", "dist", "local"):
            release_ann_caches()
            sc.setJobDescription(f"{qname} [{arm}]")
            t0 = time.perf_counter()
            chk = checksum(q(0 if arm == "dist" else 65536))
            dt = time.perf_counter() - t0
            times[arm].append(dt)
            chks.add(chk)
            print(f"{qname} {arm}: {dt:.3f}s n={chk[0]}", flush=True)
        print(
            f"{qname}: dist={[round(x,3) for x in times['dist']]} "
            f"local={[round(x,3) for x in times['local']]} "
            f"identical={len(chks) == 1}",
            flush=True,
        )
    sc.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
