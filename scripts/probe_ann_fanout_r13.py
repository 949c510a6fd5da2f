#!/usr/bin/env python3
"""Round-13 A/B: raw vs fanned embeddings scan under the composed
graph_pagerank_ann query (the banded signature + norm projection runs
on ONE task off a single-file scan). Interleaved arms, one session."""
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
    from event_data_etl_gcs_spark.operators.graph import (
        knn_edges_ann,
        pagerank_quantized,
        release_ann_caches,
    )
    from event_data_etl_gcs_spark.session import get_spark
    from event_data_etl_gcs_spark.sources.catalog import load_table

    spark = get_spark(app_name="probe_ann_fanout_r13")
    sc = spark.sparkContext

    times: dict[str, list[float]] = {"raw": [], "fan": []}
    chks = set()
    for arm in ("raw", "fan", "raw", "fan", "raw", "fan"):
        release_ann_caches()
        sc.setJobDescription(f"graph_pagerank_ann [{arm}]")
        t0 = time.perf_counter()
        emb = load_table(spark, SF_DIR, "embeddings", fan_out=(arm == "fan"))
        pr = pagerank_quantized(
            knn_edges_ann(emb, k=3).select("u", "v"), iterations=10
        )
        chk = checksum(pr)
        dt = time.perf_counter() - t0
        times[arm].append(dt)
        chks.add(chk)
        print(f"{arm}: {dt:.3f}s n={chk[0]}", flush=True)
    sc.setJobDescription(None)
    print(
        f"raw={[round(x,3) for x in times['raw']]} "
        f"fan={[round(x,3) for x in times['fan']]} "
        f"identical={len(chks) == 1}",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
