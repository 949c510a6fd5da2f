#!/usr/bin/env python3
"""Stage-level profile of knn_edges_ann defaults on the 100x Gaussian
corpus (the SCALE_r6 probe that measured 20.7x): where do the seconds
go?  Times each pipeline prefix so stage cost = difference.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from event_data_etl_gcs_spark.operators.graph import (
        banded_srp_candidates,
        derive_band_bits,
        knn_edges_ann,
    )
    from event_data_etl_gcs_spark.operators.similarity import norm_sql
    from event_data_etl_gcs_spark.session import get_spark

    spark = get_spark(
        app_name="knn_profile_r6",
        extra_conf={"spark.sql.files.maxPartitionBytes": "16m"},
    )
    gauss = "/tmp/spark_graft_scale_r6/gauss200000.parquet"
    gdf = spark.read.parquet(gauss)

    def t(name, fn):
        t0 = time.perf_counter()
        r = fn()
        dt = time.perf_counter() - t0
        print(f"{name:50s} {dt:8.2f}s  {r}")
        return dt, r

    base = gdf.select(
        F.col("vec_id").alias("id"),
        "embedding",
        F.expr(norm_sql("embedding")).alias("nrm"),
    ).filter(F.col("nrm") > 0)

    t("0. corpus count", lambda: base.count())
    n = 200_000
    bb = derive_band_bits(n)
    print("   band_bits:", bb)

    # 1. signature computation alone (all 4 bands, one pass)
    from event_data_etl_gcs_spark.operators import graph as G

    banded = None

    def build_banded():
        nonlocal banded
        # replicate the internal banded plan via the candidate engine's
        # internals: just time a 40-plane signature pass
        cols = []
        sql = []
        from event_data_etl_gcs_spark.operators.similarity import (
            LSH_C1,
            LSH_C2,
            LSH_HALF,
            LSH_MOD,
        )

        def plane_bits_sql(planes):
            bits = []
            for b, j in enumerate(planes):
                sign = (
                    f"(CASE WHEN (({j + 1}L * {LSH_C1}L + (i - 1) * {LSH_C2}L) % {LSH_MOD}L)"
                    f" < {LSH_HALF}L THEN 1 ELSE -1 END)"
                )
                dot = (
                    "aggregate(transform(sequence(1, size(embedding)), "
                    f"i -> {sign} * CAST(embedding[i - 1] AS DOUBLE)), "
                    "CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
                )
                bits.append(f"(CASE WHEN {dot} > 0 THEN {1 << b}L ELSE 0L END)")
            return " + ".join(bits)

        sigs = base.select(
            "id",
            *[
                F.expr(plane_bits_sql([band * bb + b for b in range(bb)]))
                .cast("int")
                .alias(f"b{band}")
                for band in range(4)
            ],
        )
        return sigs.agg(F.sum(F.col("b0") + F.col("b1") + F.col("b2") + F.col("b3"))).collect()[0][0]

    t("1. 40-plane signatures (one pass)", build_banded)

    cand = banded_srp_candidates(base, 4, bb)
    t("2. candidates count (engine, defaults)", lambda: cand.count())
    t("3. full knn_edges_ann defaults", lambda: knn_edges_ann(gdf, k=3, band_bits=bb).count())
    spark.stop()


if __name__ == "__main__":
    main()
