"""Distributed k-means building blocks over the embeddings table.

The reference has no clustering operator; this extends the engine's
similarity family (SURVEY.md Phase 4 north star: LLM-data-pipeline ops)
with the standard corpus-curation primitive — cluster embeddings, then
sample/balance/dedup per cluster.

Spark-first design:
  * Initial centroids are the k vectors with the smallest ids —
    deterministic, so every run (and the DuckDB oracle) sees the same
    seeds. At 100 TB you'd swap in k-means|| sampling; the operator shape
    (broadcast centroids, map-side assignment) is unchanged.
  * Assignment is a broadcast nested-loop over k centroid rows — the
    corpus NEVER shuffles for assignment; each row computes k squared
    distances with a native Catalyst lambda (left-to-right double sums,
    engine-exact) and keeps the argmin via a per-vector window.
  * The Lloyd recompute uses the ORDER-PINNED float-fold pattern
    (sort by member id inside each (cluster, dim) group before summing)
    so centroid doubles are bit-identical across engines and across
    shuffle-partition counts. At production scale the pin is dropped and
    a plain avg() suffices; the pinned fold is the oracle-exact variant.

Everything is DataFrame-native: one shuffle for the recompute groupBy,
zero Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

K_CLUSTERS = 8


def sqdist_sql(a: str, b: str) -> str:
    """Squared L2 distance, left-to-right double summation (portable)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> "
        f"(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def duck_sqdist(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, len({a}) + 1), "
        f"i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) "
        f"* (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)))), "
        f"(acc, v) -> acc + v)"
    )


# Round-6 portability device for ITERATED trainers (kmeans_iterate,
# train_ivf_centroids, train_codebook): component means over a group via
# POWER-OF-TWO integer quantization. q = floor(v * 2^20 + 0.5) is
# bit-portable (the multiply only shifts the exponent — exact in IEEE;
# +0.5 and floor are exact at these magnitudes; floor(x+0.5) is the
# round-half-up spelling both engines agree on, unlike round()), the
# int64 SUM is exact in ANY order — partitioning-independent with the
# same shuffle shape as a plain avg, none of the order-pinned fold's
# collect_list memory — and the final double division is one correctly-
# rounded IEEE op. Decimal(28,12) sums (the previous device) were
# partitioning-independent but NOT cross-engine portable: DuckDB rounds
# double->decimal half-way values differently than Java BigDecimal
# (measured: 6 of 192k embedding components disagree). Quantization
# error vs the true mean is < 2^-21 per component — noise relative to
# k-means convergence tolerance.
QMEAN_SCALE = float(1 << 20)


def quantized_mean(val) -> "F.Column":
    """Aggregate expression: quantized component mean of ``val`` (see
    QMEAN_SCALE note). Use inside groupBy().agg()."""
    q = F.floor(val.cast("double") * F.lit(QMEAN_SCALE) + F.lit(0.5)).cast("long")
    return F.sum(q).cast("double") / (F.lit(QMEAN_SCALE) * F.count("*"))


def duck_quantized_mean(val: str) -> str:
    """DuckDB mirror of :func:`quantized_mean` (aggregate expression)."""
    return (
        f"CAST(SUM(CAST(floor(CAST({val} AS DOUBLE) * {QMEAN_SCALE!r} + 0.5) "
        f"AS BIGINT)) AS DOUBLE) / ({QMEAN_SCALE!r} * COUNT(*))"
    )


def initial_centroids(
    emb: DataFrame, k: int = K_CLUSTERS, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(cid, cvec): the k smallest-id vectors as deterministic seeds."""
    return (
        emb.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
        .orderBy("cid")
        .limit(k)
    )


def assign_clusters(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster_id, sqdist): nearest centroid per vector.

    Broadcast nested-loop join (centroids are k rows by contract); ties
    break toward the smallest centroid id so assignment is total-order
    deterministic.
    """
    cand = (
        emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
        .crossJoin(F.broadcast(centroids))
        .withColumn("sqdist", F.expr(sqdist_sql("v", "cvec")))
    )
    w = Window.partitionBy("vec_id").orderBy("sqdist", "cid")
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("vec_id", F.col("cid").alias("cluster_id"), "sqdist")
    )


def lloyd_recompute(
    emb: DataFrame,
    assignment: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cluster_id, pos, centroid_val, n_members): one Lloyd step's new
    centroids with order-pinned member folds (engine-exact doubles)."""
    joined = emb.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
    ).join(assignment.select("vec_id", "cluster_id"), "vec_id")
    exploded = joined.select(
        "cluster_id", "vec_id", F.posexplode("v").alias("pos", "val")
    ).select("cluster_id", "vec_id", "pos", F.col("val").cast("double").alias("val"))
    grouped = exploded.groupBy("cluster_id", "pos").agg(
        F.count("*").alias("n_members"),
        F.sort_array(F.collect_list(F.struct("vec_id", "val"))).alias("pairs"),
    )
    return grouped.select(
        "cluster_id",
        F.col("pos").cast("int").alias("pos"),
        (
            F.expr(
                "aggregate(transform(pairs, p -> p.val), "
                "CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
            )
            / F.col("n_members")
        ).alias("centroid_val"),
        "n_members",
    )


def kmeans_iterate(
    emb: DataFrame,
    k: int = K_CLUSTERS,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Full Lloyd iterations (fixed count) — the production path.

    Each round: broadcast current centroids, map-side assignment, one
    groupBy recompute using the QUANTIZED component mean (see
    QMEAN_SCALE: exact int64 sums — partitioning-independent AND
    cross-engine portable at the same shuffle cost as a plain avg,
    without the order-pinned fold's collect_list memory). Centroids come
    back to the driver between rounds (k x dim doubles — tiny), exactly
    like MLlib's implementation. Returns the final (vec_id, cluster_id,
    sqdist) assignment — since round 6 oracle-exact (the DuckDB mirror
    replays all iterations; queries/clustering.py).
    """
    spark = emb.sparkSession
    cent = initial_centroids(emb, k, id_col, vec_col)
    cent_rows = [(r["cid"], r["cvec"]) for r in cent.collect()]
    for _ in range(n_iter):
        cent_df = spark.createDataFrame(cent_rows, "cid BIGINT, cvec ARRAY<FLOAT>")
        assign = assign_clusters(emb, cent_df, id_col, vec_col)
        new = (
            emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
            .join(assign.select("vec_id", "cluster_id"), "vec_id")
            .select("cluster_id", F.posexplode("v").alias("pos", "val"))
            .groupBy("cluster_id", "pos")
            .agg(quantized_mean(F.col("val")).alias("m"))
            .groupBy("cluster_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "cluster_id",
                F.expr("transform(pm, x -> CAST(x.m AS FLOAT))").alias("cvec"),
            )
        )
        cent_rows = [(r["cluster_id"], r["cvec"]) for r in new.collect()]
    cent_df = spark.createDataFrame(cent_rows, "cid BIGINT, cvec ARRAY<FLOAT>")
    return assign_clusters(emb, cent_df, id_col, vec_col)
