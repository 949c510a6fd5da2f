"""KMV (k-minimum-values) distinct sketches.

Completes the sketch toolbox (HLL rollups, count-min, Bloom): KMV is the
one mergeable distinct sketch that also supports SET-INTERSECTION
estimates (via the Jaccard of merged minima), which HLL cannot give
directly. Estimator: with hashes uniform on [0, P), the k-th smallest
distinct hash h_k estimates the distinct count as (k-1) * P / h_k; a
group with fewer than k distinct hashes is stored exactly.

Everything here is deterministic: the hash is an affine map mod a prime
(no RNG), the sketch build is a per-group distinct + top-k, and the
estimates are single divisions of exact integers — so every query has
an exact DuckDB oracle.

Scale: the build is the standard sketch shuffle (distinct on
(group, hash), then a bounded per-group top-k window — k rows per group
survive). Sketch MERGE and pairwise set-relation analysis touch only
k-row sketches, so cross-group comparisons cost O(groups^2 * k), never
a data-scale join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

KMV_K = 64
KMV_P = 1_000_000_007
KMV_A = 73_856_093
KMV_B = 19_349_663


def kmv_hash_sql(col: str) -> str:
    """Affine hash of an integer column onto [0, KMV_P). All intermediate
    products stay below 2^63 (operand reduced mod P first)."""
    return f"((({col} % {KMV_P}) * {KMV_A} + {KMV_B}) % {KMV_P})"


# identical syntax is valid DuckDB SQL
duck_kmv_hash = kmv_hash_sql


def kmv_estimate_col(n_kept: Column, h_k: Column) -> Column:
    """Distinct estimate from (n_kept, k-th minimum hash). Exact below k;
    (k-1)*P / h_k above — the constant folds to one double literal, so
    the only float op is a single portable division."""
    scale = float((KMV_K - 1) * KMV_P)
    return F.when(
        n_kept < KMV_K, n_kept.cast("double")
    ).otherwise(F.lit(scale) / h_k.cast("double"))


def duck_kmv_estimate(n_kept: str, h_k: str) -> str:
    scale = float((KMV_K - 1) * KMV_P)
    return (
        f"CASE WHEN {n_kept} < {KMV_K} THEN CAST({n_kept} AS DOUBLE) "
        f"ELSE {scale!r} / CAST({h_k} AS DOUBLE) END"
    )


def kmv_sketch(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Per-group KMV sketch rows: (group, h, rn) — the k smallest
    distinct hashes of value_col, rank-numbered by hash."""
    hashed = df.select(
        F.col(group_col),
        F.expr(kmv_hash_sql(value_col)).alias("h"),
    ).distinct()
    w = Window.partitionBy(group_col).orderBy("h")
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
    )
