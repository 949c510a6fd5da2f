"""Embedding clustering + signed-random-projection queries (round 3).

K-means over the embeddings table (assignment, one oracle-exact Lloyd
step, full fixed-iteration Lloyd as the rows-only production path) and a
32-bit SRP compression of the embedding column with banded Hamming
near-duplicate pairs — the embedding-side analogue of text SimHash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.clustering import (
    K_CLUSTERS,
    assign_clusters,
    duck_sqdist,
    initial_centroids,
    kmeans_iterate,
    lloyd_recompute,
)
from ..operators.similarity import bucket_sql, duck_bucket
from ..sources.catalog import load_table
from .registry import query

_DUCK_ASSIGN_CTES = (
    "c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings "
    f"ORDER BY vec_id LIMIT {K_CLUSTERS}), "
    "d AS (SELECT e.vec_id, c.cid, "
    f"{duck_sqdist('e.embedding', 'c.cvec')} AS sqdist "
    "FROM embeddings e CROSS JOIN c), "
    "assign AS (SELECT vec_id, cid AS cluster_id, sqdist FROM d "
    "QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sqdist, cid) = 1)"
)


@query(
    "kmeans_assign",
    oracle=(
        f"WITH {_DUCK_ASSIGN_CTES} SELECT vec_id, cluster_id, sqdist FROM assign"
    ),
    doc=(
        "K-means assignment to deterministic seed centroids (the k "
        "smallest-id vectors): broadcast nested-loop over k centroid "
        "rows, map-side squared-L2 (left-to-right double sums), argmin "
        "with id tiebreak. The corpus never shuffles — at 100 TB the "
        "only moving data is the k x dim centroid broadcast."
    ),
)
def kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return assign_clusters(emb, initial_centroids(emb))


@query(
    "kmeans_one_step",
    oracle=(
        f"WITH {_DUCK_ASSIGN_CTES}, "
        "j AS (SELECT a.cluster_id, e.vec_id, i - 1 AS pos, "
        "CAST(e.embedding[i] AS DOUBLE) AS val "
        "FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id, "
        "unnest(range(1, len(e.embedding) + 1)) AS r(i)), "
        "g AS (SELECT cluster_id, pos, COUNT(*) AS n_members, "
        "list(val ORDER BY vec_id) AS vals FROM j GROUP BY cluster_id, pos) "
        "SELECT cluster_id, CAST(pos AS INTEGER) AS pos, "
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), vals), "
        "(acc, x) -> acc + x) / n_members AS centroid_val, "
        "n_members FROM g"
    ),
    doc=(
        "One Lloyd step: assignment + per-(cluster, dim) centroid "
        "recompute with ORDER-PINNED member folds, so the new centroid "
        "doubles are bit-identical across engines and partition counts. "
        "One shuffle (the recompute groupBy); map-side explode."
    ),
)
def kmeans_one_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    assign = assign_clusters(emb, initial_centroids(emb))
    return lloyd_recompute(emb, assign)


@query(
    "kmeans_iterated",
    oracle=None,  # float sums across partitions in the interior
    # iterations are engine-unportable by construction; rows-only.
    doc=(
        "Fixed-count Lloyd iterations (5): broadcast centroids, map-side "
        "assignment, plain-avg recompute, k x dim doubles back to the "
        "driver per round — the MLlib-shaped production path."
    ),
)
def kmeans_iterated(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_iterate(emb, n_iter=5)


SRP_PLANES = 32
SRP_BANDS = 4
SRP_BAND_BITS = SRP_PLANES // SRP_BANDS
SRP_HAMMING_MAX = 6


@query(
    "embedding_srp_bits",
    oracle=(
        "SELECT vec_id, "
        f"{duck_bucket('embedding', SRP_PLANES)} AS srp_bits "
        "FROM embeddings"
    ),
    doc=(
        "32-plane signed-random-projection signature packed into one "
        "BIGINT — 64x compression of the embedding for shortlist-stage "
        "retrieval. Deterministic integer-derived hyperplanes (same "
        "family as ann_lsh), map-only: zero shuffles at any scale."
    ),
)
def embedding_srp_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", F.expr(bucket_sql("embedding", SRP_PLANES)).alias("srp_bits")
    )


@query(
    "srp_hamming_pairs",
    oracle=(
        "WITH bits AS (SELECT vec_id, "
        f"{duck_bucket('embedding', SRP_PLANES)} AS srp_bits FROM embeddings), "
        "bands AS (SELECT vec_id, srp_bits, b, "
        f"(srp_bits >> (b * {SRP_BAND_BITS})) & {(1 << SRP_BAND_BITS) - 1} AS band_val "
        f"FROM bits, unnest(range({SRP_BANDS})) AS t(b)), "
        "cand AS (SELECT DISTINCT a.vec_id AS id_a, b2.vec_id AS id_b, "
        "a.srp_bits AS bits_a, b2.srp_bits AS bits_b "
        "FROM bands a JOIN bands b2 ON a.b = b2.b "
        "AND a.band_val = b2.band_val AND a.vec_id < b2.vec_id) "
        "SELECT id_a, id_b, "
        "CAST(bit_count(xor(bits_a, bits_b)) AS INTEGER) AS hamming "
        "FROM cand "
        f"WHERE bit_count(xor(bits_a, bits_b)) <= {SRP_HAMMING_MAX}"
    ),
    doc=(
        "Embedding near-duplicate pairs by SRP Hamming distance: band "
        "the 32 bits into 4 x 8-bit keys, self-equi-join on (band, key) "
        "— the LSH bucket join, never all-pairs — then verify "
        "bit_count(xor) <= 6 on the candidate set only. The quadratic "
        "step is confined to one 8-bit bucket per band."
    ),
)
def srp_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    bits = emb.select(
        "vec_id", F.expr(bucket_sql("embedding", SRP_PLANES)).alias("srp_bits")
    )
    # cache: banding reads it SRP_BANDS times and the verify reads it
    # twice more — at scale this is the persisted signature table
    bits = bits.cache()
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("b"),
                (
                    F.shiftright("srp_bits", b * SRP_BAND_BITS)
                    % F.lit(1 << SRP_BAND_BITS)
                ).alias("band_val"),
            )
            for b in range(SRP_BANDS)
        ]
    )
    bands = bits.select(
        "vec_id", "srp_bits", F.explode(band_structs).alias("bk")
    ).select("vec_id", "srp_bits", "bk.b", "bk.band_val")
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.col("a.srp_bits").alias("bits_a"),
            F.col("b.srp_bits").alias("bits_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.expr("bits_a ^ bits_b")).cast("int")
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= SRP_HAMMING_MAX)
        .select("id_a", "id_b", "hamming")
    )
