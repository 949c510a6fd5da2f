"""SemDeDup — cluster-scoped semantic deduplication queries (round 7).

The published recipe (Abbas et al. 2023, arXiv:2303.09540): k-means the
embedding space, compute pairwise cosines only WITHIN each cluster, prune
semantic duplicates keeping the member least similar to its centroid.
This is the low-threshold complement to the LSH copy-dedup family
(`embedding_dedup`): hyperplane banding keeps a cos=0.9 pair with high
probability but a cos=0.4 "same meaning, different words" pair with
almost none — for the semantic band the cluster partition IS the blocking
structure.

Everything is deterministic (seed centroids = k smallest-id nonzero
vectors; left-to-right double folds), so all three queries have exact
DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.clustering import (
    K_CLUSTERS,
    SEMDEDUP_THRESHOLD,
    duck_sqdist,
    semdedup_keep,
    semdedup_pairs,
)
from ..operators.similarity import duck_dot, duck_norm
from ..sources.catalog import load_table
from .registry import query


def _semdedup_ctes(
    threshold: float = SEMDEDUP_THRESHOLD,
    k: int = K_CLUSTERS,
    src: str = "embeddings",
    vec_col: str = "embedding",
) -> str:
    """Shared oracle CTE chain: norm-filtered base -> seed centroids ->
    assignment -> members -> within-cluster threshold pairs.

    `e`/`m`/`pairs` are MATERIALIZED: DuckDB inlines CTEs, and each is
    referenced 2-4 times downstream (the BPE-oracle lesson).
    ``src``/``vec_col`` let compositions (e.g. the PCA projection)
    re-target the chain at a derived CTE instead of the raw table.
    """
    cos = f"{duck_dot('a.v', 'b.v')} / (a.nrm * b.nrm)"
    return (
        f"e AS MATERIALIZED (SELECT vec_id AS id, {vec_col} AS v, "
        f"{duck_norm(vec_col)} AS nrm FROM {src} "
        f"WHERE {duck_norm(vec_col)} > 0), "
        f"c AS (SELECT id AS cid, v AS cvec, nrm AS cnrm FROM e "
        f"ORDER BY id LIMIT {k}), "
        f"d AS (SELECT e.id, c.cid, {duck_sqdist('e.v', 'c.cvec')} AS sqdist "
        "FROM e CROSS JOIN c), "
        "assign AS (SELECT id, cid AS cluster_id FROM d "
        "QUALIFY row_number() OVER (PARTITION BY id ORDER BY sqdist, cid) = 1), "
        "m AS MATERIALIZED (SELECT a.cluster_id, e.id, e.v, e.nrm "
        "FROM e JOIN assign a USING (id)), "
        "pairs AS MATERIALIZED (SELECT a.cluster_id, a.id AS id_a, "
        f"b.id AS id_b, {cos} AS cos_sim "
        "FROM m a JOIN m b ON a.cluster_id = b.cluster_id AND a.id < b.id "
        f"WHERE {cos} >= {threshold})"
    )


_CCOS_CTE = (
    "cc AS MATERIALIZED (SELECT m.id, m.cluster_id, "
    f"{duck_dot('m.v', 'c.cvec')} / (m.nrm * c.cnrm) AS centroid_cos "
    "FROM m JOIN c ON m.cluster_id = c.cid)"
)

# Everything after the shared CTE chain is source-independent; the PCA
# composition reuses it over a projected-vector CTE.
KEEP_TAIL = (
    f"{_CCOS_CTE}, "
    "sym AS (SELECT id_a AS vid, id_b AS other FROM pairs "
    "UNION ALL SELECT id_b AS vid, id_a AS other FROM pairs), "
    "pruned AS (SELECT DISTINCT s.vid FROM sym s "
    "JOIN cc x ON s.vid = x.id JOIN cc o ON s.other = o.id "
    "WHERE o.centroid_cos < x.centroid_cos "
    "OR (o.centroid_cos = x.centroid_cos AND s.other < s.vid)) "
    "SELECT cc.id AS vec_id, cc.cluster_id, cc.centroid_cos, "
    "CAST(CASE WHEN p.vid IS NULL THEN 1 ELSE 0 END AS INT) AS kept "
    "FROM cc LEFT JOIN pruned p ON cc.id = p.vid"
)

_KEEP_SQL = f"WITH {_semdedup_ctes()}, {KEEP_TAIL}"


@query(
    "semdedup_pairs",
    oracle=(
        f"WITH {_semdedup_ctes()} "
        "SELECT cluster_id, id_a, id_b, cos_sim FROM pairs"
    ),
    doc=(
        "SemDeDup candidate pairs: k-means-partition the embeddings "
        "(deterministic seed centroids, broadcast nested-loop "
        "assignment — the corpus never shuffles for it), then pairwise "
        "cosine WITHIN each cluster only. The Spark plan self-joins the "
        "skinny (cluster_id, id) table and joins vectors back by id, so "
        "arrays never ride the cluster shuffle; identical vectors "
        "collapse to a rep before the quadratic join and expand back "
        "after (exact). Cost is sum |cluster|^2, bounded by k ~ n / "
        "target — the paper's own scale argument — with a loud "
        "max_cluster guard instead of a silent quadratic join."
    ),
)
def semdedup_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return semdedup_pairs(emb)


@query(
    "semdedup_prune",
    oracle=_KEEP_SQL,
    doc=(
        "The SemDeDup keep decision per vector: within each semantic-"
        "duplicate neighborhood keep the member with the LOWEST cosine "
        "to its cluster centroid (the most novel exemplar), ties toward "
        "the smaller id. Spelled as pairwise domination (pruned iff a "
        ">=threshold partner has strictly lower centroid_cos) so the "
        "policy is exactly SQL-mirrorable with no transitive closure; "
        "for duplicate cliques it equals the paper's argmin rule. "
        "centroid_cos is computed once per distinct vector and "
        "inherited by identical-vector members."
    ),
)
def semdedup_prune_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return semdedup_keep(emb)


@query(
    "semdedup_cluster_stats",
    oracle=(
        f"WITH base AS ({_KEEP_SQL}) "
        "SELECT cluster_id, COUNT(*) AS n_members, "
        "CAST(SUM(kept) AS BIGINT) AS n_kept, "
        "CAST(COUNT(*) - SUM(kept) AS BIGINT) AS n_pruned, "
        "CAST(COUNT(*) - SUM(kept) AS DOUBLE) / COUNT(*) AS prune_rate "
        "FROM base GROUP BY cluster_id"
    ),
    doc=(
        "Per-cluster SemDeDup curation report: members, kept, pruned, "
        "prune rate — the dataset-shrink dashboard a 100 TB curation "
        "run reads before committing a prune threshold. One extra "
        "aggregate over the keep decision; prune_rate is one IEEE "
        "division of exact integers (bit-identical across engines)."
    ),
)
def semdedup_cluster_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    keep = semdedup_keep(emb)
    return keep.groupBy("cluster_id").agg(
        F.count("*").alias("n_members"),
        F.sum("kept").cast("bigint").alias("n_kept"),
        (F.count("*") - F.sum("kept")).cast("bigint").alias("n_pruned"),
        (
            (F.count("*") - F.sum("kept")).cast("double") / F.count("*")
        ).alias("prune_rate"),
    )
