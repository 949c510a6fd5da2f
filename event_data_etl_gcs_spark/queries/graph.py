"""Graph analytics over the embedding kNN graph (round 3).

The substrate is the exact cosine kNN graph over the embeddings table
(deterministic: bit-exact cosines + id tiebreaks, verified in prior
rounds), symmetrized to an undirected u<v edge list. On top of it:
per-node triangle counts / local clustering coefficient (integer-exact),
bounded-depth BFS hop distances (integer-exact, DuckDB recursive-CTE
oracle), and fixed-iteration PageRank (rows-only; numpy-verified in
tests/test_graph.py — cross-partition double sums are last-ulp
nondeterministic by construction).

These extend the dedup-clustering machinery (operators/graph.py
connected_components) to the general graph-analytics surface a
training-data pipeline uses for corpus structure analysis: duplicate
neighborhoods, embedding-space connectivity, centrality-weighted
sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.graph import (
    KNN_ANN_MAX_BUCKET,
    KNN_ANN_RING_CAP,
    PR_SCALE,
    bfs_hops,
    knn_edges,
    pagerank,
    triangle_counts,
)
from ..operators.similarity import duck_dot, duck_norm
from ..sources.catalog import load_table
from .registry import query

K_NN = 3
BFS_MAX_HOPS = 4

# Exact cosine top-K_NN per vector, symmetrized to undirected u<v edges.
# cos_sim is direction-independent bit-exact (elementwise multiply
# commutes; the fold order over dims is fixed), so DISTINCT collapses
# the two directions of a mutual-kNN pair to one row in both engines.
_DUCK_EDGE_CTES = (
    "n AS (SELECT vec_id, embedding, "
    f"{duck_norm('embedding')} AS nrm FROM embeddings), "
    "scored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, "
    f"{duck_dot('q.embedding', 'c.embedding')} / (q.nrm * c.nrm) AS cos_sim "
    "FROM n q JOIN n c ON c.vec_id <> q.vec_id "
    "WHERE q.nrm > 0 AND c.nrm > 0), "
    "knn AS (SELECT * FROM scored QUALIFY row_number() OVER "
    f"(PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) <= {K_NN}), "
    "edges AS (SELECT DISTINCT least(query_id, neighbor_id) AS u, "
    "greatest(query_id, neighbor_id) AS v, cos_sim FROM knn), "
    "ed AS (SELECT u, v FROM edges)"
)


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out: the exact substrate's crossJoin amplifies every corpus row
    # 2000x, so scan parallelism is the whole wall (15.6 s -> 6.6 s for
    # graph_pagerank at sf0.1).
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    return knn_edges(emb, k=K_NN)


@query(
    "knn_graph_edges",
    oracle=f"WITH {_DUCK_EDGE_CTES} SELECT u, v, cos_sim FROM edges",
    doc=(
        "Undirected exact-cosine kNN graph over the embeddings table: "
        "(u, v, cos_sim) with u < v. Broadcast query side, JVM-lambda "
        "dot products, per-query top-k window; at 100 TB swap the "
        "brute-force candidate step for the ANN paths (LSH/IVF/PQ) and "
        "keep the symmetrize+distinct contract."
    ),
)
def knn_graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _edges(spark, sf_dir)


def duck_triangle_sql(edge_ctes: str) -> str:
    """Triangle-count + lcc oracle over any edge-CTE chain ending in
    ``ed(u, v)`` — shared by the exact- and ANN-substrate variants."""
    return (
        f"WITH {edge_ctes}, "
        "tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c "
        "FROM ed e1 JOIN ed e2 ON e2.u = e1.v "
        "JOIN ed e3 ON e3.u = e1.u AND e3.v = e2.v), "
        "corners AS (SELECT a AS node FROM tri "
        "UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri), "
        "tcount AS (SELECT node, count(*) AS n_triangles "
        "FROM corners GROUP BY node), "
        "sym AS (SELECT u, v FROM ed UNION ALL SELECT v, u FROM ed), "
        "deg AS (SELECT u AS node, count(*) AS degree FROM sym GROUP BY u) "
        "SELECT d.node, d.degree, "
        "COALESCE(t.n_triangles, 0) AS n_triangles, "
        "CASE WHEN d.degree > 1 THEN 2.0 * COALESCE(t.n_triangles, 0) "
        "/ (d.degree * (d.degree - 1)) ELSE 0.0 END AS lcc "
        "FROM deg d LEFT JOIN tcount t USING (node)"
    )


def duck_bfs_sql(edge_ctes: str, max_hops: int) -> str:
    """Bounded-BFS oracle over any edge-CTE chain ending in ``ed(u, v)``
    — shared by the exact- and ANN-substrate variants."""
    return (
        f"WITH RECURSIVE {edge_ctes}, "
        "sym AS (SELECT u, v FROM ed UNION ALL SELECT v, u FROM ed), "
        "seed AS (SELECT min(u) AS node FROM ed), "
        "walk(node, hops) AS ("
        "SELECT node, 0 FROM seed "
        "UNION ALL "
        "SELECT s.v, w.hops + 1 FROM walk w JOIN sym s ON s.u = w.node "
        f"WHERE w.hops < {max_hops}) "
        "SELECT node, CAST(min(hops) AS INT) AS hops FROM walk GROUP BY node"
    )


@query(
    "graph_triangle_counts",
    oracle=duck_triangle_sql(_DUCK_EDGE_CTES),
    doc=(
        "Per-node triangle participation + local clustering coefficient "
        "over the kNN graph. Triangles enumerated once each (a<b<c) via "
        "two shuffle joins on the oriented edge list; counts are exact "
        "integers and lcc = 2T/(d(d-1)) is a single bit-portable double "
        "division. kNN graphs bound degree by 2k, so id-orientation is "
        "already the compact-forward bound."
    ),
)
def graph_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return triangle_counts(_edges(spark, sf_dir).select("u", "v"))


@query(
    "graph_bfs_hops",
    oracle=duck_bfs_sql(_DUCK_EDGE_CTES, BFS_MAX_HOPS),
    doc=(
        "Minimum hop distance from the min-id node to everything within "
        f"{BFS_MAX_HOPS} hops of it on the kNN graph: bounded frontier "
        "expansion, one shuffle join + min-groupBy per level, no "
        "convergence check needed. Oracle is a DuckDB recursive CTE "
        "over the same edges — hop counts are integer-exact."
    ),
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bfs_hops(_edges(spark, sf_dir).select("u", "v"), max_hops=BFS_MAX_HOPS)


PR_ITERS = 10


def duck_pagerank_ctes(edge_ctes: str, iters: int = PR_ITERS) -> str:
    """Exact-oracle CTE chain for the scaled-integer PageRank over any
    edge relation: ``edge_ctes`` must end with an ``ed(u, v)`` CTE
    (undirected u<v bigint edges); the fixed iterations unroll as
    chained CTEs (pr0..prN), every step integer floor arithmetic — the
    same device the kmeans oracle uses to replay Lloyd rounds.
    base = (scale*(den-num)) // (den*N) matches the Spark side's
    Python-computed literal integer-for-integer. The final CTE is
    ``pr{iters}(node, r)``."""
    from ..operators.graph import PR_DAMP_DEN, PR_DAMP_NUM, PR_SCALE

    ctes = [
        edge_ctes,
        "sym AS MATERIALIZED (SELECT u, v FROM ed UNION ALL SELECT v, u FROM ed)",
        "deg AS MATERIALIZED (SELECT u AS node, COUNT(*) AS degree "
        "FROM sym GROUP BY u)",
        "nn AS (SELECT COUNT(*) AS n FROM deg)",
        f"pr0 AS MATERIALIZED (SELECT node, CAST({PR_SCALE} // n AS BIGINT) "
        "AS r FROM deg, nn)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"pr{i} AS MATERIALIZED (SELECT d.node, CAST("
            f"(({PR_SCALE} * {PR_DAMP_DEN - PR_DAMP_NUM}) "
            f"// ({PR_DAMP_DEN} * nn.n)) "
            f"+ ({PR_DAMP_NUM} * COALESCE(m.mass, 0)) // {PR_DAMP_DEN} "
            "AS BIGINT) AS r "
            "FROM deg d CROSS JOIN nn LEFT JOIN ("
            "SELECT s.v AS node, SUM(p.r // d2.degree) AS mass "
            f"FROM sym s JOIN pr{i - 1} p ON p.node = s.u "
            "JOIN deg d2 ON d2.node = s.u GROUP BY s.v) m "
            "ON m.node = d.node)"
        )
    return ", ".join(ctes)


def _duck_pagerank_sql() -> str:
    from ..operators.graph import PR_SCALE

    return (
        f"WITH {duck_pagerank_ctes(_DUCK_EDGE_CTES)} "
        f"SELECT node, r AS pr_scaled, "
        f"CAST(r AS DOUBLE) / {PR_SCALE} AS pagerank FROM pr{PR_ITERS}"
    )


@query(
    "graph_pagerank",
    oracle=_duck_pagerank_sql(),
    doc=(
        "Fixed-iteration (10) damped PageRank over the kNN graph in "
        "SCALED-INTEGER arithmetic (rank mass as int64 units of 1e-12; "
        "damping 17/20 as exact rationals): cached adjacency+degree, "
        "one shuffle join + groupBy-sum per iteration — the standard "
        "large-scale power-iteration shape, now partitioning-independent "
        "and ORACLE-EXACT (closes the registry's last oracle exemption; "
        "the float operator remains the production path, numpy-verified "
        "in test_graph.py, and agrees with this one to ~1e-11)."
    ),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank_quantized

    return pagerank_quantized(
        _edges(spark, sf_dir).select("u", "v"), iterations=PR_ITERS
    )


def duck_banded_cand_ctes(
    n_bands: int = 4,
    band_bits: int = 4,
    max_bucket: int | None = None,
    ring_cap: int | None = None,
) -> str:
    """CTE chain ``base, valid, banded, ..., cand`` mirroring
    operators/graph.banded_srp_candidates over the embeddings table —
    shared by the knn_graph_edges_ann and embedding_dedup oracles.

    Same deterministic hyperplanes (duck_hyperplane_sign ≡ the Spark
    sign expression, left-to-right fold), same banded candidate
    equi-join. With ``max_bucket``+``ring_cap`` the mirror reproduces
    the hybrid skew posture bit-for-bit: buckets with <= max_bucket
    members keep the exact within-bucket join; hot buckets rank members
    by the same continuous per-band random projection (plane index
    band + n_bands*band_bits — identical double fold in both engines)
    and pair each member with the next ring_cap positions. The ring's
    BETWEEN range join here is output-equivalent to Spark's clamped
    explode+equi-join spelling (positions past the bucket end simply
    never match)."""
    from ..operators.similarity import duck_hyperplane_sign

    def band_bucket(band: int) -> str:
        return " + ".join(
            f"(CASE WHEN {duck_hyperplane_sign(band * band_bits + b, 'embedding')} > 0 "
            f"THEN {1 << b} ELSE 0 END)"
            for b in range(band_bits)
        )

    banded = " UNION ALL ".join(
        f"SELECT id, {band} AS band, {band_bucket(band)} AS bkt, "
        f"{duck_hyperplane_sign(band + n_bands * band_bits, 'embedding')} AS proj "
        "FROM valid"
        for band in range(n_bands)
    )
    if max_bucket is not None and ring_cap is not None:
        cand = (
            "sized AS (SELECT id, band, bkt, proj, "
            "COUNT(*) OVER (PARTITION BY band, bkt) AS bsz FROM banded), "
            "small_pairs AS (SELECT a.id AS ida, b.id AS idb FROM sized a "
            "JOIN sized b ON a.band = b.band AND a.bkt = b.bkt AND a.id < b.id "
            f"WHERE a.bsz <= {max_bucket}), "
            "pos AS (SELECT id, band, bkt, row_number() OVER "
            "(PARTITION BY band, bkt ORDER BY proj, id) AS pos "
            f"FROM sized WHERE bsz > {max_bucket}), "
            "ring_pairs AS (SELECT least(l.id, r.id) AS ida, "
            "greatest(l.id, r.id) AS idb FROM pos l JOIN pos r "
            "ON l.band = r.band AND l.bkt = r.bkt "
            f"AND r.pos > l.pos AND r.pos <= l.pos + {ring_cap}), "
            "cand AS (SELECT DISTINCT ida, idb FROM "
            "(SELECT * FROM small_pairs UNION ALL SELECT * FROM ring_pairs))"
        )
    elif max_bucket is None and ring_cap is None:
        cand = (
            "cand AS (SELECT DISTINCT a.id AS ida, b.id AS idb FROM banded a "
            "JOIN banded b ON a.band = b.band AND a.bkt = b.bkt AND a.id < b.id)"
        )
    else:
        raise ValueError("mirror supports hybrid (both caps) or uncapped (neither)")
    return (
        "base AS (SELECT vec_id AS id, embedding, "
        f"{duck_norm('embedding')} AS nrm FROM embeddings), "
        "valid AS (SELECT * FROM base WHERE nrm > 0), "
        f"banded AS ({banded}), "
        f"{cand}"
    )


def duck_ann_edge_ctes(
    k: int = K_NN,
    n_bands: int = 4,
    band_bits: int = 4,
    max_bucket: int | None = None,
    ring_cap: int | None = None,
) -> str:
    """DuckDB mirror of operators/graph.py knn_edges_ann as a CTE chain
    ending in ``edges(u, v, cos_sim)`` and ``ed(u, v)`` — the shared
    banded candidate chain + exact-cosine per-node top-k and u<v
    symmetrization, spliceable into the pagerank/triangle/BFS oracle
    builders exactly like ``_DUCK_EDGE_CTES`` (VERDICT r10 #1)."""
    return (
        f"{duck_banded_cand_ctes(n_bands, band_bits, max_bucket, ring_cap)}, "
        "scored AS (SELECT ida, idb, "
        f"{duck_dot('va.embedding', 'vb.embedding')} / (va.nrm * vb.nrm) AS cos_sim "
        "FROM cand JOIN valid va ON va.id = cand.ida "
        "JOIN valid vb ON vb.id = cand.idb), "
        "sym2 AS (SELECT ida AS query_id, idb AS neighbor_id, cos_sim FROM scored "
        "UNION ALL SELECT idb, ida, cos_sim FROM scored), "
        "topk AS (SELECT * FROM sym2 QUALIFY row_number() OVER "
        f"(PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) <= {k}), "
        "edges AS MATERIALIZED (SELECT DISTINCT least(query_id, neighbor_id) AS u, "
        "greatest(query_id, neighbor_id) AS v, cos_sim FROM topk), "
        "ed AS (SELECT u, v FROM edges)"
    )


def _duck_ann_edges_sql(
    k: int = K_NN,
    n_bands: int = 4,
    band_bits: int = 4,
    max_bucket: int | None = None,
    ring_cap: int | None = None,
) -> str:
    return (
        f"WITH {duck_ann_edge_ctes(k, n_bands, band_bits, max_bucket, ring_cap)} "
        "SELECT u, v, cos_sim FROM edges"
    )


@query(
    "knn_graph_edges_ann",
    # Mirrors the DEFAULT call exactly: auto band_bits resolves to 4 for
    # every test corpus (n <= 4096 -> max(4, ceil(log2(n/256))) = 4; the
    # embeddings table is 500/500/2000 rows at sf0.001/0.01/0.1), and the
    # default hybrid caps are mirrored bit-for-bit — at sf0.1 the 725-
    # member hot bucket actually engages the ring, so this oracle checks
    # the capped semantics, not just the exact join.
    oracle=_duck_ann_edges_sql(
        max_bucket=KNN_ANN_MAX_BUCKET, ring_cap=KNN_ANN_RING_CAP
    ),
    doc=(
        "Scale-path kNN graph build: banded SRP candidates equi-join on "
        "(band, bucket) with no corpus broadcast, embeddings join back "
        "by id, exact cosines rank per node — same u<v edge contract as "
        "knn_graph_edges with sub-quadratic candidate generation. "
        "Round 6: the hybrid skew posture (max_bucket + ring_cap) and "
        "auto band_bits are the DEFAULT; the oracle mirrors the hybrid."
    ),
)
def knn_graph_edges_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import knn_edges_ann

    emb = load_table(spark, sf_dir, "embeddings")
    return knn_edges_ann(emb, k=K_NN)


@query(
    "knn_graph_edges_ann_capped",
    # Caps chosen to ENGAGE at the driver's sf0.01 gate (max bucket there
    # is 192 > 64): this row proves the ring-hybrid candidate path itself
    # — projection sort, position ring, least/greatest symmetrization —
    # hash-exact against the DuckDB mirror, at every test SF.
    oracle=_duck_ann_edges_sql(max_bucket=64, ring_cap=32),
    doc=(
        "Ring-hybrid kNN graph build with caps small enough to engage on "
        "the gate corpus: exact join inside sane (band, bucket) cells, "
        "continuous-projection ring sampling inside hot ones — the "
        "bounded posture the 100-TB call relies on, oracle-checked."
    ),
)
def knn_graph_edges_ann_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import knn_edges_ann

    emb = load_table(spark, sf_dir, "embeddings")
    return knn_edges_ann(emb, k=K_NN, band_bits=4, max_bucket=64, ring_cap=32)


# =========================================================================
# ANN-substrate graph family (VERDICT r10 directive #1): the SAME graph
# analytics, composed on the banded-SRP candidate build instead of the
# quadratic exact kNN. This is the form a user actually runs at 100 TB —
# the exact substrate broadcasts the full embeddings table and scores
# all pairs, while knn_edges_ann shuffles candidates on (band, bucket)
# with hybrid skew caps and never materializes the cross product. The
# oracles splice duck_ann_edge_ctes into the same pagerank/triangle/BFS
# CTE builders the exact family uses, so the composed semantics stay
# oracle-EXACT end to end (candidate generation included).
# =========================================================================

# Mirrors the DEFAULT knn_edges_ann call (auto band_bits resolves to 4
# on every test corpus; hybrid caps engage on sf0.1's hot bucket — see
# knn_graph_edges_ann above, whose oracle pins the same chain).
_DUCK_ANN_EDGE_CTES = duck_ann_edge_ctes(
    max_bucket=KNN_ANN_MAX_BUCKET, ring_cap=KNN_ANN_RING_CAP
)


def _ann_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import knn_edges_ann

    emb = load_table(spark, sf_dir, "embeddings")
    return knn_edges_ann(emb, k=K_NN)


@query(
    "graph_pagerank_ann",
    oracle=(
        f"WITH {duck_pagerank_ctes(_DUCK_ANN_EDGE_CTES)} "
        f"SELECT node, r AS pr_scaled, "
        f"CAST(r AS DOUBLE) / {PR_SCALE} AS pagerank FROM pr{PR_ITERS}"
    ),
    doc=(
        "Scaled-integer PageRank over the ANN-built kNN graph: the "
        "banded-SRP candidate path (equi-join on (band, bucket), hybrid "
        "skew caps, no corpus broadcast) feeds the same "
        "partitioning-independent int64 power iteration as "
        "graph_pagerank — this is the registered 100 TB form; the exact "
        "variant remains as the small-corpus/recall yardstick. Oracle = "
        "the banded candidate CTE chain spliced into the unrolled "
        "pagerank CTEs, exact end to end."
    ),
)
def graph_pagerank_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank_quantized

    return pagerank_quantized(
        _ann_edges(spark, sf_dir).select("u", "v"), iterations=PR_ITERS
    )


@query(
    "graph_triangle_counts_ann",
    oracle=duck_triangle_sql(_DUCK_ANN_EDGE_CTES),
    doc=(
        "Per-node triangle participation + local clustering coefficient "
        "over the ANN-built kNN graph — same integer-exact enumeration "
        "as graph_triangle_counts, sub-quadratic substrate."
    ),
)
def graph_triangle_counts_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    return triangle_counts(_ann_edges(spark, sf_dir).select("u", "v"))


@query(
    "graph_bfs_hops_ann",
    oracle=duck_bfs_sql(_DUCK_ANN_EDGE_CTES, BFS_MAX_HOPS),
    doc=(
        "Bounded-depth BFS hop distances over the ANN-built kNN graph — "
        "same integer-exact frontier expansion as graph_bfs_hops, "
        "sub-quadratic substrate."
    ),
)
def graph_bfs_hops_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bfs_hops(
        _ann_edges(spark, sf_dir).select("u", "v"), max_hops=BFS_MAX_HOPS
    )
