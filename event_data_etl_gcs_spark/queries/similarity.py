"""Similarity-search queries over the embeddings table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    COSINE_DEDUP_MAX_BUCKET,
    COSINE_DEDUP_RING_CAP,
    brute_force_topk,
    cosine_dedup_pairs,
    dot_sql,
    duck_bucket,
    duck_dot,
    duck_norm,
    lsh_bucket_topk,
    norm_sql,
)
from ..sources.catalog import load_table
from .registry import query

N_QUERY_VECS = 10
TOP_K = 5


def _duck_knn_sql(bucketed: bool) -> str:
    """Shared oracle skeleton for brute-force and LSH top-k."""
    bucket_cols = f", {duck_bucket('embedding')} AS bucket" if bucketed else ""
    join_cond = (
        "c.bucket = q.bucket AND c.vec_id <> q.vec_id"
        if bucketed
        else "c.vec_id <> q.vec_id"
    )
    return f"""
WITH vecs AS (
  SELECT vec_id, embedding, {duck_norm('embedding')} AS nrm{bucket_cols}
  FROM embeddings
  WHERE {duck_norm('embedding')} > 0
), q AS (
  SELECT * FROM vecs WHERE vec_id < {N_QUERY_VECS}
), scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {duck_dot('q.embedding', 'c.embedding')} / (q.nrm * c.nrm) AS cos_sim
  FROM vecs c JOIN q ON {join_cond}
), ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= {TOP_K}
"""


@query(
    "ann_brute_force",
    oracle=_duck_knn_sql(bucketed=False),
    doc=(
        "Exact cosine top-k (baseline ANN): broadcast query set x corpus, "
        "double-precision dot products, deterministic tie-break."
    ),
)
def ann_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return brute_force_topk(emb, queries_df, k=TOP_K)


@query(
    "ann_lsh",
    oracle=_duck_knn_sql(bucketed=True),
    doc=(
        "LSH-bucketed approximate top-k: deterministic random-hyperplane "
        "bucket ids (map-only), candidate join confined to the query's "
        "bucket — the scale path for ANN."
    ),
)
def ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return lsh_bucket_topk(emb, queries_df, k=TOP_K)


@query(
    "ann_ivf_cells",
    oracle=f"""
WITH vecs AS (
  SELECT vec_id, label, embedding, {duck_norm('embedding')} AS nrm
  FROM embeddings
  WHERE {duck_norm('embedding')} > 0
), q AS (
  SELECT * FROM vecs WHERE vec_id < {N_QUERY_VECS}
), scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {duck_dot('q.embedding', 'c.embedding')} / (q.nrm * c.nrm) AS cos_sim
  FROM vecs c JOIN q ON c.label = q.label AND c.vec_id <> q.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= {TOP_K}
""",
    doc=(
        "IVF-style ANN: the label column acts as the coarse-quantizer "
        "cell; search only within the query's cell (candidate set = one "
        "cell, not the corpus). The inverted-file pattern as an equi-join."
    ),
)
def ann_ivf_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select(
        "vec_id", "label", F.col("embedding").alias("v"),
        F.expr(norm_sql("embedding")).alias("nrm"),
    ).filter(F.col("nrm") > 0)
    q = vecs.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), "label",
        F.col("v").alias("qv"), F.col("nrm").alias("qnrm"),
    )
    scored = (
        vecs.join(F.broadcast(q), "label")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (F.expr(dot_sql("qv", "v")) / (F.col("qnrm") * F.col("nrm"))).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _duck_ivf_trained_sql(
    k_cells: int = 8, iterations: int = 2, n_probe: int = 3, k: int = TOP_K
) -> str:
    """Relational replay of train_ivf_centroids + ivf_topk: pinned seed
    cells (first k vectors, cell = 0..k-1), per-iteration assignment
    (same sqdist fold, ties to the lower cell) + quantized-integer cell
    means (operators/clustering.QMEAN_SCALE — the round-6 device that
    made the trained index oracle-exact), then the inverted-file probe:
    each query ranks cells by centroid distance, probes the n_probe
    nearest, exact cosines rank within the probed cells."""
    from ..operators.clustering import duck_quantized_mean, duck_sqdist

    ctes = [
        "cent0 AS MATERIALIZED (SELECT row_number() OVER (ORDER BY vec_id) - 1 "
        "AS cell, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS centroid "
        f"FROM embeddings ORDER BY vec_id LIMIT {k_cells})"
    ]
    for it in range(1, iterations + 1):
        prev = f"cent{it - 1}"
        ctes.append(
            f"d{it} AS (SELECT e.vec_id, c.cell, "
            f"{duck_sqdist('e.embedding', 'c.centroid')} AS sqd "
            f"FROM embeddings e CROSS JOIN {prev} c)"
        )
        ctes.append(
            f"a{it} AS MATERIALIZED (SELECT vec_id, cell FROM d{it} "
            "QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sqd, cell) = 1)"
        )
        ctes.append(
            f"m{it} AS (SELECT a.cell, r.di - 1 AS dim, "
            f"{duck_quantized_mean('e.embedding[r.di]')} AS m "
            f"FROM embeddings e JOIN a{it} a ON e.vec_id = a.vec_id, "
            "unnest(range(1, len(e.embedding) + 1)) AS r(di) "
            "GROUP BY a.cell, r.di)"
        )
        ctes.append(
            f"cent{it} AS MATERIALIZED (SELECT cell, "
            f"list(m ORDER BY dim) AS centroid FROM m{it} GROUP BY cell)"
        )
    cent = f"cent{iterations}"
    probe = (
        f"vd AS (SELECT e.vec_id, e.embedding, c.cell, "
        f"{duck_sqdist('e.embedding', 'c.centroid')} AS sqd "
        f"FROM embeddings e CROSS JOIN {cent} c), "
        "inv AS MATERIALIZED (SELECT vec_id, embedding, cell, "
        f"{duck_norm('embedding')} AS nrm FROM vd "
        "QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sqd, cell) = 1), "
        "invv AS (SELECT * FROM inv WHERE nrm > 0), "
        "qc AS (SELECT vec_id AS query_id, embedding AS qv, cell, "
        f"{duck_norm('embedding')} AS qnrm FROM vd "
        f"WHERE vec_id < {N_QUERY_VECS} "
        "QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sqd, cell) "
        f"<= {n_probe}), "
        "qcv AS (SELECT * FROM qc WHERE qnrm > 0), "
        "scored AS (SELECT q.query_id, i.vec_id AS neighbor_id, "
        f"{duck_dot('q.qv', 'i.embedding')} / (q.qnrm * i.nrm) AS cos_sim "
        "FROM invv i JOIN qcv q ON i.cell = q.cell "
        "AND i.vec_id <> q.query_id) "
        "SELECT query_id, neighbor_id, cos_sim, "
        "CAST(row_number() OVER (PARTITION BY query_id "
        "ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS rank "
        "FROM scored "
        "QUALIFY row_number() OVER (PARTITION BY query_id "
        f"ORDER BY cos_sim DESC, neighbor_id) <= {k}"
    )
    return "WITH " + ", ".join(ctes) + ", " + probe


@query(
    "ann_ivf_trained",
    oracle=_duck_ivf_trained_sql(),
    doc=(
        "Trained IVF ANN: k-means-lite coarse centroids (quantized-"
        "integer-mean training, pinned init — oracle-exact since round "
        "6), corpus inverted by nearest cell, queries probe the 3 "
        "nearest cells. The data-adaptive scale path beyond the "
        "label-cell and LSH variants."
    ),
)
def ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ivf import ivf_topk, train_ivf_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    cents = train_ivf_centroids(emb, k=8, iterations=2)
    return ivf_topk(emb, queries_df, cents, k=TOP_K, n_probe=3)


def _duck_cosine_dedup_sql(
    threshold: float,
    n_bands: int = 4,
    band_bits: int = 4,
    max_bucket: int | None = None,
    ring_cap: int | None = None,
) -> str:
    """DuckDB mirror of the banded cosine_dedup_pairs: the SAME shared
    candidate chain as the knn_graph_edges_ann oracle
    (queries/graph.duck_banded_cand_ctes — banded buckets, hybrid
    max_bucket/ring_cap with per-band continuous-projection rings),
    pass-1 threshold verify, then the COMPONENT-CLOSURE expansion as a
    recursive reachability CTE (min-label components of the pass-1
    pair graph -> every within-component pair re-verified exactly —
    the same dedup_clusters oracle pattern). No collapse CTE: the
    embeddings tables hold no bit-identical vectors at any SF
    (verified), so rep == row — collapse equivalence on
    duplicate-bearing corpora is pinned Spark-side in
    tests/test_similarity.py."""
    from .graph import duck_banded_cand_ctes

    cos = f"{duck_dot('va.embedding', 'vb.embedding')} / (va.nrm * vb.nrm)"
    return (
        "WITH RECURSIVE "
        f"{duck_banded_cand_ctes(n_bands, band_bits, max_bucket, ring_cap)}, "
        "p1 AS (SELECT cand.ida AS a, cand.idb AS b "
        "FROM cand JOIN valid va ON va.id = cand.ida "
        "JOIN valid vb ON vb.id = cand.idb "
        f"WHERE {cos} >= {threshold}), "
        "cedges AS (SELECT a AS u, b AS v FROM p1 "
        "UNION SELECT b AS u, a AS v FROM p1), "
        "reach AS (SELECT u AS node, u AS component FROM cedges "
        "UNION SELECT e.u AS node, r.component FROM cedges e "
        "JOIN reach r ON e.v = r.node), "
        "comp AS (SELECT node, MIN(component) AS component "
        "FROM reach GROUP BY node), "
        "cand2 AS (SELECT x.node AS ida, y.node AS idb FROM comp x "
        "JOIN comp y ON x.component = y.component AND x.node < y.node) "
        f"SELECT cand2.ida AS id_a, cand2.idb AS id_b, {cos} AS cos_sim "
        "FROM cand2 JOIN valid va ON va.id = cand2.ida "
        "JOIN valid vb ON vb.id = cand2.idb "
        f"WHERE {cos} >= {threshold}"
    )


@query(
    "embedding_dedup",
    # Mirrors the DEFAULT call: banded candidates (auto band_bits
    # resolves to 4 at every test SF), hybrid caps mirrored bit-for-bit
    # — at sf0.1 the 725-member hot bucket engages the ring.
    oracle=_duck_cosine_dedup_sql(
        0.9,
        max_bucket=COSINE_DEDUP_MAX_BUCKET,
        ring_cap=COSINE_DEDUP_RING_CAP,
    ),
    doc=(
        "Embedding-cosine near-duplicate pairs via banded SRP LSH "
        "(cos >= 0.9): same candidate engine as the ANN graph build — "
        "banding for RECALL (a single wide bucket hash keeps a 0.9 "
        "pair with p~0.08; four 4-bit bands keep it with p~0.95), "
        "hybrid hot-bucket caps for bounded cost, arrays join back by "
        "id. Candidate generation never goes quadratic."
    ),
)
def embedding_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Default call = round-6 bounded banded posture (collapse-identical
    # + max_bucket/ring_cap hybrid); the oracle mirrors it exactly.
    return cosine_dedup_pairs(load_table(spark, sf_dir, "embeddings"), threshold=0.9)


@query(
    "embedding_dedup_capped",
    # max_bucket=64 < the 192-member sf0.01 hot bucket: the ring path
    # actually runs at the driver's gate, hash-exact vs the mirror.
    oracle=_duck_cosine_dedup_sql(0.9, max_bucket=64, ring_cap=32),
    doc=(
        "Embedding near-dup pairs under the bounded hybrid posture with "
        "caps small enough to engage at gate scale: candidate output in "
        "a hot bucket is linear (members x ring_cap), embeddings join "
        "back by id — the 100-TB-safe spelling, oracle-checked."
    ),
)
def embedding_dedup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_dedup_pairs(emb, threshold=0.9, max_bucket=64, ring_cap=32)


@query(
    "embedding_label_stats",
    oracle="""
SELECT label,
       COUNT(*) AS n_vecs,
       MIN(CAST(embedding[1] AS DOUBLE)) AS min_dim0,
       MAX(CAST(embedding[1] AS DOUBLE)) AS max_dim0,
       MIN(vec_id) AS min_vec_id
FROM embeddings GROUP BY label
""",
    doc=(
        "Grouped vector statistics (IVF-style coarse-cell stats): "
        "per-label counts and exact component extrema. (Float component "
        "SUMs are deliberately excluded from the oracle surface: "
        "double->decimal conversion is not portable across engines.)"
    ),
)
def embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.min(F.element_at("embedding", 1).cast("double")).alias("min_dim0"),
        F.max(F.element_at("embedding", 1).cast("double")).alias("max_dim0"),
        F.min("vec_id").alias("min_vec_id"),
    )


@query(
    "label_centroids",
    oracle=(
        "WITH exploded AS ("
        "  SELECT label, i - 1 AS pos, embedding[i] AS val, vec_id "
        "  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS r(i)"
        "), ordered AS ("
        "  SELECT label, pos, COUNT(*) AS n, "
        "  list(CAST(val AS DOUBLE) ORDER BY vec_id) AS vals "
        "  FROM exploded GROUP BY label, pos"
        ") "
        "SELECT label, CAST(pos AS INTEGER) AS pos, "
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), vals), "
        "(acc, x) -> acc + x) / n AS centroid_val "
        "FROM ordered"
    ),
    doc=(
        "Per-label embedding centroids (class means) with ORDER-PINNED "
        "float summation: each (label, dim) group folds its values in "
        "vec_id order, so the double arithmetic is engine-identical — "
        "the deterministic-float-aggregation pattern for when decimal "
        "sums can't apply (full-precision floats). Map-side explode, one "
        "shuffle on (label, pos)."
    ),
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).select("label", "vec_id", "pos", F.col("val").cast("double").alias("val"))
    ordered = exploded.groupBy("label", "pos").agg(
        F.count("*").alias("n"),
        F.sort_array(
            F.collect_list(F.struct("vec_id", "val"))
        ).alias("pairs"),
    )
    return ordered.select(
        "label",
        F.col("pos").cast("int").alias("pos"),
        (
            F.expr(
                "aggregate(transform(pairs, p -> p.val), "
                "CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
            )
            / F.col("n")
        ).alias("centroid_val"),
    )


from ..operators.similarity import (  # noqa: E402
    INT8_LEVELS,
    duck_amax,
    duck_int8_quant,
    duck_int_dot,
    quantize_embeddings,
    quantized_topk,
)

_DUCK_QUANT_CTE = f"""
s AS (
  SELECT vec_id, embedding AS v, {duck_amax('embedding')} / {INT8_LEVELS} AS qscale
  FROM embeddings
), qz AS (
  SELECT vec_id, qscale, {duck_int8_quant('v', 'qscale')} AS qvec FROM s
), qn AS (
  SELECT vec_id, qscale, qvec, {duck_int_dot('qvec', 'qvec')} AS qnorm_sq FROM qz
)
"""


@query(
    "embedding_quantize",
    oracle=(
        f"WITH {_DUCK_QUANT_CTE} SELECT vec_id, qscale, "
        "array_to_string(qvec, ',') AS qvec, qnorm_sq FROM qn"
    ),
    doc=(
        "Int8 scalar quantization of the embedding column (scale = "
        "max|x|/127, round-half-up spelled as floor(v+0.5) in both "
        "engines). Map-only compression pass — 4x smaller ANN corpus at "
        "100 TB. Exact int64 self-dot rides along as qnorm_sq. The qvec "
        "is emitted comma-joined so every int8 lane is still value-hashed "
        "while the driver-visible column stays scalar (the operator "
        "quantize_embeddings keeps the real array form)."
    ),
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = quantize_embeddings(emb)
    return q.select(
        "vec_id", "qscale", F.array_join("qvec", ",").alias("qvec"), "qnorm_sq"
    )


@query(
    "ann_quantized",
    oracle=f"""
WITH {_DUCK_QUANT_CTE}, c AS (
  SELECT * FROM qn WHERE qscale > 0
), q AS (
  SELECT * FROM c WHERE vec_id < {N_QUERY_VECS}
), scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST({duck_int_dot('q.qvec', 'c.qvec')} AS DOUBLE)
         / (sqrt(CAST(q.qnorm_sq AS DOUBLE)) * sqrt(CAST(c.qnorm_sq AS DOUBLE))) AS qcos
  FROM c JOIN q ON c.vec_id <> q.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, qcos,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY qcos DESC, neighbor_id) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, qcos, rank FROM ranked WHERE rank <= {TOP_K}
""",
    doc=(
        "ANN over the int8-quantized corpus: exact int64 dot products / "
        "IEEE norms, so the full RANKING is oracle-exact (no float-sum "
        "fold pinning needed). Broadcast queries x partitioned int8 "
        "corpus — the quantization-at-scale search path."
    ),
)
def ann_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return quantized_topk(emb, queries_df, k=TOP_K)


# ---------------------------------------------------------------------------
# Hard-negative mining (retrieval / embedding training)
# ---------------------------------------------------------------------------

@query(
    "hard_negative_mining",
    oracle=f"""
WITH vecs AS (
  SELECT vec_id, label, embedding, {duck_norm('embedding')} AS nrm
  FROM embeddings
  WHERE {duck_norm('embedding')} > 0
), q AS (
  SELECT * FROM vecs WHERE vec_id < {N_QUERY_VECS}
), scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         (c.label = q.label) AS same_label,
         {duck_dot('q.embedding', 'c.embedding')} / (q.nrm * c.nrm) AS cos_sim
  FROM vecs c JOIN q ON c.vec_id <> q.vec_id
), with_pos AS (
  SELECT query_id, neighbor_id, same_label, cos_sim,
         MAX(CASE WHEN same_label THEN cos_sim END)
           OVER (PARTITION BY query_id) AS best_pos
  FROM scored
), ranked AS (
  SELECT query_id, neighbor_id, cos_sim, best_pos,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS rank
  FROM with_pos WHERE NOT same_label
)
SELECT query_id, neighbor_id, cos_sim, rank,
       best_pos - cos_sim AS gap_to_positive
FROM ranked WHERE rank <= {TOP_K}
""",
    doc=(
        "Hard-negative mining for retrieval/embedding training (the "
        "candidate-generation step of triplet/contrastive fine-tuning, "
        "e.g. DPR/Sentence-BERT pipelines): for each query vector, the "
        "top-k most-similar corpus vectors with a DIFFERENT label — "
        "near misses the trained model must push away — plus the margin "
        "to the query's best same-label positive (NULL when the query "
        "has no positive). One broadcast of the query set against the "
        "partitioned corpus; the positive-max and the negative ranking "
        "share a single exchange on query_id (one unordered window + "
        "one ordered window over the same partitioning), so mining "
        "costs the same shuffle plan as plain brute-force top-k."
    ),
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("c_label"),
        F.col("embedding").alias("cv"),
        F.expr(norm_sql("embedding")).alias("cnorm"),
    ).filter(F.col("cnorm") > 0)
    q = (
        emb.filter(F.col("vec_id") < N_QUERY_VECS)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("q_label"),
            F.col("embedding").alias("qv"),
            F.expr(norm_sql("embedding")).alias("qnorm"),
        )
        .filter(F.col("qnorm") > 0)
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (F.col("c_label") == F.col("q_label")).alias("same_label"),
            (
                F.expr(dot_sql("qv", "cv")) / (F.col("qnorm") * F.col("cnorm"))
            ).alias("cos_sim"),
        )
    )
    per_q = Window.partitionBy("query_id")
    rank_w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn(
            "best_pos",
            F.max(F.when(F.col("same_label"), F.col("cos_sim"))).over(per_q),
        )
        .filter(~F.col("same_label"))
        .withColumn("rank", F.row_number().over(rank_w).cast("int"))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "cos_sim",
            "rank",
            (F.col("best_pos") - F.col("cos_sim")).alias("gap_to_positive"),
        )
    )
