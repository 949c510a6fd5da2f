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


def _duck_kmeans_iterated_sql(k: int = K_CLUSTERS, n_iter: int = 5) -> str:
    """Full relational replay of kmeans_iterate in DuckDB: per iteration,
    one assignment CTE (same sqdist fold, ties to the lower cid) and one
    quantized-mean recompute CTE (exact int64 sums — the round-6
    portability device that made this oracle possible; see
    operators/clustering.QMEAN_SCALE). State CTEs are MATERIALIZED:
    DuckDB otherwise inlines the chain and re-scans exponentially."""
    from ..operators.clustering import duck_quantized_mean

    ctes = [
        f"cent0 AS MATERIALIZED (SELECT vec_id AS cid, embedding AS cvec "
        f"FROM embeddings ORDER BY vec_id LIMIT {k})"
    ]
    for it in range(1, n_iter + 1):
        prev = f"cent{it - 1}"
        ctes.append(
            f"d{it} AS (SELECT e.vec_id, c.cid, "
            f"{duck_sqdist('e.embedding', 'c.cvec')} AS sqd "
            f"FROM embeddings e CROSS JOIN {prev} c)"
        )
        ctes.append(
            f"a{it} AS MATERIALIZED (SELECT vec_id, cid AS cluster_id FROM d{it} "
            "QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sqd, cid) = 1)"
        )
        # di, not i: duck lambda helpers capture an outer index named i
        # (BUILDER_NOTES sharp edge)
        ctes.append(
            f"m{it} AS (SELECT a.cluster_id, r.di - 1 AS pos, "
            f"{duck_quantized_mean('e.embedding[r.di]')} AS m "
            f"FROM embeddings e JOIN a{it} a ON e.vec_id = a.vec_id, "
            "unnest(range(1, len(e.embedding) + 1)) AS r(di) "
            "GROUP BY a.cluster_id, r.di)"
        )
        ctes.append(
            f"cent{it} AS MATERIALIZED (SELECT cluster_id AS cid, "
            f"list_transform(list(m ORDER BY pos), x -> CAST(x AS REAL)) AS cvec "
            f"FROM m{it} GROUP BY cluster_id)"
        )
    final = (
        f"fd AS (SELECT e.vec_id, c.cid, "
        f"{duck_sqdist('e.embedding', 'c.cvec')} AS sqdist "
        f"FROM embeddings e CROSS JOIN cent{n_iter} c) "
        "SELECT vec_id, cid AS cluster_id, sqdist FROM fd "
        "QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sqdist, cid) = 1"
    )
    return "WITH " + ", ".join(ctes) + ", " + final


@query(
    "kmeans_iterated",
    oracle=_duck_kmeans_iterated_sql(),
    doc=(
        "Fixed-count Lloyd iterations (5): broadcast centroids, map-side "
        "assignment, quantized-integer-mean recompute (exact int64 sums "
        "— partitioning-independent AND cross-engine portable), k x dim "
        "doubles back to the driver per round — the MLlib-shaped "
        "production path, oracle-exact since round 6."
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


@query(
    "srp_hamming_groups",
    oracle=(
        "WITH bits AS (SELECT vec_id, "
        f"{duck_bucket('embedding', SRP_PLANES)} AS srp_bits FROM embeddings), "
        "sigs AS (SELECT srp_bits, MIN(vec_id) AS rep, "
        "CAST(COUNT(*) AS BIGINT) AS n_members FROM bits GROUP BY srp_bits), "
        "bands AS (SELECT srp_bits, rep, n_members, b, "
        f"(srp_bits >> (b * {SRP_BAND_BITS})) & {(1 << SRP_BAND_BITS) - 1} AS band_val "
        f"FROM sigs, unnest(range({SRP_BANDS})) AS t(b)), "
        "cand AS (SELECT DISTINCT a.rep AS rep_a, b2.rep AS rep_b, "
        "a.srp_bits AS bits_a, b2.srp_bits AS bits_b, "
        "a.n_members AS n_a, b2.n_members AS n_b "
        "FROM bands a JOIN bands b2 ON a.b = b2.b "
        "AND a.band_val = b2.band_val AND a.rep < b2.rep) "
        "SELECT rep_a, rep_b, n_a, n_b, "
        "CAST(bit_count(xor(bits_a, bits_b)) AS INTEGER) AS hamming "
        "FROM cand "
        f"WHERE bit_count(xor(bits_a, bits_b)) <= {SRP_HAMMING_MAX}"
    ),
    doc=(
        "The SCALE path of srp_hamming_pairs: collapse signature-"
        "identical vectors to one representative BEFORE banding (exact "
        "groupBy on srp_bits — one shuffle), then band only the DISTINCT "
        "signatures. A duplicate group of size g costs one row instead "
        "of C(g,2) pairs, which is the difference between an output "
        "linear in distinct content and one quadratic in duplication — "
        "the same collapse-identical-first posture the MinHash pipeline "
        "takes. Emits near-pairs between representatives with both group "
        "sizes; pair expansion to members is a join against the sig "
        "group table, done only when a consumer really wants raw pairs."
    ),
)
def srp_hamming_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    bits = emb.select(
        "vec_id", F.expr(bucket_sql("embedding", SRP_PLANES)).alias("srp_bits")
    )
    sigs = bits.groupBy("srp_bits").agg(
        F.min("vec_id").alias("rep"),
        F.count("*").cast("bigint").alias("n_members"),
    )
    sigs = sigs.cache()
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
    bands = sigs.select(
        "srp_bits", "rep", "n_members", F.explode(band_structs).alias("bk")
    ).select("srp_bits", "rep", "n_members", "bk.b", "bk.band_val")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.rep") < F.col("b.rep")),
        )
        .select(
            F.col("a.rep").alias("rep_a"),
            F.col("b.rep").alias("rep_b"),
            F.col("a.srp_bits").alias("bits_a"),
            F.col("b.srp_bits").alias("bits_b"),
            F.col("a.n_members").alias("n_a"),
            F.col("b.n_members").alias("n_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.expr("bits_a ^ bits_b")).cast("int")
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= SRP_HAMMING_MAX)
        .select("rep_a", "rep_b", "n_a", "n_b", "hamming")
    )


from ..operators.pq import (  # noqa: E402
    PQ_CODE_BITS,
    adc_topk,
    build_codebook,
    duck_pq_ctes,
    encode_codes,
    pack_codes,
)

_PQ_TOP_K = 5
_PQ_N_QUERY = 10


@query(
    "pq_encode",
    oracle=(
        f"WITH {duck_pq_ctes(_PQ_N_QUERY)} "
        "SELECT vec_id, CAST(SUM(code << (m * "
        f"{PQ_CODE_BITS})) AS BIGINT) AS pq_code "
        "FROM codes GROUP BY vec_id"
    ),
    doc=(
        "Product-quantization encoding: 8 subspaces x 16 deterministic "
        "seed centroids -> 8 4-bit codes packed into one BIGINT (64x "
        "smaller than the float32 vector). Broadcast codebook, map-side "
        "argmin per (vector, subspace) — the corpus never shuffles to "
        "get encoded. Production refines the codebook with per-subspace "
        "Lloyd steps (operators/clustering.py); the operator shape is "
        "identical."
    ),
)
def pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cb = build_codebook(emb)
    return pack_codes(encode_codes(emb, cb))


@query(
    "ann_pq_adc",
    oracle=(
        f"WITH {duck_pq_ctes(_PQ_N_QUERY)}, "
        "partial AS (SELECT qid, codes.vec_id AS vec_id, codes.m AS m, "
        f"{duck_sqdist('qsv', 'cv')} AS p "
        "FROM codes JOIN cbm ON cbm.m = codes.m AND cbm.c = codes.code "
        "JOIN qsub ON qsub.m = codes.m WHERE qid <> codes.vec_id), "
        "summed AS (SELECT qid AS query_id, vec_id AS neighbor_id, "
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), list(p ORDER BY m)), "
        "(acc, x) -> acc + x) AS adc_dist FROM partial GROUP BY 1, 2) "
        "SELECT query_id, neighbor_id, adc_dist, "
        "CAST(row_number() OVER (PARTITION BY query_id "
        "ORDER BY adc_dist, neighbor_id) AS INTEGER) AS rank "
        "FROM summed "
        f"QUALIFY row_number() OVER (PARTITION BY query_id "
        f"ORDER BY adc_dist, neighbor_id) <= {_PQ_TOP_K}"
    ),
    doc=(
        "ANN via asymmetric distance computation over the PQ codes: the "
        "full-precision query meets only centroid subvectors (broadcast "
        "codebook x broadcast query subs); per-pair totals fold the 8 "
        "partials in subspace order (engine-exact double summation); "
        "per-query window keeps top-5. At 100 TB the scan side is the "
        "4-byte code column, not the 256-byte vector — PQ exists to make "
        "the ANN scan memory-bandwidth-cheap."
    ),
)
def ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cb = build_codebook(emb)
    codes = encode_codes(emb, cb)
    queries_df = emb.filter(F.col("vec_id") < _PQ_N_QUERY)
    return adc_topk(emb, cb, codes, queries_df, k=_PQ_TOP_K)


@query(
    "ann_ivfpq",
    oracle=(
        f"WITH {duck_pq_ctes(_PQ_N_QUERY)}, "
        "lab AS (SELECT vec_id, label FROM embeddings), "
        "qlab AS (SELECT vec_id AS qid2, label AS qlabel FROM embeddings "
        f"WHERE vec_id < {_PQ_N_QUERY}), "
        "partial AS (SELECT qid, codes.vec_id AS vec_id, codes.m AS m, "
        f"{duck_sqdist('qsv', 'cv')} AS p "
        "FROM codes JOIN cbm ON cbm.m = codes.m AND cbm.c = codes.code "
        "JOIN lab ON lab.vec_id = codes.vec_id "
        "JOIN qsub ON qsub.m = codes.m "
        "JOIN qlab ON qlab.qid2 = qsub.qid AND qlab.qlabel = lab.label "
        "WHERE qid <> codes.vec_id), "
        "summed AS (SELECT qid AS query_id, vec_id AS neighbor_id, "
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), list(p ORDER BY m)), "
        "(acc, x) -> acc + x) AS adc_dist FROM partial GROUP BY 1, 2) "
        "SELECT query_id, neighbor_id, adc_dist, "
        "CAST(row_number() OVER (PARTITION BY query_id "
        "ORDER BY adc_dist, neighbor_id) AS INTEGER) AS rank "
        "FROM summed "
        f"QUALIFY row_number() OVER (PARTITION BY query_id "
        f"ORDER BY adc_dist, neighbor_id) <= {_PQ_TOP_K}"
    ),
    doc=(
        "IVF-PQ: the billion-scale ANN layout — coarse cells (the label "
        "column, as in ann_ivf_cells) route each query to one cell, and "
        "within the cell distance is PQ/ADC over 4-bit codes, never the "
        "float vectors. The candidate set is one cell AND the scan width "
        "is one BIGINT of codes: cells bound the rows, PQ bounds the "
        "bytes. Cell routing is an equi-join on the cell id; codebook "
        "and query subvectors broadcast."
    ),
)
def ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    cb = build_codebook(emb)
    codes = encode_codes(emb, cb)
    codes_l = codes.join(emb.select("vec_id", "label"), "vec_id")
    queries_df = emb.filter(F.col("vec_id") < _PQ_N_QUERY)
    from ..operators.pq import _sub_structs
    from ..operators.clustering import sqdist_sql

    qsub = queries_df.select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.explode(_sub_structs("embedding")).alias("s"),
    ).select("qid", "qlabel", "s.m", F.col("s.sv").alias("qsv"))
    # distance lookup table (see operators/pq.adc_topk): one sqdist per
    # (query, subspace, code); the cell-routed corpus pass is then a
    # code join + lookup with the label filter, no per-pair distances
    lut = (
        qsub.join(F.broadcast(cb), qsub.m == cb.m)
        .select(
            "qid",
            "qlabel",
            cb.m.alias("m"),
            F.col("c").alias("code"),
            F.expr(sqdist_sql("qsv", "cv")).alias("p"),
        )
    )
    partial = (
        codes_l.join(F.broadcast(lut), ["m", "code"])
        .filter(
            (F.col("label") == F.col("qlabel"))
            & (F.col("qid") != F.col("vec_id"))
        )
        .select("qid", "vec_id", "m", "p")
    )
    # fixed-order pivot-add (see operators/pq.adc_topk): deterministic
    # without per-pair array materialization
    from ..operators.pq import PQ_M as _PQ_M

    per_m = [
        F.sum(F.when(F.col("m") == m, F.col("p"))).alias(f"p{m}")
        for m in range(_PQ_M)
    ]
    total = F.col("p0")
    for m in range(1, _PQ_M):
        total = total + F.col(f"p{m}")
    summed = (
        partial.groupBy("qid", "vec_id")
        .agg(*per_m)
        .select(
            F.col("qid").alias("query_id"),
            F.col("vec_id").alias("neighbor_id"),
            total.alias("adc_dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    return (
        summed.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _PQ_TOP_K)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )


def _duck_pq_adc_trained_sql(n_iter: int = 3) -> str:
    """Relational replay of train_codebook + encode + ADC: seed codebook
    (K smallest-id vectors' subvectors), n_iter per-subspace Lloyd
    iterations with quantized-integer means (the round-6 portability
    device) and empty-cell keep-previous via LEFT JOIN + COALESCE, then
    the same code/LUT/fold-in-subspace-order ADC as ann_pq_adc."""
    from ..operators.clustering import duck_quantized_mean
    from ..operators.pq import PQ_K, PQ_M, PQ_SUB

    subexpr = f"embedding[(m * {PQ_SUB} + 1):(m * {PQ_SUB} + {PQ_SUB})]"
    ctes = [
        "seeds AS (SELECT vec_id, embedding, "
        "CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS c "
        f"FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {PQ_K}))",
        f"cb0 AS MATERIALIZED (SELECT m, c, {subexpr} AS cv "
        f"FROM seeds, unnest(range({PQ_M})) AS t(m))",
        f"sub AS MATERIALIZED (SELECT vec_id, m, {subexpr} AS sv "
        f"FROM embeddings, unnest(range({PQ_M})) AS t(m))",
    ]
    for it in range(1, n_iter + 1):
        prev = f"cb{it - 1}"
        ctes.append(
            f"pd{it} AS (SELECT s.vec_id, s.m, b.c, "
            f"{duck_sqdist('s.sv', 'b.cv')} AS d "
            f"FROM sub s JOIN {prev} b ON s.m = b.m)"
        )
        ctes.append(
            f"pa{it} AS MATERIALIZED (SELECT vec_id, m, c FROM pd{it} "
            "QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY d, c) = 1)"
        )
        ctes.append(
            f"pm{it} AS (SELECT a.m, a.c, r.di - 1 AS pos, "
            f"{duck_quantized_mean('s.sv[r.di]')} AS v "
            f"FROM sub s JOIN pa{it} a ON s.vec_id = a.vec_id AND s.m = a.m, "
            "unnest(range(1, len(s.sv) + 1)) AS r(di) "
            "GROUP BY a.m, a.c, r.di)"
        )
        ctes.append(
            f"pn{it} AS (SELECT m, c, "
            "list_transform(list(v ORDER BY pos), x -> CAST(x AS REAL)) AS cv "
            f"FROM pm{it} GROUP BY m, c)"
        )
        # empty cells keep the previous centroid (standard practice,
        # mirrored from operators/pq.train_codebook)
        ctes.append(
            f"cb{it} AS MATERIALIZED (SELECT p.m, p.c, COALESCE(n.cv, p.cv) AS cv "
            f"FROM {prev} p LEFT JOIN pn{it} n ON p.m = n.m AND p.c = n.c)"
        )
    cb = f"cb{n_iter}"
    tail = (
        f"cand AS (SELECT s.vec_id, s.m, b.c, {duck_sqdist('s.sv', 'b.cv')} AS d "
        f"FROM sub s JOIN {cb} b ON s.m = b.m), "
        "codes AS MATERIALIZED (SELECT vec_id, m, c AS code FROM cand "
        "QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY d, c) = 1), "
        f"qsub AS (SELECT vec_id AS qid, m, sv AS qsv FROM sub "
        f"WHERE vec_id < {_PQ_N_QUERY}), "
        "partial AS (SELECT qid, codes.vec_id AS vec_id, codes.m AS m, "
        f"{duck_sqdist('qsv', 'cv')} AS p "
        f"FROM codes JOIN {cb} ON {cb}.m = codes.m AND {cb}.c = codes.code "
        "JOIN qsub ON qsub.m = codes.m WHERE qid <> codes.vec_id), "
        "summed AS (SELECT qid AS query_id, vec_id AS neighbor_id, "
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), list(p ORDER BY m)), "
        "(acc, x) -> acc + x) AS adc_dist FROM partial GROUP BY 1, 2) "
        "SELECT query_id, neighbor_id, adc_dist, "
        "CAST(row_number() OVER (PARTITION BY query_id "
        "ORDER BY adc_dist, neighbor_id) AS INTEGER) AS rank "
        "FROM summed "
        "QUALIFY row_number() OVER (PARTITION BY query_id "
        f"ORDER BY adc_dist, neighbor_id) <= {_PQ_TOP_K}"
    )
    return "WITH " + ", ".join(ctes) + ", " + tail


@query(
    "ann_pq_adc_trained",
    oracle=_duck_pq_adc_trained_sql(),
    doc=(
        "ADC search over a Lloyd-refined PQ codebook (3 per-subspace "
        "k-means iterations from the deterministic seeds) — the trained "
        "production variant of ann_pq_adc. Quality tradeoffs are "
        "measured in tests/test_pq.py: training halves reconstruction "
        "MSE; ranking quality is recovered by shortlist + exact re-rank."
    ),
)
def ann_pq_adc_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pq import train_codebook

    emb = load_table(spark, sf_dir, "embeddings")
    cb = train_codebook(emb, n_iter=3)
    codes = encode_codes(emb, cb)
    queries_df = emb.filter(F.col("vec_id") < _PQ_N_QUERY)
    return adc_topk(emb, cb, codes, queries_df, k=_PQ_TOP_K)


@query(
    "cluster_quality_stats",
    oracle=(
        f"WITH {_DUCK_ASSIGN_CTES}, "
        "j AS (SELECT a.cluster_id, a.vec_id, a.sqdist FROM assign a) "
        "SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members, "
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        "list(sqdist ORDER BY vec_id)), (acc, x) -> acc + x) / COUNT(*) "
        "AS mean_sqdist, MAX(sqdist) AS max_sqdist, MIN(sqdist) AS min_sqdist "
        "FROM j GROUP BY cluster_id"
    ),
    doc=(
        "Clustering quality report: per-cluster size and the mean/max/"
        "min squared distance to the assigned centroid — the numbers "
        "that drive 'retrain or re-k' decisions for the IVF/PQ coarse "
        "quantizers. The mean folds member distances in vec_id order "
        "(order-pinned float summation); max/min are order-free. One "
        "narrow shuffle on cluster_id over (id, sqdist) pairs."
    ),
)
def cluster_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    assign = assign_clusters(emb, initial_centroids(emb))
    grouped = assign.groupBy("cluster_id").agg(
        F.count("*").cast("bigint").alias("n_members"),
        F.sort_array(F.collect_list(F.struct("vec_id", "sqdist"))).alias("pairs"),
        F.max("sqdist").alias("max_sqdist"),
        F.min("sqdist").alias("min_sqdist"),
    )
    return grouped.select(
        "cluster_id",
        "n_members",
        (
            F.expr(
                "aggregate(transform(pairs, p -> p.sqdist), "
                "CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
            )
            / F.col("n_members")
        ).alias("mean_sqdist"),
        "max_sqdist",
        "min_sqdist",
    )


# ---------------------------------------------------------------------------
# Gram matrix (PCA / whitening primitive)
# ---------------------------------------------------------------------------

@query(
    "embedding_gram_matrix",
    oracle="""
WITH g AS (
  SELECT CAST(u.gi AS BIGINT) AS i, CAST(w.gj AS BIGINT) AS j,
         CAST(floor(CAST(embedding[gi] AS DOUBLE)
                    * CAST(embedding[gj] AS DOUBLE)
                    * 1048576.0 + 0.5) AS BIGINT) AS q
  FROM embeddings,
       unnest(range(1, len(embedding) + 1)) AS u(gi),
       unnest(range(1, len(embedding) + 1)) AS w(gj)
  WHERE w.gj >= u.gi
)
SELECT i, j, CAST(SUM(q) AS DOUBLE) / 1048576.0 AS gram
FROM g GROUP BY i, j
""",
    doc=(
        "Embedding Gram matrix (the PCA-whitening / covariance "
        "primitive): upper-triangle G[i,j] = sum over vectors of "
        "x_i * x_j, every product quantized to integers "
        "(floor(x_i*x_j*2^20 + 0.5) — correctly-rounded IEEE product, "
        "exponent-shift multiply, portable rounding) so the int64 sum "
        "is exact in ANY order: partitioning-independent and "
        "cross-engine identical. Above GRAM_FOLD_MAX_N rows the same "
        "integers come from per-partition numpy partial Grams "
        "(mapInPandas; data moved = partitions x dim^2 longs, corpus "
        "never shuffled) — bit-identical by construction, pinned by "
        "test."
    ),
)
def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.linalg import gram_matrix

    emb = load_table(spark, sf_dir, "embeddings")
    return gram_matrix(emb)
