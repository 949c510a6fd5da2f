"""Deduplication queries over the documents table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    fuzzy_pairs_levenshtein,
    duck_minhash_lsh_ctes,
    duck_minhash_lsh_pairs_sql,
    duck_simhash_expr,
    minhash_lsh_pairs,
    with_simhash,
)
from ..operators.text import duck_ngram_docfreq_sql, duck_tokens
from ..sources.catalog import load_table
from .registry import query


@query(
    "dedup_exact",
    oracle=(
        "SELECT text, MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies "
        "FROM documents GROUP BY text HAVING COUNT(*) > 1"
    ),
    doc=(
        "Exact dedup (hash-groupBy on content): duplicate groups with a "
        "deterministic keeper. The dropDuplicates shape with a pinned "
        "winner instead of an arbitrary one."
    ),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("text")
        .agg(F.min("doc_id").alias("keeper_id"), F.count("*").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


@query(
    "dedup_exact_keep",
    oracle=(
        "SELECT doc_id, lang, source FROM documents d "
        "WHERE doc_id = (SELECT MIN(doc_id) FROM documents d2 WHERE d2.text = d.text)"
    ),
    doc="Exact dedup, surviving-rows form: keep the min-id copy of each text.",
)
def dedup_exact_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    keeper = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    return docs.join(keeper, ["text", "doc_id"], "left_semi").select(
        "doc_id", "lang", "source"
    )


@query(
    "dedup_minhash_lsh",
    oracle=duck_minhash_lsh_pairs_sql(threshold=0.5),
    doc=(
        "Near-dup pairs: 3-token shingles -> 8 portable MinHashes -> 4-band "
        "LSH candidate join -> exact Jaccard verify >= 0.5. The quadratic "
        "step only ever sees band collisions."
    ),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, threshold=0.5)


@query(
    "dedup_simhash",
    oracle=(
        f"WITH sh AS (SELECT doc_id, {duck_simhash_expr('text')} AS simhash "
        "FROM documents) "
        "SELECT doc_id, simhash, simhash % 65536 AS band_lo, "
        "simhash // 65536 AS band_hi FROM sh"
    ),
    doc=(
        "SimHash (32-bit, portable token hashes) + 16-bit half-bands as "
        "hamming-neighbor blocking keys."
    ),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out: the signature IS the map work (token hash + 64 weighted
    # bit sums per doc); measured 3.44 s -> 0.49 s at sf0.1.
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    return with_simhash(docs).select("doc_id", "simhash", "band_lo", "band_hi")


@query(
    "dedup_simhash_candidates",
    oracle=(
        f"WITH sh AS (SELECT doc_id, {duck_simhash_expr('text')} AS simhash "
        "FROM documents), "
        "bands AS ("
        "  SELECT doc_id, simhash, 0 AS band_id, simhash % 65536 AS key FROM sh "
        "  UNION ALL "
        "  SELECT doc_id, simhash, 1 AS band_id, simhash // 65536 AS key FROM sh"
        ") "
        "SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, "
        "bit_count(xor(a.simhash, b.simhash)) AS hamming "
        "FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.key = b.key "
        "AND a.doc_id < b.doc_id "
        "WHERE bit_count(xor(a.simhash, b.simhash)) <= 6"
    ),
    doc=(
        "SimHash near-dup candidates: half-band blocking join, then "
        "hamming distance <= 6 filter."
    ),
)
def dedup_simhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    sh = with_simhash(docs).select("doc_id", "simhash", "band_lo", "band_hi")
    bands = sh.select(
        "doc_id", "simhash", F.lit(0).alias("band_id"), F.col("band_lo").alias("key")
    ).union(
        sh.select(
            "doc_id", "simhash", F.lit(1).alias("band_id"), F.col("band_hi").alias("key")
        )
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias(
                "hamming"
            ),
        )
        .filter(F.col("hamming") <= 6)
        .distinct()
    )


@query(
    "dedup_clusters",
    oracle=(
        f"WITH RECURSIVE {duck_minhash_lsh_ctes(threshold=0.5)}, "
        "edges AS ("
        "  SELECT id_a AS u, id_b AS v FROM mh_pairs "
        "  UNION SELECT id_b AS u, id_a AS v FROM mh_pairs"
        "), reach AS ("
        "  SELECT u AS node, u AS component FROM edges "
        "  UNION SELECT v AS node, v AS component FROM edges "
        "  UNION SELECT e.u AS node, r.component FROM edges e "
        "  JOIN reach r ON e.v = r.node"
        ") "
        "SELECT node AS doc_id, MIN(component) AS cluster_rep "
        "FROM reach GROUP BY node"
    ),
    doc=(
        "Iterative connected components (min-label propagation) over the "
        "MinHash near-dup pairs: pairs -> dedup clusters with a "
        "deterministic representative. The oracle computes reachability "
        "with a recursive CTE."
    ),
)
def dedup_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import dedup_clusters

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.5)
    return dedup_clusters(pairs)


@query(
    "dedup_ngram_jaccard",
    oracle=(
        "WITH base AS (SELECT doc_id, source, "
        f"{duck_tokens('text')} AS toks FROM documents), "
        "sh AS (SELECT doc_id, source, "
        "list_distinct("
        "CASE WHEN len(toks) < 3 THEN CAST([] AS VARCHAR[]) ELSE "
        "list_transform(range(1, len(toks) - 1), "
        "i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])) END"
        ") AS shset FROM base) "
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
        "(CAST(len(list_intersect(a.shset, b.shset)) AS DOUBLE) / "
        " len(list_distinct(list_concat(a.shset, b.shset)))) AS jaccard "
        "FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id "
        "WHERE len(list_distinct(list_concat(a.shset, b.shset))) > 0 AND "
        "(CAST(len(list_intersect(a.shset, b.shset)) AS DOUBLE) / "
        " len(list_distinct(list_concat(a.shset, b.shset)))) >= 0.3"
    ),
    doc=(
        "Exact n-gram (3-token shingle) Jaccard within source blocks — "
        "blocking bounds the pair count; at scale the blocking key is an "
        "LSH band instead of source."
    ),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import shingles_sql, tokens_sql

    docs = load_table(spark, sf_dir, "documents")
    sh = (
        docs.withColumn("toks", F.expr(tokens_sql("text")))
        .withColumn("shset", F.array_distinct(F.expr(shingles_sql("toks"))))
        .select("doc_id", "source", "shset")
    )
    a, b = sh.alias("a"), sh.alias("b")
    pairs = a.join(
        b,
        (F.col("a.source") == F.col("b.source"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        F.expr("size(array_intersect(a.shset, b.shset))").alias("n_int"),
        F.expr("size(array_union(a.shset, b.shset))").alias("n_uni"),
    )
    return (
        pairs.filter(F.col("n_uni") > 0)
        .withColumn("jaccard", F.col("n_int").cast("double") / F.col("n_uni"))
        .filter(F.col("jaccard") >= 0.3)
        .select("id_a", "id_b", "jaccard")
    )


@query(
    "near_dedup_incremental",
    oracle=(
        f"WITH {duck_minhash_lsh_ctes(threshold=0.5)} "
        "SELECT id_a, id_b, jaccard FROM mh_pairs "
        "WHERE id_a % 5 = 0 OR id_b % 5 = 0"
    ),
    doc=(
        "Incremental near-dedup (operators/dedup.py "
        "minhash_incremental_pairs): docs with doc_id % 5 = 0 arrive as "
        "the NEW batch and are checked against the already-indexed rest "
        "via its persisted signature table — (new bands) x (all bands) "
        "band join, Jaccard verify on candidates only, the existing "
        "corpus is never re-hashed. Emits every pair touching a new doc "
        "(new-vs-existing and new-vs-new). The oracle is the full-corpus "
        "pair set filtered to pairs involving a new doc — incremental "
        "indexing must find exactly what a from-scratch run would."
    ),
)
def near_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_incremental_pairs, minhash_signatures

    docs = load_table(spark, sf_dir, "documents")
    existing = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    # Stands in for the persisted parquet signature table (the pytest
    # round-trip test writes/reloads it through parquet for real).
    existing_sig = minhash_signatures(existing).filter(
        F.expr("size(sh_hashes) > 0")
    )
    pairs, _new_sig = minhash_incremental_pairs(new, existing_sig, threshold=0.5)
    return pairs


@query(
    "near_dedup_keep_best",
    oracle=(
        f"WITH RECURSIVE {duck_minhash_lsh_ctes(threshold=0.5)}, "
        "edges AS ("
        "  SELECT id_a AS u, id_b AS v FROM mh_pairs "
        "  UNION SELECT id_b AS u, id_a AS v FROM mh_pairs"
        "), reach AS ("
        "  SELECT u AS node, u AS component FROM edges "
        "  UNION SELECT v AS node, v AS component FROM edges "
        "  UNION SELECT e.u AS node, r.component FROM edges e "
        "  JOIN reach r ON e.v = r.node"
        "), comp AS ("
        "  SELECT node, MIN(component) AS component FROM reach GROUP BY node"
        "), labeled AS ("
        "  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS cluster_rep, "
        f"  CAST(len({duck_tokens('d.text')}) AS BIGINT) AS n_tokens "
        "  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id"
        ") "
        "SELECT cluster_rep, "
        "(max({'q': n_tokens, 'k': -doc_id})).k * -1 AS kept_doc_id, "
        "COUNT(*) AS n_members "
        "FROM labeled GROUP BY cluster_rep"
    ),
    doc=(
        "Near-dedup with quality-aware survivor selection: MinHash-LSH "
        "pairs -> connected components -> keep the highest-quality doc "
        "(most tokens, min-id tie-break) per cluster; singletons survive "
        "as their own cluster. The keep-best policy every production "
        "near-dedup uses instead of keep-first."
    ),
)
def near_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import connected_components
    from ..operators.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.5)
    labels = connected_components(pairs)  # (node, component)
    labeled = (
        token_count(docs)
        .select("doc_id", "n_tokens")
        .join(labels, F.col("doc_id") == F.col("node"), "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster_rep"),
            "n_tokens",
        )
    )
    best = F.max(
        F.struct(F.col("n_tokens").alias("q"), (-F.col("doc_id")).alias("k"))
    )
    return labeled.groupBy("cluster_rep").agg(
        (best["k"] * -1).alias("kept_doc_id"),
        F.count("*").alias("n_members"),
    )


@query(
    "ngram_docfreq_filter",
    oracle=duck_ngram_docfreq_sql(),
    doc=(
        "Cross-corpus n-gram document-frequency filter (C4/Gopher "
        "boilerplate signal): per-doc fraction of 3-token shingles shared "
        "with >= 2 documents, keep = frac <= 0.5. Linear explode + hash "
        "groupBy — no pairwise comparisons (operators/text.py "
        "ngram_docfreq_stats)."
    ),
)
def ngram_docfreq_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import ngram_docfreq_stats

    docs = load_table(spark, sf_dir, "documents")
    return ngram_docfreq_stats(docs)


@query(
    "fuzzy_pairs_edit_distance",
    oracle="""
WITH k AS (
  SELECT doc_id, source,
         array_to_string(({tokens})[1:3], ' ') AS key
  FROM documents
), sized AS (
  SELECT doc_id, source, key, length(key) AS klen FROM k
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(levenshtein(a.key, b.key) AS INTEGER) AS dist
FROM sized a JOIN sized b
  ON a.source = b.source AND a.doc_id < b.doc_id
 AND abs(a.klen - b.klen) <= 3
WHERE levenshtein(a.key, b.key) <= 3
""".format(tokens="CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(text), '\\s+') END"),
    doc=(
        "Edit-distance fuzzy matching on a 3-token prefix key, blocked by "
        "source with the |len diff| <= d length bound: the record-linkage "
        "pattern (titles, names) as a candidate/verify join. Spark side "
        "uses thresholded levenshtein (early-exit DP) on candidates only "
        "(operators/dedup.py fuzzy_pairs_levenshtein)."
    ),
)
def fuzzy_pairs_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import tokens_sql

    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        "source",
        F.expr(
            f"array_join(slice({tokens_sql('text')}, 1, 3), ' ')"
        ).alias("key3"),
    )
    return fuzzy_pairs_levenshtein(
        keyed, key_col="key3", block_cols=["source"], max_dist=3
    )


from ..operators.dedup import (  # noqa: E402
    N_HASHES,
    duck_minhash_signature_cols,
    minhash_signature_struct_sql,
)
from ..operators.text import duck_shingle_hash_set  # noqa: E402

_DUCK_SRC_MH = ", ".join(f"MIN(mh_{j}) AS mh_{j}" for j in range(N_HASHES))
_DUCK_SRC_MATCHES = " + ".join(
    f"(CASE WHEN a.mh_{j} = b.mh_{j} THEN 1 ELSE 0 END)" for j in range(N_HASHES)
)


@query(
    "source_minhash_jaccard",
    oracle=(
        "WITH perdoc AS (SELECT source, "
        f"{duck_shingle_hash_set('text')} AS sh_hashes FROM documents), "
        f"docsig AS (SELECT source, {duck_minhash_signature_cols()} FROM perdoc), "
        f"srcsig AS (SELECT source, {_DUCK_SRC_MH} FROM docsig GROUP BY source), "
        "sh AS (SELECT DISTINCT source, h FROM perdoc, unnest(sh_hashes) AS t(h)), "
        "sizes AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY source), "
        "inter AS (SELECT a.source AS source_a, b.source AS source_b, "
        "COUNT(*) AS n_inter FROM sh a JOIN sh b "
        "ON a.h = b.h AND a.source < b.source GROUP BY 1, 2) "
        "SELECT p.source_a, p.source_b, "
        f"CAST({_DUCK_SRC_MATCHES.replace('a.mh', 'p.a_mh').replace('b.mh', 'p.b_mh')} AS DOUBLE) / {N_HASHES} AS est_jaccard, "
        "CAST(COALESCE(i.n_inter, 0) AS DOUBLE) "
        "/ (sa.n + sb.n - COALESCE(i.n_inter, 0)) AS exact_jaccard, "
        "CAST(COALESCE(i.n_inter, 0) AS BIGINT) AS n_inter, "
        "CAST(sa.n + sb.n - COALESCE(i.n_inter, 0) AS BIGINT) AS n_union "
        "FROM (SELECT a.source AS source_a, b.source AS source_b, "
        + ", ".join(
            f"a.mh_{j} AS a_mh_{j}, b.mh_{j} AS b_mh_{j}" for j in range(N_HASHES)
        )
        + " FROM srcsig a JOIN srcsig b ON a.source < b.source) p "
        "JOIN sizes sa ON sa.source = p.source_a "
        "JOIN sizes sb ON sb.source = p.source_b "
        "LEFT JOIN inter i ON i.source_a = p.source_a AND i.source_b = p.source_b"
    ),
    doc=(
        "Corpus-level similarity matrix between sources: each source's "
        "MinHash signature is the elementwise MIN of its documents' "
        "signatures (minhash of a union = min of minhashes), so the "
        "whole-corpus sketch reduces map-side with a tiny "
        "n_sources x n_perm shuffle. The estimated Jaccard (matching "
        "signature fraction) rides next to the exact shingle-set Jaccard "
        "(distinct-(source, hash) self-join) for calibration. At 100 TB "
        "you keep only the sketch path: per-source signatures are a few "
        "KB regardless of corpus size, and new batches fold in by MIN — "
        "the mergeable-sketch property."
    ),
)
def source_minhash_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    perdoc = docs.select(
        "source", F.expr(minhash_signature_struct_sql("text")).alias("sig")
    )
    srcsig = perdoc.groupBy("source").agg(
        *[F.min(F.col("sig.mhs")[j]).alias(f"mh_{j}") for j in range(N_HASHES)]
    )
    sh = perdoc.select("source", F.explode("sig.sh_hashes").alias("h")).distinct()
    sizes = sh.groupBy("source").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h")) & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    sa, sb = srcsig.alias("sa"), srcsig.alias("sb")
    pairs = sa.join(
        F.broadcast(sb), F.col("sa.source") < F.col("sb.source")
    ).select(
        F.col("sa.source").alias("source_a"),
        F.col("sb.source").alias("source_b"),
        *[F.col(f"sa.mh_{j}").alias(f"a_mh_{j}") for j in range(N_HASHES)],
        *[F.col(f"sb.mh_{j}").alias(f"b_mh_{j}") for j in range(N_HASHES)],
    )
    matches = sum(
        F.when(F.col(f"a_mh_{j}") == F.col(f"b_mh_{j}"), 1).otherwise(0)
        for j in range(N_HASHES)
    )
    est = pairs.withColumn(
        "est_jaccard", matches.cast("double") / F.lit(N_HASHES)
    ).select("source_a", "source_b", "est_jaccard")
    out = (
        est.join(F.broadcast(sizes.withColumnRenamed("source", "source_a")
                 .withColumnRenamed("n", "n_a")), "source_a")
        .join(F.broadcast(sizes.withColumnRenamed("source", "source_b")
              .withColumnRenamed("n", "n_b")), "source_b")
        .join(F.broadcast(inter), ["source_a", "source_b"], "left")
        .withColumn("n_inter", F.coalesce(F.col("n_inter"), F.lit(0)))
    )
    return out.select(
        "source_a",
        "source_b",
        "est_jaccard",
        (
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        ).alias("exact_jaccard"),
        F.col("n_inter").cast("bigint").alias("n_inter"),
        (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        .cast("bigint")
        .alias("n_union"),
    )


from ..operators.dedup import minhash_lsh_pairs as _mh_pairs  # noqa: E402


@query(
    "near_dup_rate_by_source",
    oracle=(
        f"WITH {duck_minhash_lsh_ctes(threshold=0.5)}, "
        "ids AS (SELECT id_a AS id FROM mh_pairs "
        "UNION SELECT id_b FROM mh_pairs) "
        "SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(COUNT(i.id) AS BIGINT) AS n_near_dup, "
        "CAST(COUNT(i.id) AS DOUBLE) / COUNT(*) AS near_dup_rate "
        "FROM documents d LEFT JOIN ids i ON i.id = d.doc_id "
        "GROUP BY d.source"
    ),
    doc=(
        "Corpus-health metric: per-source near-duplicate rate (share of "
        "docs appearing in any MinHash pair at jaccard >= 0.5) — the "
        "number a curation pipeline tracks per crawl/source to decide "
        "what to ingest. Reuses the banded pipeline; the per-source "
        "rollup adds one integer aggregate and a single final division."
    ),
)
def near_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = _mh_pairs(docs, threshold=0.5)
    ids = (
        pairs.select(F.col("id_a").alias("id"))
        .union(pairs.select(F.col("id_b").alias("id")))
        .distinct()
    )
    joined = docs.join(ids, docs.doc_id == ids.id, "left")
    return joined.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.count("id").cast("bigint").alias("n_near_dup"),
        (F.count("id").cast("double") / F.count("*")).alias("near_dup_rate"),
    )


from pyspark.sql import Window  # noqa: E402
from ..operators.text import (  # noqa: E402
    char_hash_sql,
    duck_char_hash,
    shingles_sql,
    with_tokens,
)

K_SPAN = 10


def _dup_span_oracle() -> str:
    # the outer index must NOT be named `i`: duck_char_hash's inner
    # list_transform lambda also binds `i`, and the slice expression is
    # substituted inside that lambda where the inner binding shadows it.
    sh_hash = duck_char_hash(
        f"array_to_string(list_slice(t, si, si + {K_SPAN - 1}), ' ')"
    )
    return (
        f"WITH toks AS (SELECT doc_id, {duck_tokens('text')} AS t FROM documents), "
        "base AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens, "
        f"CAST(greatest(len(t) - {K_SPAN - 1}, 0) AS BIGINT) AS n_shingles "
        "FROM toks), "
        f"sh AS (SELECT doc_id, si - 1 AS p, {sh_hash} AS h "
        f"FROM toks, unnest(range(1, greatest(len(t) - {K_SPAN - 1}, 0) + 1)) AS r(si)), "
        "dupg AS (SELECT h FROM sh GROUP BY h "
        "HAVING count(DISTINCT doc_id) >= 2), "
        "dup AS (SELECT doc_id, p FROM sh JOIN dupg USING (h)), "
        f"m1 AS (SELECT doc_id, p, max(p + {K_SPAN - 1}) OVER "
        "(PARTITION BY doc_id ORDER BY p "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end FROM dup), "
        "m2 AS (SELECT doc_id, p, CASE WHEN prev_end IS NULL "
        "OR p > prev_end + 1 THEN 1 ELSE 0 END AS new_isl FROM m1), "
        "m3 AS (SELECT doc_id, p, sum(new_isl) OVER "
        "(PARTITION BY doc_id ORDER BY p "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl FROM m2), "
        f"isle AS (SELECT doc_id, isl, max(p) - min(p) + {K_SPAN} AS cov, "
        "count(*) AS cnt FROM m3 GROUP BY doc_id, isl), "
        "perdoc AS (SELECT doc_id, CAST(sum(cov) AS BIGINT) AS covered_tokens, "
        "CAST(sum(cnt) AS BIGINT) AS n_dup_shingles FROM isle GROUP BY doc_id) "
        "SELECT b.doc_id, b.n_tokens, b.n_shingles, "
        "CAST(COALESCE(p.n_dup_shingles, 0) AS BIGINT) AS n_dup_shingles, "
        "CAST(COALESCE(p.covered_tokens, 0) AS BIGINT) AS covered_tokens, "
        "CASE WHEN b.n_tokens = 0 THEN 0.0 ELSE "
        "CAST(COALESCE(p.covered_tokens, 0) AS DOUBLE) / b.n_tokens END "
        "AS dup_token_fraction "
        "FROM base b LEFT JOIN perdoc p USING (doc_id)"
    )


@query(
    "duplicated_ngram_spans",
    oracle=_dup_span_oracle(),
    doc=(
        "Exact-substring duplication diagnostic (the span-level check "
        "behind 'deduplicate exact 10-gram overlaps'): for every doc, "
        "the fraction of its tokens covered by a 10-token shingle that "
        "also appears in some OTHER document. Positions of corpus-"
        "duplicated shingles merge into maximal islands via "
        "gaps-and-islands windows (per-doc partitions, bounded by doc "
        "length — no skew), so overlapping spans are union-counted "
        "exactly once. The only corpus-scale shuffle is the shingle "
        "doc-frequency groupBy; counts are exact integers and the "
        "fraction a single portable division."
    ),
)
def duplicated_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = with_tokens(docs).select(
        "doc_id",
        F.expr("size(toks)").cast("long").alias("n_tokens"),
        F.expr(
            f"transform({shingles_sql('toks', K_SPAN)}, "
            f"s -> {char_hash_sql('s')})"
        ).alias("hs"),
    )
    sh = base.select(
        "doc_id", F.posexplode("hs").alias("p", "h")
    )
    dupg = (
        sh.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= 2)
        .select("h")
    )
    dup = sh.join(dupg, "h").select("doc_id", "p")
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    m = (
        dup.withColumn("prev_end", F.max(F.col("p") + (K_SPAN - 1)).over(w_prev))
        .withColumn(
            "new_isl",
            F.when(
                F.col("prev_end").isNull() | (F.col("p") > F.col("prev_end") + 1),
                1,
            ).otherwise(0),
        )
        .withColumn("isl", F.sum("new_isl").over(w_run))
    )
    isle = m.groupBy("doc_id", "isl").agg(
        (F.max("p") - F.min("p") + K_SPAN).alias("cov"),
        F.count("*").alias("cnt"),
    )
    perdoc = isle.groupBy("doc_id").agg(
        F.sum("cov").cast("long").alias("covered_tokens"),
        F.sum("cnt").cast("long").alias("n_dup_shingles"),
    )
    return (
        base.select(
            "doc_id",
            "n_tokens",
            F.expr("size(hs)").cast("long").alias("n_shingles"),
        )
        .join(perdoc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "n_shingles",
            F.coalesce("n_dup_shingles", F.lit(0).cast("long")).alias(
                "n_dup_shingles"
            ),
            F.coalesce("covered_tokens", F.lit(0).cast("long")).alias(
                "covered_tokens"
            ),
            F.when(F.col("n_tokens") == 0, F.lit(0.0))
            .otherwise(
                F.coalesce("covered_tokens", F.lit(0).cast("long")).cast("double")
                / F.col("n_tokens")
            )
            .alias("dup_token_fraction"),
        )
    )


from ..operators.text import duck_shingle_hash_set  # noqa: E402


@query(
    "dedup_containment",
    oracle=(
        "WITH sets AS (SELECT doc_id, "
        f"{duck_shingle_hash_set('text')} AS s FROM documents), "
        "ne AS (SELECT doc_id, s FROM sets WHERE len(s) > 0) "
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
        "CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s) "
        "AS containment "
        "FROM ne a JOIN ne b ON a.doc_id <> b.doc_id "
        "WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s) "
        ">= 0.8"
    ),
    doc=(
        "Asymmetric shingle-containment pairs (|Sa∩Sb|/|Sa| >= 0.8): the "
        "doc-within-doc duplication signal Jaccard misses. Spark side "
        "runs EXACT prefix filtering (SSJoin/PPJoin: probe only each "
        "doc's rarest n-ceil(t*n)+1 shingles — pigeonhole guarantees "
        "zero false negatives), so the plain all-pairs oracle matches "
        "it bit-for-bit while the plan stays candidate/verify-shaped "
        "at scale."
    ),
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import containment_pairs

    docs = load_table(spark, sf_dir, "documents")
    return containment_pairs(docs, threshold_num=4, threshold_den=5)


@query(
    "dedup_containment_keep",
    oracle=(
        "WITH sets AS (SELECT doc_id, "
        f"{duck_shingle_hash_set('text')} AS s FROM documents), "
        "ne AS (SELECT doc_id, s FROM sets WHERE len(s) > 0), "
        "pairs AS (SELECT a.doc_id AS ia, b.doc_id AS ib, "
        "len(a.s) AS na, len(b.s) AS nb FROM ne a JOIN ne b "
        "ON a.doc_id <> b.doc_id "
        "WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s) "
        ">= 0.8), "
        "losers AS (SELECT DISTINCT ia FROM pairs "
        "WHERE nb > na OR (nb = na AND ib < ia)) "
        "SELECT doc_id, CAST(len(s) AS BIGINT) AS n_shingles FROM ne "
        "WHERE doc_id NOT IN (SELECT ia FROM losers)"
    ),
    doc=(
        "Keep-the-container dedup policy on top of the containment "
        "pairs: a doc contained (>= 0.8) in a STRICTLY LARGER shingle "
        "set is dropped (ties keep the smaller id) — the policy that "
        "removes quoted/subset documents while keeping the superset. "
        "Deterministic: no doc pair can drop each other (larger-set or "
        "smaller-id wins exactly one way)."
    ),
)
def dedup_containment_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import containment_keep

    docs = load_table(spark, sf_dir, "documents")
    return containment_keep(docs, threshold_num=4, threshold_den=5)
