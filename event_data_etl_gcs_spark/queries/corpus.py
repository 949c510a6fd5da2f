"""End-to-end training-corpus pipeline as an oracle-checked query: every
stage (quality gate, exact dedup, MinHash near-dedup) is deterministic,
so the full composition has an exact DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import duck_minhash_lsh_ctes
from ..operators.text import (
    duck_quality_select,
    duck_shingle_hash_set,
    duck_tokens,
    tokens_sql,
)
from ..plans.training_corpus import (
    MAX_PUNCT_RATIO,
    MAX_STOPWORD_RATIO,
    MIN_TOKENS,
    NEAR_DUP_THRESHOLD,
    select_training_corpus,
)
from ..sources.catalog import load_table
from .registry import query


def _corpus_oracle() -> str:
    qsel = duck_quality_select()
    return f"""
WITH base AS (
  SELECT doc_id, lang, source, text, {duck_tokens('text')} AS toks FROM documents
), scored AS (
  SELECT doc_id, lang, source, text,
         {qsel['n_tokens']} AS n_tokens,
         {qsel['stopword_ratio']} AS stopword_ratio,
         {qsel['punct_ratio']} AS punct_ratio
  FROM base
), gated AS (
  SELECT * FROM scored
  WHERE n_tokens >= {MIN_TOKENS}
    AND stopword_ratio <= {MAX_STOPWORD_RATIO}
    AND punct_ratio <= {MAX_PUNCT_RATIO}
), uniq AS (
  SELECT g.* FROM gated g
  JOIN (SELECT text, MIN(doc_id) AS doc_id FROM gated GROUP BY text) k
    ON g.text = k.text AND g.doc_id = k.doc_id
), {duck_minhash_lsh_ctes(table='uniq', threshold=NEAR_DUP_THRESHOLD)}
SELECT u.doc_id, u.lang, u.source, u.n_tokens FROM uniq u
WHERE NOT EXISTS (SELECT 1 FROM mh_pairs p WHERE p.id_b = u.doc_id)
"""


@query(
    "training_corpus_select",
    oracle=_corpus_oracle(),
    doc=(
        "Full training-corpus pipeline: quality gate (token/stopword/punct "
        "thresholds) -> exact dedup (keep min id) -> MinHash-LSH near-dedup "
        "(keep-smallest) -> surviving corpus. The composition every 100 TB "
        "pretraining pipeline runs, as one oracle-checked query."
    ),
)
def training_corpus_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return select_training_corpus(docs)


@query(
    "decontaminate_against_benchmark",
    oracle=(
        "WITH sh AS (SELECT doc_id, "
        + duck_shingle_hash_set("text")
        + " AS hs FROM documents), "
        "bench AS (SELECT doc_id AS bench_id, hs AS bhs FROM sh WHERE doc_id % 97 = 0), "
        "train AS (SELECT doc_id AS train_id, hs AS ths FROM sh WHERE doc_id % 97 <> 0) "
        "SELECT train_id, bench_id, "
        "CAST(len(list_intersect(ths, bhs)) AS BIGINT) AS n_shared "
        "FROM train JOIN bench ON len(list_intersect(ths, bhs)) >= 4"
    ),
    doc=(
        "Benchmark decontamination: training docs sharing >= 4 distinct "
        "3-token shingle hashes with any doc of the (small) eval set are "
        "flagged with the overlap count. Spark shape: explode the eval "
        "set's shingles, BROADCAST them, hash-equi-join the training "
        "side's exploded shingles, count matches per (train, bench) pair "
        "— the corpus is never cross-joined and never shuffled whole; "
        "matched rows only reach the aggregate. The oracle cross-checks "
        "with exact per-pair set intersections."
    ),
)
def decontaminate_against_benchmark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import shingle_hash_set_sql

    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", F.expr(shingle_hash_set_sql("text")).alias("hs")
    )
    bench = sh.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("bench_id"), F.explode("hs").alias("h")
    )
    train = sh.filter(F.col("doc_id") % 97 != 0).select(
        F.col("doc_id").alias("train_id"), F.explode("hs").alias("h")
    )
    return (
        train.join(F.broadcast(bench), "h")
        .groupBy("train_id", "bench_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= 4)
    )


_PACK_CAP = 512  # context-window token budget


@query(
    "sequence_pack_layout",
    oracle=(
        "WITH t AS (SELECT doc_id, source, "
        f"CAST(len({duck_tokens('text')}) AS BIGINT) AS n_tokens FROM documents), "
        "c AS (SELECT doc_id, source, n_tokens, "
        "SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cum_prev "
        "FROM t) "
        "SELECT doc_id, source, n_tokens, "
        "CAST(COALESCE(cum_prev, 0) AS BIGINT) AS start_offset, "
        f"CAST(COALESCE(cum_prev, 0) // {_PACK_CAP} AS BIGINT) AS start_bin, "
        f"CAST((COALESCE(cum_prev, 0) + n_tokens - 1) // {_PACK_CAP} AS BIGINT) "
        "AS end_bin FROM c WHERE n_tokens > 0"
    ),
    doc=(
        "Sequence packing (GPT-style concat-then-chunk): documents "
        "concatenate in id order within each source stream and slice "
        "into 512-token training windows; each doc's (start_offset, "
        "start_bin, end_bin) locates it in the packed layout. One "
        "window cumsum PARTITIONED BY SOURCE — the packing is "
        "embarrassingly parallel across streams, no global sequential "
        "scan; integer arithmetic end to end (exact oracle). The "
        "downstream chunk emitter is chunk_documents; this query is the "
        "layout planner that makes packing deterministic and resumable."
    ),
)
def sequence_pack_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "source",
        F.expr(f"CAST(size({tokens_sql('text')}) AS BIGINT)").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = t.withColumn("cum_prev", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return c.filter(F.col("n_tokens") > 0).select(
        "doc_id",
        "source",
        "n_tokens",
        F.col("cum_prev").cast("bigint").alias("start_offset"),
        F.floor(F.col("cum_prev") / _PACK_CAP).cast("bigint").alias("start_bin"),
        F.floor((F.col("cum_prev") + F.col("n_tokens") - 1) / _PACK_CAP)
        .cast("bigint")
        .alias("end_bin"),
    )


@query(
    "contamination_report_by_source",
    oracle=(
        "WITH sh AS (SELECT doc_id, source, "
        + duck_shingle_hash_set("text")
        + " AS hs FROM documents), "
        "bench AS (SELECT doc_id AS bench_id, hs AS bhs FROM sh "
        "WHERE doc_id % 97 = 0), "
        "train AS (SELECT doc_id AS train_id, source, hs AS ths FROM sh "
        "WHERE doc_id % 97 <> 0), "
        "hits AS (SELECT train_id, source, bench_id FROM train JOIN bench "
        "ON len(list_intersect(ths, bhs)) >= 4), "
        "tot AS (SELECT source, count(*) AS n_docs FROM train GROUP BY source) "
        "SELECT tot.source, CAST(tot.n_docs AS BIGINT) AS n_docs, "
        "CAST(COALESCE(c.n_contaminated, 0) AS BIGINT) AS n_contaminated, "
        "CAST(COALESCE(c.n_bench_hit, 0) AS BIGINT) AS n_bench_hit, "
        "CAST(COALESCE(c.n_contaminated, 0) AS DOUBLE) / tot.n_docs "
        "AS contamination_rate "
        "FROM tot LEFT JOIN (SELECT source, "
        "count(DISTINCT train_id) AS n_contaminated, "
        "count(DISTINCT bench_id) AS n_bench_hit "
        "FROM hits GROUP BY source) c ON tot.source = c.source"
    ),
    doc=(
        "Per-source contamination diagnostics — the governance rollup of "
        "decontaminate_against_benchmark: for each training source, how "
        "many docs leak eval content (>= 4 shared shingles with any "
        "benchmark doc), how many distinct benchmark docs are hit, and "
        "the contamination rate. Always non-empty (every source gets a "
        "row, zeros included — the empty-frame canonicalizer trap). Same "
        "broadcast-bench plan as the flag query; one extra per-source "
        "aggregate."
    ),
)
def contamination_report_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import shingle_hash_set_sql

    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", "source", F.expr(shingle_hash_set_sql("text")).alias("hs")
    )
    bench = sh.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("bench_id"), F.explode("hs").alias("h")
    )
    train = sh.filter(F.col("doc_id") % 97 != 0).select(
        F.col("doc_id").alias("train_id"), "source", F.explode("hs").alias("h")
    )
    hits = (
        train.join(F.broadcast(bench), "h")
        .groupBy("train_id", "source", "bench_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= 4)
    )
    tot = (
        sh.filter(F.col("doc_id") % 97 != 0)
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"))
    )
    per_src = hits.groupBy("source").agg(
        F.countDistinct("train_id").alias("n_contaminated"),
        F.countDistinct("bench_id").alias("n_bench_hit"),
    )
    return (
        tot.join(per_src, "source", "left")
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.coalesce("n_contaminated", F.lit(0))
            .cast("long")
            .alias("n_contaminated"),
            F.coalesce("n_bench_hit", F.lit(0))
            .cast("long")
            .alias("n_bench_hit"),
            (
                F.coalesce("n_contaminated", F.lit(0)).cast("double")
                / F.col("n_docs")
            ).alias("contamination_rate"),
        )
    )
