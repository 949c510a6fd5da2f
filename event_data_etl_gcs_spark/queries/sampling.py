"""Deterministic sampling operators for training-data pipelines.

Random sampling (df.sample) is seed- and partitioning-dependent — useless
for reproducible corpus construction. These operators sample by CONTENT
HASH: the same document lands on the same side of the cut on any cluster
layout, any engine, any rerun — and adding data never changes the verdict
on existing rows (the property dataset versioning needs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import (
    HASH_P,
    char_hash_sql,
    duck_char_hash,
    duck_tokens,
    tokens_sql,
)
from ..sources.catalog import load_table
from .registry import query


@query(
    "deterministic_sample",
    oracle=(
        f"WITH h AS (SELECT doc_id, lang, {duck_char_hash('text')} AS fp FROM documents) "
        "SELECT doc_id, lang FROM h WHERE fp % 100 < 20"
    ),
    doc=(
        "Content-hash sampling (~20%): membership depends only on the "
        "text, so it is stable across reruns, partitionings, and engines "
        "— unlike df.sample."
    ),
)
def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("fp", F.expr(char_hash_sql("text")))
        .filter(F.col("fp") % 100 < 20)
        .select("doc_id", "lang")
    )


@query(
    "stratified_balance_sample",
    oracle=f"""
WITH h AS (
  SELECT doc_id, lang, {duck_char_hash('text')} AS fp FROM documents
), stats AS (
  SELECT lang, COUNT(*) AS n FROM h GROUP BY lang
), target AS (
  SELECT MIN(n) AS min_n FROM stats
), rates AS (
  SELECT s.lang, CAST(t.min_n AS DOUBLE) / s.n AS rate FROM stats s, target t
)
SELECT h.doc_id, h.lang FROM h JOIN rates r ON h.lang = r.lang
WHERE (h.fp % {HASH_P}) < r.rate * {HASH_P}
""",
    doc=(
        "Class-balancing stratified sample: per-language keep-rate = "
        "min_class_count / class_count, applied via the content-hash cut "
        "— every stratum downsamples toward the smallest, "
        "deterministically. (Broadcast rate table; one scan.)"
    ),
)
def stratified_balance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = docs.withColumn("fp", F.expr(char_hash_sql("text")))
    stats = h.groupBy("lang").agg(F.count("*").alias("n"))
    min_n = stats.agg(F.min("n").alias("min_n"))
    rates = stats.crossJoin(F.broadcast(min_n)).select(
        "lang", (F.col("min_n").cast("double") / F.col("n")).alias("rate")
    )
    return (
        h.join(F.broadcast(rates), "lang")
        .filter((F.col("fp") % HASH_P) < F.col("rate") * HASH_P)
        .select("doc_id", "lang")
    )


@query(
    "temperature_mix_sample",
    oracle=f"""
WITH h AS (
  SELECT doc_id, source, {duck_char_hash('text')} AS fp FROM documents
), stats AS (
  SELECT source, COUNT(*) AS n FROM h GROUP BY source
), tot AS (
  SELECT SUM(n) AS total, CAST(SUM(sqrt(CAST(n AS DOUBLE))) AS DOUBLE) AS z
  FROM stats
), rates AS (
  SELECT s.source,
         least(1.0, (0.3 * t.total) * (sqrt(CAST(s.n AS DOUBLE)) / t.z) / s.n)
         AS rate
  FROM stats s, tot t
)
SELECT h.doc_id, h.source FROM h JOIN rates r ON h.source = r.source
WHERE (h.fp % {HASH_P}) < r.rate * {HASH_P}
""",
    doc=(
        "Temperature-smoothed source mixing (alpha=0.5): per-source "
        "keep-rate proportional to sqrt(count), normalized to a 30% "
        "corpus budget — upsamples rare sources relative to their share, "
        "the standard pretraining-mixture move. sqrt is IEEE-exact, so "
        "even this smoothed policy is engine-portable and reproducible."
    ),
)
def temperature_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = docs.withColumn("fp", F.expr(char_hash_sql("text")))
    stats = h.groupBy("source").agg(F.count("*").alias("n"))
    tot = stats.agg(
        F.sum("n").alias("total"),
        F.sum(F.sqrt(F.col("n").cast("double"))).cast("double").alias("z"),
    )
    rates = stats.crossJoin(F.broadcast(tot)).select(
        "source",
        F.least(
            F.lit(1.0),
            (F.lit(0.3) * F.col("total"))
            * (F.sqrt(F.col("n").cast("double")) / F.col("z"))
            / F.col("n"),
        ).alias("rate"),
    )
    return (
        h.join(F.broadcast(rates), "source")
        .filter((F.col("fp") % HASH_P) < F.col("rate") * HASH_P)
        .select("doc_id", "source")
    )


@query(
    "fixed_size_sample",
    oracle=(
        f"WITH h AS (SELECT doc_id, lang, {duck_char_hash('text')} AS fp FROM documents) "
        "SELECT doc_id, lang FROM h ORDER BY fp, doc_id LIMIT 50"
    ),
    doc=(
        "Exact-size deterministic sample: take the 50 lowest content "
        "hashes — the distributed form of reservoir sampling with a "
        "stable, content-addressed reservoir (a global top-k, not a "
        "global sort)."
    ),
)
def fixed_size_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("fp", F.expr(char_hash_sql("text")))
        .orderBy("fp", "doc_id")
        .limit(50)
        .select("doc_id", "lang")
    )


@query(
    "train_test_split",
    oracle=(
        f"WITH h AS (SELECT doc_id, {duck_char_hash('text')} AS fp FROM documents) "
        "SELECT doc_id, CASE WHEN fp % 10 < 8 THEN 'train' "
        "WHEN fp % 10 < 9 THEN 'valid' ELSE 'test' END AS split FROM h"
    ),
    doc=(
        "Stable 80/10/10 train/valid/test assignment by content hash — "
        "a document can never leak across splits between dataset versions."
    ),
)
def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fp = F.expr(char_hash_sql("text")) % 10
    return docs.select(
        "doc_id",
        F.when(fp < 8, "train").when(fp < 9, "valid").otherwise("test").alias("split"),
    )


TOKEN_BUDGET_PER_SOURCE = 800


@query(
    "token_budget_sample",
    oracle=f"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len({duck_tokens('text')}) AS BIGINT) AS n_tokens,
         {duck_char_hash('text')} AS fp
  FROM documents
), c AS (
  SELECT doc_id, source, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY fp, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_tokens
  FROM t
)
SELECT doc_id, source, n_tokens, cum_tokens FROM c
WHERE cum_tokens <= {TOKEN_BUDGET_PER_SOURCE}
""",
    doc=(
        "Token-budget mixing: each source contributes documents (in "
        "deterministic content-hash order) until its token budget is "
        "exhausted — how a pretraining mixture caps a domain by tokens "
        "rather than documents. Per-source prefix sum = one hash "
        "partition per source; a pathological mega-source would use the "
        "bucketed distributed prefix-sum (operators/grouped.py "
        "bucketed_running_sum) as the scale path."
    ),
)
def token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "source",
        F.expr(f"size({tokens_sql('text')})").cast("long").alias("n_tokens"),
        F.expr(char_hash_sql("text")).alias("fp"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("fp", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= TOKEN_BUDGET_PER_SOURCE)
        .select("doc_id", "source", "n_tokens", "cum_tokens")
    )
