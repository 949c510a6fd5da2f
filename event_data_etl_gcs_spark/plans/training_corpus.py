"""End-to-end training-data corpus pipeline: the composition the engine
exists for at 100 TB — quality-filter -> exact-dedup -> near-dedup ->
partitioned corpus.

Stages (each deterministic, so the whole pipeline has an exact oracle):
  1. quality gate — token/stopword/punctuation thresholds (map-only,
     pushes down past nothing: it IS the scan projection).
  2. exact dedup — keep the min-id copy of each identical text
     (one shuffle on the content hash).
  3. near-dup removal — MinHash/LSH pairs at jaccard >= threshold; every
     doc that appears as the LARGER id of a surviving pair is dropped
     (keep-smallest policy; greedy but deterministic and one pass —
     transitive chains collapse to their minimum representative across
     reruns).
  4. write partitioned by lang for downstream per-language sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import minhash_lsh_pairs
from ..operators.text import quality_columns, tokens_sql
from ..sources.parquet_sink import write_parquet_table

MIN_TOKENS = 20
MAX_STOPWORD_RATIO = 0.6
MAX_PUNCT_RATIO = 0.2
NEAR_DUP_THRESHOLD = 0.5


def quality_gate(docs: DataFrame) -> DataFrame:
    q = quality_columns()
    staged = docs.withColumn("toks", F.expr(tokens_sql("text"))).withColumns(
        {name: col for name, col in q.items()}
    )
    return staged.filter(
        (F.col("n_tokens") >= MIN_TOKENS)
        & (F.col("stopword_ratio") <= MAX_STOPWORD_RATIO)
        & (F.col("punct_ratio") <= MAX_PUNCT_RATIO)
    ).drop("toks")


def exact_dedup_keep_min(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    keeper = docs.groupBy("text").agg(F.min(id_col).alias(id_col))
    return docs.join(keeper, ["text", id_col], "left_semi")


def near_dedup_keep_min(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    # Texts here are already exact-deduped by the previous stage, so the
    # operator's own collapse-identical pass would be a redundant shuffle.
    pairs = minhash_lsh_pairs(
        docs, id_col=id_col, threshold=NEAR_DUP_THRESHOLD, collapse_identical=False
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return docs.join(losers, id_col, "left_anti")


def select_training_corpus(docs: DataFrame) -> DataFrame:
    """Surviving corpus: (doc_id, lang, source, n_tokens)."""
    gated = quality_gate(docs)
    unique = exact_dedup_keep_min(gated)
    survivors = near_dedup_keep_min(unique)
    return survivors.select("doc_id", "lang", "source", "n_tokens")


def build_training_corpus(docs: DataFrame, output_path: str) -> DataFrame:
    """Full pipeline incl. the partitioned write (lang partitions for
    per-language downstream sampling)."""
    survivors = near_dedup_keep_min(exact_dedup_keep_min(quality_gate(docs)))
    out = survivors.select("doc_id", "text", "lang", "source", "n_tokens")
    write_parquet_table(out, output_path, partition_by=["lang"])
    return out
