"""End-to-end training-corpus pipeline as an oracle-checked query: every
stage (quality gate, exact dedup, MinHash near-dedup) is deterministic,
so the full composition has an exact DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import duck_minhash_lsh_ctes
from ..operators.text import duck_quality_select, duck_tokens
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
