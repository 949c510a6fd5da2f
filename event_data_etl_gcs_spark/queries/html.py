"""HTML/boilerplate extraction queries (VERDICT r9 directive #1).

Three registered surfaces over the deterministic raw-HTML fixture
derived in-query from ``documents`` (operators/html.py):

* ``extract_text`` — per-document main-content extraction with audit
  counters (block counts, raw vs extracted char counts).
* ``extraction_stats`` — per-source aggregate audit (docs, blocks
  kept/total, char retention ratio) — the numbers an operator watches
  to catch an extraction regression on a new crawl snapshot.
* ``extract_quality_gate`` — end-to-end: extracted text feeding the
  Gopher-rule quality features, the corpus-pipeline composition
  (HTML -> main content -> quality gate).

All exact-oracle: the fixture and every extraction step have
bit-identical DuckDB spellings. Scale shape: extract_text is map-only
(no shuffle, one WholeStageCodegen span — plan-pinned);
extraction_stats adds exactly one partial-aggregated groupBy(source);
the gate composition stays map-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.html import (
    block_features_sql,
    blocks_sql,
    duck_blocks,
    duck_extracted_text,
    duck_html_fixture,
    duck_n_blocks,
    duck_n_kept,
    html_fixture_sql,
)
from ..operators.text import (
    duck_language_id,
    duck_quality_select,
    language_id_column,
    quality_columns,
    with_tokens,
)
from ..sources.catalog import load_table
from .registry import query

_DUCK_FIXTURE_CTES = (
    "h AS MATERIALIZED ("
    "  SELECT doc_id, source, "
    f"  {duck_html_fixture('doc_id', 'text', 'source')} AS html"
    "  FROM documents"
    "), b AS MATERIALIZED ("
    f"  SELECT doc_id, source, html, {duck_blocks('html')} AS blocks FROM h"
    ")"
)


def with_html_fixture(docs: DataFrame) -> DataFrame:
    """documents + the derived raw-HTML page and its block segments
    (staged as real columns per the operators/text.py convention)."""
    return docs.withColumn(
        "html", F.expr(html_fixture_sql("doc_id", "text", "source"))
    ).withColumn("blocks", F.expr(blocks_sql("html")))


def extract_frame(docs: DataFrame) -> DataFrame:
    # feats stages (cleaned text, keep flag) per block ONCE; the three
    # consumers below read struct fields instead of re-running the clean
    # chain (round-12 fusion — see operators/html.block_features_sql).
    staged = with_html_fixture(docs).withColumn(
        "feats", F.expr(block_features_sql("blocks"))
    )
    return staged.select(
        "doc_id",
        "source",
        F.expr("size(filter(feats, f -> length(f.c) > 0))")
        .cast("int")
        .alias("n_blocks"),
        F.expr("size(filter(feats, f -> f.k))").cast("int").alias("n_blocks_kept"),
        F.length("html").cast("bigint").alias("n_chars_html"),
        F.expr("array_join(transform(filter(feats, f -> f.k), f -> f.c), ' ')").alias(
            "text_clean"
        ),
    ).withColumn("n_chars_text", F.length("text_clean").cast("bigint"))


_EXTRACT_SQL = f"""
WITH {_DUCK_FIXTURE_CTES}, e AS (
  SELECT doc_id, source,
         CAST({duck_n_blocks('blocks')} AS INTEGER) AS n_blocks,
         CAST({duck_n_kept('blocks')} AS INTEGER) AS n_blocks_kept,
         CAST(length(html) AS BIGINT) AS n_chars_html,
         {duck_extracted_text('blocks')} AS text_clean
  FROM b
)
SELECT doc_id, source, n_blocks, n_blocks_kept, n_chars_html, text_clean,
       CAST(length(text_clean) AS BIGINT) AS n_chars_text
FROM e
"""


@query(
    "extract_text",
    oracle=_EXTRACT_SQL,
    doc=(
        "Main-content extraction from raw HTML: script/style/comment "
        "stripping, block segmentation on block-level tags, per-block "
        "length + link-density keep rule (jusText-style, integer "
        "thresholds), kept blocks rejoined in order — all native "
        "Catalyst regex/lambda expressions, zero per-row Python. "
        "Map-only: no shuffle at any corpus size; the whole operator is "
        "one codegen span over the scan."
    ),
)
def extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_frame(load_table(spark, sf_dir, "documents", fan_out=True))


_STATS_SQL = f"""
WITH {_DUCK_FIXTURE_CTES}, e AS (
  SELECT doc_id, source,
         CAST({duck_n_blocks('blocks')} AS INTEGER) AS n_blocks,
         CAST({duck_n_kept('blocks')} AS INTEGER) AS n_blocks_kept,
         CAST(length(html) AS BIGINT) AS n_chars_html,
         CAST(length({duck_extracted_text('blocks')}) AS BIGINT) AS n_chars_text
  FROM b
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_blocks) AS BIGINT) AS sum_blocks,
       CAST(SUM(n_blocks_kept) AS BIGINT) AS sum_blocks_kept,
       CAST(SUM(n_chars_html) AS BIGINT) AS sum_chars_html,
       CAST(SUM(n_chars_text) AS BIGINT) AS sum_chars_text,
       CAST(SUM(n_chars_text) AS DOUBLE) / CAST(SUM(n_chars_html) AS DOUBLE)
         AS char_retention
FROM e GROUP BY source
"""


@query(
    "extraction_stats",
    oracle=_STATS_SQL,
    doc=(
        "Per-source extraction audit: document count, total vs kept "
        "blocks, raw-HTML vs extracted char sums, and the char-retention "
        "ratio (one exact double division over exact integer sums). A "
        "sudden retention drop on one source is the canonical signal of "
        "a markup change breaking extraction. One partial-aggregated "
        "groupBy(source) after the map-only extraction."
    ),
)
def extraction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = extract_frame(load_table(spark, sf_dir, "documents", fan_out=True))
    return e.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_blocks").cast("bigint").alias("sum_blocks"),
        F.sum("n_blocks_kept").cast("bigint").alias("sum_blocks_kept"),
        F.sum("n_chars_html").cast("bigint").alias("sum_chars_html"),
        F.sum("n_chars_text").cast("bigint").alias("sum_chars_text"),
        (
            F.sum("n_chars_text").cast("double")
            / F.sum("n_chars_html").cast("double")
        ).alias("char_retention"),
    )


_GATE_SQL = (
    f"WITH {_DUCK_FIXTURE_CTES}, e AS ("
    f"  SELECT doc_id, {duck_extracted_text('blocks')} AS text FROM b"
    "), staged AS MATERIALIZED ("
    "  SELECT doc_id, text, "
    "  CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[]) "
    "  ELSE string_split_regex(trim(text), '\\s+') END AS toks"
    "  FROM e"
    ") SELECT doc_id, "
    + ", ".join(
        f"{sql} AS {name}"
        for name, sql in duck_quality_select().items()
    )
    + " FROM staged"
)


@query(
    "extract_quality_gate",
    oracle=_GATE_SQL,
    doc=(
        "End-to-end HTML -> main content -> quality features: the "
        "extracted text (not the raw page) feeds the Gopher-style "
        "length/word-shape/stopword features, exactly as a crawl "
        "pipeline composes the two stages. Still map-only — extraction "
        "and featurization fuse into one codegen span."
    ),
)
def extract_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    e = extract_frame(docs).select("doc_id", F.col("text_clean").alias("text"))
    staged = with_tokens(e)
    q = quality_columns()
    return staged.select(
        "doc_id", *[c.alias(n) for n, c in q.items()]
    )


_LANGID_SQL = (
    f"WITH {_DUCK_FIXTURE_CTES}, e AS ("
    f"  SELECT doc_id, {duck_extracted_text('blocks')} AS text FROM b"
    "), staged AS MATERIALIZED ("
    "  SELECT doc_id, "
    "  CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[]) "
    "  ELSE string_split_regex(trim(text), '\\s+') END AS toks"
    "  FROM e"
    ") SELECT s.doc_id, d.lang AS lang_true, "
    f"{duck_language_id('s.toks')} AS lang_pred "
    "FROM staged s JOIN documents d ON d.doc_id = s.doc_id"
)


@query(
    "extract_langid",
    oracle=_LANGID_SQL,
    doc=(
        "End-to-end HTML -> main content -> language ID: the marker-"
        "lexicon argmax runs on the EXTRACTED text (boilerplate markup "
        "would poison the marker counts on the raw page), alongside the "
        "labeled language. Map-only; extraction and the langid lambda "
        "fuse into one codegen span."
    ),
)
def extract_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    e = extract_frame(docs).select("doc_id", F.col("text_clean").alias("text"))
    staged = with_tokens(e)
    return staged.join(
        docs.select("doc_id", "lang"), "doc_id"
    ).select(
        "doc_id",
        F.col("lang").alias("lang_true"),
        language_id_column("toks").alias("lang_pred"),
    )
