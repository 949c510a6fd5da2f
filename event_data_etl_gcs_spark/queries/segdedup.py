"""Segment-level exact deduplication (CCNet-style line dedup).

CCNet (Wenzek et al. 2020) and Dolma deduplicate at PARAGRAPH/LINE
granularity before any document-level pass: boilerplate (headers,
navigation, license blocks) repeats across documents that are otherwise
unique, so whole-document hashing never removes it. The operation is:
split every document into segments, keep only the globally FIRST
occurrence of each distinct segment (ordered by (doc_id, position)),
and reconstruct documents from their surviving segments.

The synthetic corpus has no newlines, so segments here are fixed
SEG_W-token windows — the published pipelines' split-on-newline is one
`split(text, '\\n')` away and changes nothing structural.

Scale posture (100 TB): segmenting is map-only (one fused
tokenize+slice expression per doc, ~n_tokens/SEG_W rows out). The
first-occurrence pass is ONE partial-aggregating groupBy on the segment
string — a heavily duplicated segment (the boilerplate case, by
construction the common one) collapses map-side before the shuffle, so
segment skew does not concentrate rows the way a window
row_number-over-segment would. Reconstruction is one groupBy(doc_id)
(pre-partitioned by the scan at best, one shuffle at worst) plus a
left join back to the doc spine. No Python in the path.

Reference behavior: the reference repo has no text curation at all
(it is a 950-line JSON->parquet ETL); this module is part of the
mandated LLM-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import duck_tokens, let_sql, tokens_sql
from ..sources.catalog import load_table
from .registry import query

SEG_W = 20  # tokens per segment (split-on-newline analog)


def segments_sql(text_col: str) -> str:
    """Spark SQL: array of SEG_W-token segment strings (space-joined);
    empty/blank text -> empty array. Tokens are bound once (let), each
    segment is a 1-based slice of the token array."""
    body = (
        f"CASE WHEN size(tk) = 0 THEN array() ELSE "
        f"transform(sequence(0, CAST((size(tk) + {SEG_W - 1}) div {SEG_W} AS INT) - 1), "
        f"segi -> array_join(slice(tk, segi * {SEG_W} + 1, {SEG_W}), ' ')) END"
    )
    return let_sql(tokens_sql(text_col), "tk", body)


_DUCK_SEGS = f"""
  SELECT doc_id,
         CAST(u.segi AS INTEGER) AS seg_pos,
         array_to_string(
           list_slice(toks, CAST(u.segi * {SEG_W} + 1 AS BIGINT),
                      CAST(u.segi * {SEG_W} + {SEG_W} AS BIGINT)), ' ') AS seg
  FROM (SELECT doc_id, {duck_tokens('text')} AS toks FROM documents) tkq,
       UNNEST(range(0, (len(toks) + {SEG_W - 1}) // {SEG_W})) AS u(segi)
"""

_DUCK_WINNERS = f"""
  SELECT doc_id, seg_pos, seg FROM (
    SELECT doc_id, seg_pos, seg,
           ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, seg_pos) AS rn
    FROM segs) w WHERE rn = 1
"""


def _exploded_segments(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        F.posexplode(F.expr(segments_sql("text"))).alias("seg_pos", "seg"),
    ).select("doc_id", F.col("seg_pos").cast("int").alias("seg_pos"), "seg")


def _winners(segs: DataFrame) -> DataFrame:
    """Globally first (doc_id, seg_pos) per distinct segment string.

    min(struct(...)) aggregates partially (map-side combine) — the
    deliberate choice over a row_number window, which would sort every
    occurrence of a hot boilerplate segment inside one partition.
    """
    return (
        segs.groupBy("seg")
        .agg(F.min(F.struct("doc_id", "seg_pos")).alias("w"))
        .select(
            F.col("w.doc_id").alias("doc_id"),
            F.col("w.seg_pos").alias("seg_pos"),
            "seg",
        )
    )


@query(
    "segment_dedup_flags",
    oracle=f"""
WITH segs AS ({_DUCK_SEGS}),
winners AS ({_DUCK_WINNERS})
SELECT s.doc_id, s.seg_pos, s.seg,
       CAST(CASE WHEN w.doc_id = s.doc_id AND w.seg_pos = s.seg_pos
            THEN 1 ELSE 0 END AS INTEGER) AS kept
FROM segs s JOIN winners w USING (seg)
""",
    doc=(
        "Per-segment keep/drop decision for CCNet-style segment-level "
        "exact dedup: every SEG_W-token segment of every document, "
        "flagged 1 iff it is the globally first occurrence (min "
        "(doc_id, position)) of that exact segment string. The "
        "first-occurrence table comes from one partial-aggregating "
        "groupBy(segment) — boilerplate segments collapse map-side."
    ),
)
def segment_dedup_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    segs = _exploded_segments(docs)
    w = _winners(segs)
    return segs.alias("s").join(w.alias("w"), "seg").select(
        F.col("s.doc_id").alias("doc_id"),
        F.col("s.seg_pos").alias("seg_pos"),
        "seg",
        F.when(
            (F.col("w.doc_id") == F.col("s.doc_id"))
            & (F.col("w.seg_pos") == F.col("s.seg_pos")),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("kept"),
    )


@query(
    "segment_dedup_reconstruct",
    oracle=f"""
WITH segs AS ({_DUCK_SEGS}),
winners AS ({_DUCK_WINNERS}),
base AS (
  SELECT doc_id,
         (len({duck_tokens('text')}) + {SEG_W - 1}) // {SEG_W} AS n_segs
  FROM documents
),
rec AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         array_to_string(list(seg ORDER BY seg_pos), ' ') AS text_dedup
  FROM winners GROUP BY doc_id
)
SELECT b.doc_id, CAST(b.n_segs AS BIGINT) AS n_segs,
       COALESCE(r.n_kept, 0) AS n_kept,
       COALESCE(r.text_dedup, '') AS text_dedup
FROM base b LEFT JOIN rec r USING (doc_id)
""",
    doc=(
        "Documents reconstructed after segment-level exact dedup: each "
        "doc keeps only segments whose globally first occurrence it "
        "owns, rejoined in position order (the CCNet output shape — a "
        "cleaned corpus, not just a report). Docs made entirely of "
        "previously-seen segments survive with empty text, preserving "
        "the doc spine for downstream joins."
    ),
)
def segment_dedup_reconstruct(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.expr(
            let_sql(
                tokens_sql("text"),
                "tk",
                f"CAST((size(tk) + {SEG_W - 1}) div {SEG_W} AS BIGINT)",
            )
        ).alias("n_segs"),
    )
    rec = (
        _winners(_exploded_segments(docs))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_kept"),
            F.array_join(
                F.expr("transform(sort_array(collect_list(struct(seg_pos, seg))), p -> p.seg)"),
                " ",
            ).alias("text_dedup"),
        )
    )
    return base.join(rec, "doc_id", "left").select(
        "doc_id",
        "n_segs",
        F.coalesce(F.col("n_kept"), F.lit(0).cast("bigint")).alias("n_kept"),
        F.coalesce(F.col("text_dedup"), F.lit("")).alias("text_dedup"),
    )
