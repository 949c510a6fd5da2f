"""Span-level benchmark decontamination (GPT-3 appendix C / The Pile
style): instead of dropping a training document that collides with an
eval benchmark, surgically REMOVE the colliding n-gram span (plus a
safety margin) and keep the rest of the document.

The existing decontaminate_against_benchmark is the document-level
policy (drop docs sharing >= 4 shingles); this is the surgical one —
at 100 TB dropping whole documents for one leaked sentence wastes real
data, so production pipelines cut the span.

Pipeline: benchmark pool = docs with doc_id % 97 = 0 (the repo-wide
split convention). Its distinct K-token grams form the contamination
set — by definition eval sets are small, so the gram set BROADCASTS.
Every non-benchmark document's gram stream joins against it (map-side,
no corpus shuffle); each hit marks tokens [pos-MARGIN, pos+K-1+MARGIN]
for removal; surviving tokens rebuild the cleaned text in position
order (one groupBy(doc_id)).

The hit-to-token marking is an equi-join on doc_id with a range
residual — per document the ranges are a handful of hits x a few
hundred tokens, so the residual never explodes; at cluster scale both
sides of that join are already co-partitioned by the explode's
parent scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import duck_tokens, tokens_sql
from ..sources.catalog import load_table
from .registry import query

DECON_K = 4  # gram length (GPT-3 uses 13; scaled to this corpus)
DECON_MARGIN = 2  # tokens removed on each side of a hit


def _grams_sql(tok_col: str, k: int = DECON_K) -> str:
    parts = ", ".join(f"element_at({tok_col}, gi + {j})" for j in range(k))
    return (
        f"CASE WHEN size({tok_col}) < {k} THEN array() ELSE "
        f"transform(sequence(1, size({tok_col}) - {k - 1}), "
        f"gi -> concat_ws(' ', {parts})) END"
    )


def _duck_grams(tok_col: str, k: int = DECON_K) -> str:
    return (
        f"list_transform(range(1, len({tok_col}) - {k - 2}), "
        f"dgi -> array_to_string(list_slice({tok_col}, dgi, dgi + {k - 1}), ' '))"
    )


_DUCK_V = f"""
SELECT doc_id, source, {duck_tokens('text')} AS toks FROM documents
"""

_SPAN_SQL = f"""
WITH tk AS MATERIALIZED ({_DUCK_V}),
grams AS MATERIALIZED (
  SELECT doc_id, CAST(u.gpos AS INTEGER) AS pos, g.gram
  FROM (SELECT doc_id, {_duck_grams('toks')} AS gs FROM tk) tg,
       unnest(range(1, len(gs) + 1)) AS u(gpos),
       LATERAL (SELECT gs[gpos] AS gram) g
),
bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0),
hits AS MATERIALIZED (
  SELECT g.doc_id, g.pos FROM grams g JOIN bench USING (gram)
  WHERE g.doc_id % 97 <> 0
),
tpos AS MATERIALIZED (
  SELECT doc_id, source, CAST(u.ti AS INTEGER) AS pos, toks[ti] AS tok,
         len(toks) AS n_tokens
  FROM tk, unnest(range(1, len(toks) + 1)) AS u(ti)
  WHERE doc_id % 97 <> 0
),
kept AS (
  SELECT t.* FROM tpos t
  WHERE NOT EXISTS (
    SELECT 1 FROM hits h
    WHERE h.doc_id = t.doc_id
      AND t.pos BETWEEN h.pos - {DECON_MARGIN}
                    AND h.pos + {DECON_K - 1 + DECON_MARGIN})
),
per_doc AS (
  SELECT doc_id,
         ANY_VALUE(source) AS source,
         ANY_VALUE(n_tokens) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_keep,
         array_to_string(list(tok ORDER BY pos), ' ') AS text_clean
  FROM kept GROUP BY doc_id
),
hit_counts AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits FROM hits GROUP BY doc_id
),
spine AS (
  SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_tokens
  FROM tk WHERE doc_id % 97 <> 0
)
SELECT s.doc_id, s.source, s.n_tokens,
       COALESCE(h.n_hits, 0) AS n_hits,
       s.n_tokens - COALESCE(p.n_keep, 0) AS n_removed,
       COALESCE(p.text_clean, '') AS text_clean
FROM spine s
LEFT JOIN hit_counts h USING (doc_id)
LEFT JOIN per_doc p USING (doc_id)
"""


@query(
    "span_decontaminate",
    oracle=_SPAN_SQL,
    doc=(
        "Span-level benchmark decontamination: every non-benchmark "
        "document whose K-token gram exactly matches a benchmark-pool "
        "gram loses the colliding span plus a margin of tokens on each "
        "side, and the cleaned text is rebuilt in position order — the "
        "GPT-3/Pile surgical policy, vs the document-drop policy of "
        "decontaminate_against_benchmark. The benchmark gram set "
        "broadcasts (eval sets are small by definition); the corpus "
        "sees one map-side gram join and one groupBy(doc_id)."
    ),
)
def span_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select(
        "doc_id", "source", F.expr(tokens_sql("text")).alias("toks")
    )
    grams = tk.select(
        "doc_id",
        F.posexplode(F.expr(_grams_sql("toks"))).alias("pos0", "gram"),
    ).select("doc_id", (F.col("pos0") + 1).cast("int").alias("pos"), "gram")
    bench = (
        grams.filter(F.col("doc_id") % 97 == 0).select("gram").distinct()
    )
    hits = (
        grams.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench), "gram")
        .select("doc_id", "pos")
    )
    train_tk = tk.filter(F.col("doc_id") % 97 != 0)
    tpos = train_tk.select(
        "doc_id",
        "source",
        F.expr("size(toks)").cast("bigint").alias("n_tokens"),
        F.posexplode("toks").alias("ti0", "tok"),
    ).select(
        "doc_id",
        "source",
        "n_tokens",
        (F.col("ti0") + 1).cast("int").alias("pos"),
        "tok",
    )
    h = hits.select(F.col("doc_id").alias("h_doc"), F.col("pos").alias("h_pos"))
    kept = tpos.join(
        h,
        (F.col("doc_id") == F.col("h_doc"))
        & (F.col("pos") >= F.col("h_pos") - DECON_MARGIN)
        & (F.col("pos") <= F.col("h_pos") + DECON_K - 1 + DECON_MARGIN),
        "left_anti",
    )
    per_doc = kept.groupBy("doc_id").agg(
        F.first("source").alias("source_k"),
        F.count("*").cast("bigint").alias("n_keep"),
        F.array_join(
            F.expr("transform(sort_array(collect_list(struct(pos, tok))), p -> p.tok)"),
            " ",
        ).alias("text_clean"),
    )
    hit_counts = hits.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_hits")
    )
    spine = train_tk.select(
        "doc_id", "source", F.expr("size(toks)").cast("bigint").alias("n_tokens")
    )
    return (
        spine.join(hit_counts, "doc_id", "left")
        .join(per_doc.select("doc_id", "n_keep", "text_clean"), "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.coalesce(F.col("n_hits"), F.lit(0).cast("bigint")).alias("n_hits"),
            (
                F.col("n_tokens")
                - F.coalesce(F.col("n_keep"), F.lit(0).cast("bigint"))
            ).alias("n_removed"),
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
        )
    )
