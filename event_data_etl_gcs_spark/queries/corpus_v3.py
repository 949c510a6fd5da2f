"""Training-corpus pipeline v3: the round-7 curation stages composed
end-to-end — CCNet-style segment dedup, quality gate over the
RECONSTRUCTED text, exact dedup, then DSIR importance selection.

v1 (training_corpus_select) is gate -> exact -> MinHash near-dedup; v3
is the orthogonal modern recipe: strip cross-document boilerplate at
segment granularity FIRST (so the gate and the dedup see the cleaned
text), then select the target-like top fraction per source stream with
DSIR weights. Everything is deterministic, so the full composition has
one exact DuckDB oracle.

Scale shape: segment dedup adds one groupBy(segment) + one
groupBy(doc_id) to the v1 plan; the DSIR stages add one explode, one
4096-row broadcast join, and one doc-keyed aggregate — no corpus
self-join anywhere in v3 (near-dedup stays in v1/v2, which already
carry it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.dsir import (
    DSIR_BUCKETS,
    bucket_counts,
    ratio_table,
    score_docs,
    token_buckets,
)
from ..operators.text import (
    duck_char_hash,
    duck_quality_select,
    duck_shingle_hash_set,
    duck_tokens,
)
from ..plans.training_corpus import (
    MAX_PUNCT_RATIO,
    MAX_STOPWORD_RATIO,
    MIN_TOKENS,
    exact_dedup_keep_min,
    quality_gate,
)
from ..queries.lm_quality import DSIR_KEEP_DENOM
from ..sources.catalog import load_table
from .registry import query
from .segdedup import _DUCK_SEGS, _DUCK_WINNERS, segment_dedup_reconstruct
from .substring_dedup import KEEP_FIRST_HEAD, substring_dedup_keep_first_frame

_B = DSIR_BUCKETS
_QSEL = duck_quality_select()

# Shared oracle head: boilerplate-stripped, gated, exact-deduped docs
# (the `uniq` CTE). v3 feeds `uniq` straight into DSIR; v4 splices a
# containment-dedup stage in between.
_V3_HEAD = f"""segs AS MATERIALIZED ({_DUCK_SEGS}),
winners AS MATERIALIZED ({_DUCK_WINNERS}),
recon AS (
  SELECT doc_id, array_to_string(list(seg ORDER BY seg_pos), ' ') AS text
  FROM winners GROUP BY doc_id
),
d3 AS MATERIALIZED (
  SELECT d.doc_id, d.lang, d.source, r.text, {duck_tokens('r.text')} AS toks
  FROM documents d JOIN recon r USING (doc_id)
),
gated AS MATERIALIZED (
  SELECT doc_id, lang, source, text
  FROM d3
  WHERE {_QSEL['n_tokens']} >= {MIN_TOKENS}
    AND {_QSEL['stopword_ratio']} <= {MAX_STOPWORD_RATIO}
    AND {_QSEL['punct_ratio']} <= {MAX_PUNCT_RATIO}
),
uniq AS MATERIALIZED (
  SELECT g.doc_id, g.source, g.text
  FROM gated g
  JOIN (SELECT text, MIN(doc_id) AS doc_id FROM gated GROUP BY text) k
    ON g.text = k.text AND g.doc_id = k.doc_id
)"""


def _dsir_tail(src: str) -> str:
    """DSIR selection CTE chain + final SELECT over a
    (doc_id, source, text) CTE named ``src``."""
    return f"""dbase AS MATERIALIZED (
  SELECT doc_id, source, doc_id % 97 = 0 AS is_target,
         {duck_tokens('text')} AS toks
  FROM {src}
),
dtk AS MATERIALIZED (
  SELECT doc_id, source, is_target, dti AS pos,
         {duck_char_hash('toks[dti]')} % {_B} AS h
  FROM dbase, unnest(range(1, len(toks) + 1)) AS dr(dti)
),
dbc AS MATERIALIZED (
  SELECT h,
         SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS ct,
         SUM(CASE WHEN is_target THEN 0 ELSE 1 END) AS cs
  FROM dtk GROUP BY h
),
dtot AS (
  SELECT CAST(SUM(ct) AS BIGINT) AS nt, CAST(SUM(cs) AS BIGINT) AS ns FROM dbc
),
dr2 AS (
  SELECT dbc.h,
         (CAST(dbc.ct + 1 AS DOUBLE) / CAST(dbc.cs + 1 AS DOUBLE))
         * (CAST(dtot.ns + {_B} AS DOUBLE) / CAST(dtot.nt + {_B} AS DOUBLE))
           AS ratio
  FROM dbc CROSS JOIN dtot
),
dj AS (
  SELECT t.doc_id, t.source, t.pos, dr2.ratio
  FROM dtk t JOIN dr2 USING (h) WHERE NOT t.is_target
),
dw AS (
  SELECT doc_id, source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                  list(ratio ORDER BY pos)),
                     (acc, x) -> acc + x) / CAST(COUNT(*) AS DOUBLE)
           AS mean_lr
  FROM dj GROUP BY doc_id, source
),
ranked AS (
  SELECT doc_id, source, n_tokens, mean_lr,
         CAST(row_number() OVER (PARTITION BY source
              ORDER BY mean_lr DESC, doc_id) AS INTEGER) AS rk,
         COUNT(*) OVER (PARTITION BY source) AS n_src
  FROM dw
)
SELECT doc_id, source, n_tokens, mean_lr, rk FROM ranked
WHERE rk <= (n_src + {DSIR_KEEP_DENOM - 1}) // {DSIR_KEEP_DENOM}
"""


_V3_SQL = f"WITH {_V3_HEAD},\n{_dsir_tail('uniq')}"

# v4 containment stage: keep-the-container policy between exact dedup
# and DSIR (threshold 4/5, mirroring dedup_containment_keep).
_V4_CONTAIN = f"""csets AS MATERIALIZED (
  SELECT doc_id, {duck_shingle_hash_set('text')} AS s FROM uniq
),
cne AS MATERIALIZED (SELECT doc_id, s FROM csets WHERE len(s) > 0),
cpairs AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib, len(a.s) AS na, len(b.s) AS nb
  FROM cne a JOIN cne b ON a.doc_id <> b.doc_id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s) >= 0.8
),
closers AS (
  SELECT DISTINCT ia FROM cpairs WHERE nb > na OR (nb = na AND ib < ia)
),
uniq2 AS MATERIALIZED (
  SELECT u.doc_id, u.source, u.text FROM uniq u
  WHERE u.doc_id NOT IN (SELECT ia FROM closers)
)"""

_V4_SQL = f"WITH {_V3_HEAD},\n{_V4_CONTAIN},\n{_dsir_tail('uniq2')}"


def _dsir_select(uniq: DataFrame) -> DataFrame:
    """Shared DSIR tail: importance weights over ``uniq`` (doc_id,
    source, text), keep the target-like top 1/DSIR_KEEP_DENOM per
    source stream. Mirrors _dsir_tail exactly."""
    # tk feeds BOTH the model (bucket_counts) and the scoring join
    # (score_docs); without truncation the token explode — char-hash per
    # token, the most expensive map work in the pipeline — executes once
    # per consumer (measured 2.8 s per execution at sf0.1). One
    # materialized token pass is also the shape the DSIR paper assumes.
    tk = token_buckets(uniq).localCheckpoint(eager=True)
    w = score_docs(tk, ratio_table(bucket_counts(tk)))
    win = Window.partitionBy("source").orderBy(
        F.col("mean_lr").desc(), F.col("doc_id")
    )
    ranked = w.select(
        "doc_id",
        "source",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "mean_lr",
        F.row_number().over(win).cast("int").alias("rk"),
        F.count("*").over(Window.partitionBy("source")).alias("n_src"),
    )
    return ranked.filter(
        F.col("rk")
        <= F.expr(f"(n_src + {DSIR_KEEP_DENOM - 1}) div {DSIR_KEEP_DENOM}")
    ).select("doc_id", "source", "n_tokens", "mean_lr", "rk")


def _v3_unique_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    rec = segment_dedup_reconstruct(spark, sf_dir)
    d3 = docs.select("doc_id", "lang", "source").join(
        rec.filter(F.col("n_kept") > 0).select(
            "doc_id", F.col("text_dedup").alias("text")
        ),
        "doc_id",
    )
    gated = quality_gate(d3).select("doc_id", "source", "text")
    # localCheckpoint (round 12): every consumer references this head
    # several times (the DSIR tail reads it twice, v4's containment
    # stage five times, v6's LM stage four) — without lineage truncation
    # the multi-shuffle head is RE-PLANNED per reference and the
    # composed initial plans carried 26 (v3) / 349 (v4) / 140 (v6)
    # Exchange nodes with 12 MiB task binaries. Truncating here runs
    # the head ONCE per invocation (inside the timed region — nothing
    # is reused across runs) and shrinks every downstream plan to its
    # own stage count. cache() is NOT equivalent: it dedupes execution
    # but leaves the full lineage in every stage's task binary (the
    # r10/r11 graph-operator lesson).
    return exact_dedup_keep_min(gated).localCheckpoint(eager=True)


@query(
    "training_corpus_v3_select",
    oracle=_V3_SQL,
    doc=(
        "Training-corpus pipeline v3: segment-level exact dedup (strip "
        "cross-document boilerplate, reconstruct the cleaned text) -> "
        "quality gate over the RECONSTRUCTED text -> exact dedup -> "
        "DSIR importance weights trained on the surviving corpus -> "
        "keep the target-like top 1/5 per source stream. One exact "
        "cross-engine oracle over the whole composition; the only "
        "corpus-wide operations are two groupBys (segment, doc) plus "
        "the DSIR explode/broadcast-join/aggregate — no self-join."
    ),
)
def training_corpus_v3_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dsir_select(_v3_unique_docs(spark, sf_dir))


def _v4_unique_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v3's unique docs minus containment losers (keep-the-container):
    a doc whose shingle set is >= 0.8 contained in a STRICTLY LARGER
    set is dropped (ties keep the smaller id) — doc-within-doc
    duplication survives every v3 stage (distinct text => exact dedup
    misses it; Jaccard-tuned MinHash under-samples it; DSIR scores it
    like its container)."""
    from ..operators.dedup import containment_pairs

    # _v3_unique_docs is already localCheckpoint-materialized (lineage
    # truncated); the old cache() on top only added a second copy of
    # the same rows to storage.
    uniq = _v3_unique_docs(spark, sf_dir)
    # pairs + sizes off ONE cached shingle frame (no re-shingling)
    pairs, sizes = containment_pairs(
        uniq, threshold_num=4, threshold_den=5, return_sizes=True
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("nb"))
    losers = (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(
            (F.col("nb") > F.col("na"))
            | ((F.col("nb") == F.col("na")) & (F.col("id_b") < F.col("id_a")))
        )
        .select(F.col("id_a").alias("doc_id"))
        .distinct()
    )
    # The DSIR tail reads this frame twice (token explode per consumer);
    # untruncated, each read re-runs the whole containment prefix-probe
    # pipeline (~5 s at sf0.1).
    return uniq.join(losers, "doc_id", "left_anti").localCheckpoint(
        eager=True
    )


@query(
    "training_corpus_v4_select",
    oracle=_V4_SQL,
    doc=(
        "Training-corpus pipeline v4 (VERDICT r7 #3): v3 with a "
        "containment-dedup stage spliced between exact dedup and DSIR "
        "— segment dedup -> gate -> exact dedup -> keep-the-container "
        "containment dedup (exact prefix filtering, threshold 4/5) -> "
        "DSIR top-1/5 per source. Doc-within-doc duplication survives "
        "all v3 stages; this closes it. One exact cross-engine oracle "
        "over the whole five-stage composition; the containment stage "
        "adds one shingle explode + doc-freq aggregate + prefix-probe "
        "equi-join — candidate/verify-shaped, never all-pairs."
    ),
)
def training_corpus_v4_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dsir_select(_v4_unique_docs(spark, sf_dir))


# ------------------------------------------------------------------
# v5: the Lee et al. 2021 ExactSubstr recipe — substring-granularity
# dedup as the HEAD stage (on the RAW corpus, where sub-segment
# duplication actually lives; after segment dedup the keep-first
# substring pass is a measured no-op at every SF), then gate -> exact
# dedup -> DSIR over the CLEANED text.
# ------------------------------------------------------------------

_V5_SQL = f"""WITH {KEEP_FIRST_HEAD},
v5c AS MATERIALIZED (
  SELECT t.doc_id, t.source, p.text_clean AS text,
         {duck_tokens('p.text_clean')} AS toks
  FROM tk t JOIN per_doc p USING (doc_id)
),
gated5 AS MATERIALIZED (
  SELECT doc_id, source, text
  FROM v5c
  WHERE {_QSEL['n_tokens']} >= {MIN_TOKENS}
    AND {_QSEL['stopword_ratio']} <= {MAX_STOPWORD_RATIO}
    AND {_QSEL['punct_ratio']} <= {MAX_PUNCT_RATIO}
),
uniq5 AS MATERIALIZED (
  SELECT g.doc_id, g.source, g.text
  FROM gated5 g
  JOIN (SELECT text, MIN(doc_id) AS doc_id FROM gated5 GROUP BY text) k
    ON g.text = k.text AND g.doc_id = k.doc_id
),
{_dsir_tail('uniq5')}"""


def _v5_unique_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cleaned = substring_dedup_keep_first_frame(docs)
    d5 = cleaned.select(
        "doc_id", "source", F.col("text_clean").alias("text")
    )
    gated = quality_gate(d5).select("doc_id", "source", "text")
    # Same lineage-truncation rationale as _v3_unique_docs: the DSIR
    # tail reads this head twice.
    return exact_dedup_keep_min(gated).localCheckpoint(eager=True)


@query(
    "training_corpus_v5_select",
    oracle=_V5_SQL,
    doc=(
        "Training-corpus pipeline v5: the Lee et al. 2021 ExactSubstr "
        "recipe end-to-end — keep-first exact substring dedup on the "
        "RAW corpus (every cross-document duplicated run of >= 8 "
        "tokens keeps exactly one canonical copy) -> quality gate over "
        "the CLEANED text -> exact dedup -> DSIR top-1/5 per source. "
        "v3 strips duplication at segment granularity; v5 cuts it at "
        "sub-segment (token-run) granularity, the one the suffix-array "
        "tools use — measured: after v3's segment stage the substring "
        "pass is a no-op, so the two heads are genuinely orthogonal "
        "recipes over the same DSIR tail. One exact cross-engine "
        "oracle over the whole composition; the head is explode-bound "
        "(token-linear gram stream, one groupBy(gram), equi-join on "
        "gram, one groupBy(doc_id) rebuild) — nothing pair-bound "
        "anywhere in v5."
    ),
)
def training_corpus_v5_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dsir_select(_v5_unique_docs(spark, sf_dir))


# ------------------------------------------------------------------
# v6: the CCNet recipe head-to-tail — v3's cleaning head, then the
# Wenzek et al. 2020 LM-quality stage (bigram-LM terciles per
# language, drop the tail) BEFORE DSIR selection, so the importance
# sampler never sees disfluent text.
# ------------------------------------------------------------------

from .lm_bigram import ccnet_tercile_keep, duck_ccnet_keep  # noqa: E402

_V6_SQL = f"""WITH {_V3_HEAD},
u6 AS MATERIALIZED (
  SELECT u.doc_id, u.source, u.text, d.lang
  FROM uniq u JOIN documents d USING (doc_id)
),
{duck_ccnet_keep('u6', 'c6')},
{_dsir_tail('c6keep')}"""


def _v6_unique_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The v3 head feeds four branches of the LM stage (vocab totals,
    # bigram model, scoring rows, final keep join); measured at sf0.1,
    # Spark's ReusedExchange already shares the head's shuffles across
    # them — an explicit cache() was tried and was NOT a win (18.0 s
    # cold / 7.2 s warm cached vs 16.7 / 6.8 uncached).
    uniq = _v3_unique_docs(spark, sf_dir)
    lang = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return ccnet_tercile_keep(uniq.join(lang, "doc_id"))


@query(
    "training_corpus_v6_select",
    oracle=_V6_SQL,
    doc=(
        "Training-corpus pipeline v6 (round 9): segment dedup -> gate "
        "-> exact dedup -> CCNet LM-quality stage (bigram model "
        "trained on the SURVIVING corpus, per-language score "
        "terciles, tail dropped) -> DSIR top-1/5 per source. The "
        "LM stage removes the disfluent third BEFORE importance "
        "sampling, so DSIR's source pool is fluent text only — the "
        "orthogonal quality axis v3-v5 never filter on (they dedup "
        "and gate on surface stats; none of them model token "
        "TRANSITIONS). One exact cross-engine oracle over the whole "
        "six-stage composition. Scale shape: adds the bigram model "
        "aggregates + one per-language rank window to v3 — still no "
        "corpus self-join anywhere."
    ),
)
def training_corpus_v6_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dsir_select(_v6_unique_docs(spark, sf_dir))
