"""Language-model-based data curation scores (round 7).

Two published curation signals, re-expressed in the engine's portable
(libm-free) arithmetic so both have EXACT DuckDB oracles:

* ``unigram_surprisal_scores`` — the CCNet/FineWeb idea (score documents
  by LM perplexity, drop the weird tail), with the LM the corpus's own
  MLE unigram model. Classic perplexity runs through ln(); libm logs are
  not bit-portable across engines (the BM25 lesson,
  operators/text.py:591), so the score is the RECIPROCAL-PROBABILITY
  MEAN: (1/n) * sum_i 1/p(w_i) — the 1-power-mean counterpart of the
  geometric-mean perplexity (>= it by AM-GM, equal iff all tokens are
  equiprobable). Every step is +, *, / on doubles with a pinned
  order-of-evaluation: bit-identical across engines.

* ``dsir_importance_weights`` — Data Selection via Importance Resampling
  (Xie et al. 2023, arXiv:2302.03169): weight each raw-corpus document
  by the likelihood ratio of hashed token features under a target
  (benchmark) model vs the source model. The product-of-ratios (log
  domain) form is libm-bound and under/overflows at document length;
  the portable spelling is again the 1-power mean: (1/n) * sum_i
  r(h(w_i)), r = smoothed target/source bucket-probability ratio. Same
  preference direction (target-like tokens push the score up), exact
  cross-engine.

Target pool convention: ``doc_id % 97 = 0`` — the same held-out split
``decontaminate_against_benchmark`` treats as the benchmark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dsir import DSIR_BUCKETS
from ..operators.text import (
    duck_char_hash,
    duck_tokens,
    tokens_sql,
)
from ..sources.catalog import load_table
from .registry import query

DSIR_KEEP_DENOM = 5  # top 1/5 of each source stream


# ---------------------------------------------------------------------------
# unigram surprisal
# ---------------------------------------------------------------------------

_UNIGRAM_SQL = f"""
WITH base AS MATERIALIZED (
  SELECT doc_id, {duck_tokens('text')} AS toks FROM documents
), tk AS MATERIALIZED (
  SELECT doc_id, ti AS pos, toks[ti] AS tok
  FROM base, unnest(range(1, len(toks) + 1)) AS r(ti)
), vocab AS MATERIALIZED (
  SELECT tok, COUNT(*) AS c FROM tk GROUP BY tok
), n AS (
  SELECT COUNT(*) AS n_total FROM tk
), j AS (
  SELECT t.doc_id, t.pos,
         CAST(n.n_total AS DOUBLE) / CAST(v.c AS DOUBLE) AS val,
         v.c AS c
  FROM tk t JOIN vocab v USING (tok) CROSS JOIN n
), g AS (
  SELECT doc_id, COUNT(*) AS n_tokens,
         list(val ORDER BY pos) AS vals,
         MIN(c) AS min_tok_count
  FROM j GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       list_reduce(list_prepend(CAST(0 AS DOUBLE), vals),
                   (acc, x) -> acc + x) / CAST(n_tokens AS DOUBLE)
         AS mean_inv_p,
       min_tok_count
FROM g
"""


@query(
    "unigram_surprisal_scores",
    oracle=_UNIGRAM_SQL,
    doc=(
        "Perplexity-style quality score from the corpus's own MLE "
        "unigram model: per doc, the mean of 1/p(token) (order-pinned "
        "double fold -> bit-exact), plus the rarest-token count. High "
        "scores = rare-token-heavy outlier text, the tail a CCNet-style "
        "filter drops. Spark shape: one explode, one token-keyed "
        "aggregate for the model, one token-keyed join back, one doc "
        "aggregate. The token join is the classic skew join (stopwords "
        "are hot keys) — AQE skew-join splits them; the model table "
        "itself stays distributed (never collected)."
    ),
)
def unigram_surprisal_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select(
        "doc_id", F.expr(tokens_sql("text")).alias("toks")
    ).select("doc_id", F.posexplode("toks").alias("pos", "tok"))
    vocab = tk.groupBy("tok").agg(F.count("*").alias("c"))
    n_total = tk.agg(F.count("*").alias("n_total"))
    j = (
        tk.join(vocab, "tok")
        .crossJoin(F.broadcast(n_total))
        .select(
            "doc_id",
            "pos",
            (
                F.col("n_total").cast("double") / F.col("c").cast("double")
            ).alias("val"),
            "c",
        )
    )
    g = j.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sort_array(F.collect_list(F.struct("pos", "val"))).alias("pairs"),
        F.min("c").alias("min_tok_count"),
    )
    return g.select(
        "doc_id",
        "n_tokens",
        (
            F.expr(
                "aggregate(transform(pairs, p -> p.val), "
                "CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
            )
            / F.col("n_tokens").cast("double")
        ).alias("mean_inv_p"),
        "min_tok_count",
    )


# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------

_B = DSIR_BUCKETS

_DSIR_CTES = f"""
base AS MATERIALIZED (
  SELECT doc_id, source, doc_id % 97 = 0 AS is_target,
         {duck_tokens('text')} AS toks
  FROM documents
), tk AS MATERIALIZED (
  SELECT doc_id, source, is_target, ti AS pos,
         {duck_char_hash('toks[ti]')} % {_B} AS h
  FROM base, unnest(range(1, len(toks) + 1)) AS r(ti)
), bc AS MATERIALIZED (
  SELECT h,
         SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS ct,
         SUM(CASE WHEN is_target THEN 0 ELSE 1 END) AS cs
  FROM tk GROUP BY h
), tot AS (
  SELECT CAST(SUM(ct) AS BIGINT) AS nt, CAST(SUM(cs) AS BIGINT) AS ns FROM bc
), r AS (
  SELECT bc.h,
         (CAST(bc.ct + 1 AS DOUBLE) / CAST(bc.cs + 1 AS DOUBLE))
         * (CAST(tot.ns + {_B} AS DOUBLE) / CAST(tot.nt + {_B} AS DOUBLE))
           AS ratio
  FROM bc CROSS JOIN tot
), j AS (
  SELECT t.doc_id, t.source, t.pos, r.ratio
  FROM tk t JOIN r USING (h) WHERE NOT t.is_target
), w AS (
  SELECT doc_id, source, COUNT(*) AS n_tokens,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                  list(ratio ORDER BY pos)),
                     (acc, x) -> acc + x) / CAST(COUNT(*) AS DOUBLE)
           AS mean_lr
  FROM j GROUP BY doc_id, source
)
"""


@query(
    "dsir_importance_weights",
    oracle=f"WITH {_DSIR_CTES} SELECT doc_id, source, n_tokens, mean_lr FROM w",
    doc=(
        "DSIR importance weights: tokens hash into 4096 buckets "
        "(portable polynomial hash); bucket counts under the target "
        "(benchmark, doc_id % 97 = 0) and source pools give a smoothed "
        "probability ratio per bucket; each raw-corpus doc scores the "
        "order-pinned mean ratio over its tokens. The model is ONE "
        "4096-row table (broadcastable at any corpus size — that is the "
        "point of hashed features); the corpus is touched by one "
        "explode, one bucket join against the broadcast model, one doc "
        "aggregate. Libm-free power-mean spelling -> exact oracle."
    ),
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dsir_weights(spark, sf_dir)


def _dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dsir import bucket_counts, ratio_table, score_docs, token_buckets

    docs = load_table(spark, sf_dir, "documents")
    tk = token_buckets(docs)
    return score_docs(tk, ratio_table(bucket_counts(tk)))


@query(
    "dsir_select_topfrac",
    oracle=(
        f"WITH {_DSIR_CTES}, ranked AS ("
        "SELECT doc_id, source, mean_lr, "
        "row_number() OVER (PARTITION BY source "
        "ORDER BY mean_lr DESC, doc_id) AS rk, "
        "COUNT(*) OVER (PARTITION BY source) AS n_src FROM w) "
        f"SELECT doc_id, source, mean_lr, rk FROM ranked "
        f"WHERE rk <= (n_src + {DSIR_KEEP_DENOM - 1}) // {DSIR_KEEP_DENOM}"
    ),
    doc=(
        "The DSIR selection step, deterministic variant: per source "
        "stream keep the top 1/5 of documents by importance weight "
        "(ties toward the smaller doc_id; the paper's Gumbel-noise "
        "sampling is a seeded perturbation of exactly this ranking). "
        "keep_n uses integer ceiling arithmetic ((n + 4) DIV 5) — no "
        "float ceil at the boundary. One window over the weights table."
    ),
)
def dsir_select_topfrac(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = _dsir_weights(spark, sf_dir)
    win = Window.partitionBy("source").orderBy(
        F.col("mean_lr").desc(), F.col("doc_id")
    )
    ranked = w.select(
        "doc_id",
        "source",
        "mean_lr",
        F.row_number().over(win).alias("rk"),
        F.count("*").over(Window.partitionBy("source")).alias("n_src"),
    )
    keep_n = F.expr(f"(n_src + {DSIR_KEEP_DENOM - 1}) DIV {DSIR_KEEP_DENOM}")
    return ranked.filter(F.col("rk") <= keep_n).select(
        "doc_id", "source", "mean_lr", "rk"
    )


# ---------------------------------------------------------------------------
# DoReMi-style domain weights
# ---------------------------------------------------------------------------

_DOREMI_SQL = f"""
WITH u AS ({_UNIGRAM_SQL}), su AS (
  SELECT d.source, u.doc_id, u.mean_inv_p
  FROM u JOIN documents d USING (doc_id)
), per_src AS (
  SELECT source, COUNT(*) AS n_docs,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                  list(mean_inv_p ORDER BY doc_id)),
                     (acc, x) -> acc + x) / CAST(COUNT(*) AS DOUBLE)
           AS source_mean
  FROM su GROUP BY source
), gstat AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                  list(mean_inv_p ORDER BY doc_id)),
                     (acc, x) -> acc + x) / CAST(COUNT(*) AS DOUBLE)
           AS global_mean
  FROM su
), raw AS (
  SELECT p.source, p.n_docs, p.source_mean,
         (CAST(p.n_docs AS DOUBLE) / CAST(g.n_total AS DOUBLE))
         * (p.source_mean / g.global_mean) AS w_raw
  FROM per_src p CROSS JOIN gstat g
), tot AS (
  SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                  list(w_raw ORDER BY source)),
                     (acc, x) -> acc + x) AS z
  FROM raw
)
SELECT r.source, r.n_docs, r.source_mean, r.w_raw / t.z AS weight
FROM raw r CROSS JOIN tot t
"""


@query(
    "doremi_domain_weights",
    oracle=_DOREMI_SQL,
    doc=(
        "DoReMi-style domain reweighting with a static proxy: each "
        "source's sampling weight is its document share scaled by its "
        "mean unigram-surprisal excess over the corpus mean, then "
        "normalized. (The published method trains a proxy model and "
        "exponentiates excess loss; this deterministic rational variant "
        "— ratios instead of exp(), order-pinned folds — keeps the same "
        "preference direction, upweighting surprising domains, with an "
        "exact cross-engine oracle.) The per-source state is one row "
        "per domain: trivially broadcastable at any corpus size."
    ),
)
def doremi_domain_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    u = unigram_surprisal_scores(spark, sf_dir)
    su = u.join(docs.select("doc_id", "source"), "doc_id").select(
        "source", "doc_id", "mean_inv_p"
    )
    per_src = su.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sort_array(F.collect_list(F.struct("doc_id", "mean_inv_p"))).alias(
            "pm"
        ),
    ).select(
        "source",
        "n_docs",
        (
            F.expr(
                "aggregate(transform(pm, p -> p.mean_inv_p), "
                "CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
            )
            / F.col("n_docs").cast("double")
        ).alias("source_mean"),
    )
    glob = su.agg(
        F.count("*").cast("bigint").alias("n_total"),
        F.sort_array(F.collect_list(F.struct("doc_id", "mean_inv_p"))).alias(
            "pm"
        ),
    ).select(
        "n_total",
        (
            F.expr(
                "aggregate(transform(pm, p -> p.mean_inv_p), "
                "CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
            )
            / F.col("n_total").cast("double")
        ).alias("global_mean"),
    )
    raw = per_src.crossJoin(F.broadcast(glob)).select(
        "source",
        "n_docs",
        "source_mean",
        (
            (F.col("n_docs").cast("double") / F.col("n_total").cast("double"))
            * (F.col("source_mean") / F.col("global_mean"))
        ).alias("w_raw"),
    )
    tot = raw.agg(
        F.sort_array(F.collect_list(F.struct("source", "w_raw"))).alias("sw")
    ).select(
        F.expr(
            "aggregate(transform(sw, p -> p.w_raw), "
            "CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
        ).alias("z")
    )
    return raw.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "source_mean",
        (F.col("w_raw") / F.col("z")).alias("weight"),
    )


# ---------------------------------------------------------------------------
# Curriculum mixing schedule (anneal natural -> DoReMi weights)
# ---------------------------------------------------------------------------

CURRICULUM_EPOCHS = 4


@query(
    "curriculum_mix_schedule",
    oracle=f"""
WITH dw AS ({_DOREMI_SQL}), tot AS (
  SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total FROM dw
)
SELECT e.epoch, dw.source,
       (CAST(dw.n_docs AS DOUBLE) / CAST(tot.n_total AS DOUBLE))
       + (CAST(e.epoch AS DOUBLE) / {CURRICULUM_EPOCHS})
         * (dw.weight
            - CAST(dw.n_docs AS DOUBLE) / CAST(tot.n_total AS DOUBLE))
         AS mix_weight
FROM dw CROSS JOIN tot
CROSS JOIN (SELECT CAST(u.e AS INTEGER) AS epoch
            FROM unnest(range(0, {CURRICULUM_EPOCHS + 1})) AS u(e)) e
""",
    doc=(
        "Curriculum data-mixing schedule: per training epoch, linearly "
        "anneal each source's sampling weight from its natural share "
        "(epoch 0) to its DoReMi weight (final epoch) — the two-phase "
        "pretraining recipe (start on the natural distribution, finish "
        "on the quality-reweighted mix) as a deterministic table. "
        "Output is epochs x sources rows: driver-side tiny at any "
        "corpus size; all the heavy lifting is inside "
        "doremi_domain_weights' one-pass aggregates."
    ),
)
def curriculum_mix_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    dw = doremi_domain_weights(spark, sf_dir)
    tot = dw.agg(F.sum("n_docs").cast("bigint").alias("n_total"))
    epochs = spark.range(CURRICULUM_EPOCHS + 1).select(
        F.col("id").cast("int").alias("epoch")
    )
    nat = F.col("n_docs").cast("double") / F.col("n_total").cast("double")
    return (
        dw.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(epochs))
        .select(
            "epoch",
            "source",
            (
                nat
                + (F.col("epoch").cast("double") / F.lit(CURRICULUM_EPOCHS))
                * (F.col("weight") - nat)
            ).alias("mix_weight"),
        )
    )


# ---------------------------------------------------------------------------
# Trained quality classifier (fasttext-like, rational link)
# ---------------------------------------------------------------------------

QC_ITERS = 3
QC_LR = 0.5


def _duck_qc_iteration(i: int) -> str:
    """One GD step: z from w{i}, rational-link error, order-pinned
    gradient, weight update."""
    return f"""
z{i} AS MATERIALIZED (
  SELECT v.doc_id, ANY_VALUE(v.y) AS y,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                  list(w.w * v.x ORDER BY v.h)),
                     (acc, q) -> acc + q) AS z
  FROM xv v JOIN w{i} w USING (h) GROUP BY v.doc_id
), e{i} AS MATERIALIZED (
  SELECT z.doc_id,
         (z.y - (0.5 + z.z / (2 * (1 + abs(z.z)))))
         * (CASE WHEN z.y = 1 THEN cw.wpos ELSE cw.wneg END) AS err
  FROM z{i} z CROSS JOIN cw
), g{i} AS MATERIALIZED (
  SELECT v.h,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                  list(v.x * e.err ORDER BY v.doc_id)),
                     (acc, q) -> acc + q) AS g
  FROM xv v JOIN e{i} e USING (doc_id) GROUP BY v.h
), w{i + 1} AS MATERIALIZED (
  SELECT w.h, w.w + {QC_LR} * g.g AS w FROM w{i} w JOIN g{i} g USING (h)
)"""


_QC_SQL = (
    f"""
WITH qbase AS MATERIALIZED (
  SELECT doc_id, source,
         CAST(CASE WHEN doc_id % 97 = 0 THEN 1 ELSE 0 END AS DOUBLE) AS y,
         {duck_tokens('text')} AS toks
  FROM documents
), qtk AS MATERIALIZED (
  SELECT doc_id, source, y,
         {duck_char_hash('toks[qti]')} % {DSIR_BUCKETS} AS h
  FROM qbase, unnest(range(1, len(toks) + 1)) AS qr(qti)
), xdh AS MATERIALIZED (
  SELECT doc_id, ANY_VALUE(y) AS y, h, COUNT(*) AS cnt
  FROM qtk GROUP BY doc_id, h
), nt AS MATERIALIZED (
  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens FROM xdh GROUP BY doc_id
), xv AS MATERIALIZED (
  SELECT x.doc_id, x.y, x.h,
         CAST(x.cnt AS DOUBLE) / CAST(n.n_tokens AS DOUBLE) AS x
  FROM xdh x JOIN nt n USING (doc_id)
), w0 AS MATERIALIZED (
  SELECT DISTINCT h, CAST(0 AS DOUBLE) AS w FROM xv
), cw AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS DOUBLE) / (2 * CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS DOUBLE)) AS wpos,
         CAST(COUNT(*) AS DOUBLE) / (2 * CAST(SUM(CASE WHEN y = 1 THEN 0 ELSE 1 END) AS DOUBLE)) AS wneg
  FROM nt n JOIN (SELECT doc_id, ANY_VALUE(y) AS y FROM xdh GROUP BY doc_id) yy USING (doc_id)
),"""
    + ",".join(_duck_qc_iteration(i) for i in range(QC_ITERS))
    + f""",
zf AS (
  SELECT v.doc_id,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                  list(w.w * v.x ORDER BY v.h)),
                     (acc, q) -> acc + q) AS score
  FROM xv v JOIN w{QC_ITERS} w USING (h) GROUP BY v.doc_id
)
SELECT z.doc_id, d.source, z.score,
       0.5 + z.score / (2 * (1 + abs(z.score))) AS prob
FROM zf z JOIN documents d USING (doc_id)
"""
)


def _qc_prob(z):
    return F.lit(0.5) + z / (F.lit(2.0) * (F.lit(1.0) + F.abs(z)))


def _qc_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dsir import token_buckets

    docs = load_table(spark, sf_dir, "documents")
    tk = token_buckets(docs).select(
        "doc_id",
        F.col("is_target").cast("double").alias("y"),
        "h",
    )
    xdh = tk.groupBy("doc_id", "h").agg(
        F.first("y").alias("y"), F.count("*").alias("cnt")
    )
    nt = xdh.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_tokens")
    )
    return xdh.join(nt, "doc_id").select(
        "doc_id",
        "y",
        "h",
        (F.col("cnt").cast("double") / F.col("n_tokens").cast("double")).alias("x"),
    )


def _qc_doc_scores(xv: DataFrame, w: DataFrame) -> DataFrame:
    """(doc_id, y, z): order-pinned dot product against the weight table."""
    return (
        xv.join(F.broadcast(w), "h")
        .groupBy("doc_id")
        .agg(
            F.first("y").alias("y"),
            F.sort_array(
                F.collect_list(F.struct("h", (F.col("w") * F.col("x")).alias("q")))
            ).alias("hq"),
        )
        .select(
            "doc_id",
            "y",
            F.expr(
                "aggregate(transform(hq, p -> p.q), CAST(0 AS DOUBLE), "
                "(acc, q) -> acc + q)"
            ).alias("z"),
        )
    )


@query(
    "quality_classifier_scores",
    oracle=_QC_SQL,
    doc=(
        "Model-based quality filtering, trained IN-ENGINE: a "
        "logistic-style classifier over the 4096 hashed-unigram "
        "features (benchmark pool as positives — the fasttext-classifier "
        "stage of the GPT-3/LLaMA pipelines), trained by "
        f"{QC_ITERS} fixed full-batch gradient steps with a RATIONAL "
        "link p = 0.5 + z/(2(1+|z|)) instead of exp-sigmoid, so every "
        "double is cross-engine exact (libm-free, like the BPE/Lloyd "
        "trainers; oracle = chained MATERIALIZED CTEs). Per step the "
        "corpus sees one broadcast join against the 4096-row weight "
        "table, one doc aggregate, one bucket aggregate; the weight "
        "table is the only driver-side state (bounded, like the BPE "
        "merge table). Folds are order-pinned (h within doc, doc_id "
        "within bucket) so the result is partitioning-independent."
    ),
)
def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    xv = _qc_features(spark, sf_dir).localCheckpoint(eager=True)
    w = xv.select("h").distinct().withColumn("w", F.lit(0.0))
    # balanced class weights (positives are ~1% of docs: unweighted GD
    # just learns the base rate) — two exact integer counts, one
    # correctly-rounded division each, identical in both engines
    ydoc = xv.groupBy("doc_id").agg(F.first("y").alias("y"))
    n_docs = ydoc.count()
    n_pos = ydoc.filter(F.col("y") == 1.0).count()
    wpos = float(n_docs) / (2.0 * float(n_pos))
    wneg = float(n_docs) / (2.0 * float(n_docs - n_pos))
    for _ in range(QC_ITERS):
        z = _qc_doc_scores(xv, w)
        e = z.select(
            "doc_id",
            (
                (F.col("y") - _qc_prob(F.col("z")))
                * F.when(F.col("y") == 1.0, F.lit(wpos)).otherwise(F.lit(wneg))
            ).alias("err"),
        )
        g = (
            xv.join(e, "doc_id")
            .groupBy("h")
            .agg(
                F.sort_array(
                    F.collect_list(
                        F.struct("doc_id", (F.col("x") * F.col("err")).alias("q"))
                    )
                ).alias("dq")
            )
            .select(
                "h",
                F.expr(
                    "aggregate(transform(dq, p -> p.q), CAST(0 AS DOUBLE), "
                    "(acc, q) -> acc + q)"
                ).alias("g"),
            )
        )
        w_new = w.join(g, "h").select(
            "h", (F.col("w") + F.lit(QC_LR) * F.col("g")).alias("w")
        )
        # bounded driver round-trip (<= DSIR_BUCKETS rows): truncates the
        # per-iteration lineage, the BPE-merge-table pattern
        rows = [(r["h"], r["w"]) for r in w_new.collect()]
        w = spark.createDataFrame(rows, "h BIGINT, w DOUBLE")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    zf = _qc_doc_scores(xv, w).select("doc_id", F.col("z").alias("score"))
    return zf.join(docs, "doc_id").select(
        "doc_id",
        "source",
        "score",
        _qc_prob(F.col("score")).alias("prob"),
    )
