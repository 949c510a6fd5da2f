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
    # fan_out: the split IS the map work (per-doc text hash); measured
    # 2.14 s -> 0.44 s at sf0.1 under the column-forcing action.
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
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


SPLIT_A = 73_856_093
SPLIT_B = 19_349_663


def _split_of(expr: str) -> str:
    """Deterministic 80/10/10 split from an integer id — affine hash mod
    a prime then a decile cut; identical spelling in both engines."""
    h = f"((({expr} % {HASH_P}) * {SPLIT_A} + {SPLIT_B}) % {HASH_P})"
    return (
        f"CASE WHEN {h} % 10 < 8 THEN 'train' "
        f"WHEN {h} % 10 < 9 THEN 'valid' ELSE 'test' END"
    )


@query(
    "grouped_split_events",
    oracle=(
        f"WITH s AS (SELECT user_id, {_split_of('user_id')} AS split, "
        "event_id FROM events) "
        "SELECT split, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users, "
        "CAST(count(*) AS BIGINT) AS n_events FROM s GROUP BY split"
    ),
    doc=(
        "Leakage-aware train/valid/test split of the EVENT log: the split "
        "is a function of user_id, so every event of a user lands on one "
        "side — the group-level split that keeps a user's behavior out "
        "of both train and test (row-level splits leak). Map-only split "
        "assignment + one two-phase aggregate."
    ),
)
def grouped_split_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = ev.select(
        "user_id", F.expr(_split_of("user_id")).alias("split"), "event_id"
    )
    return s.groupBy("split").agg(
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.count("*").cast("long").alias("n_events"),
    )


from ..operators.dedup import duck_minhash_lsh_ctes as _duck_mh_ctes  # noqa: E402


@query(
    "cluster_aware_split",
    oracle=(
        f"WITH RECURSIVE {_duck_mh_ctes(threshold=0.5)}, "
        "edges AS ("
        "  SELECT id_a AS u, id_b AS v FROM mh_pairs "
        "  UNION SELECT id_b AS u, id_a AS v FROM mh_pairs"
        "), reach AS ("
        "  SELECT u AS node, u AS component FROM edges "
        "  UNION SELECT v AS node, v AS component FROM edges "
        "  UNION SELECT e.u AS node, r.component FROM edges e "
        "  JOIN reach r ON e.v = r.node"
        "), reps AS (SELECT node AS doc_id, MIN(component) AS rep "
        "FROM reach GROUP BY node) "
        "SELECT d.doc_id, COALESCE(r.rep, d.doc_id) AS cluster_rep, "
        f"{_split_of('COALESCE(r.rep, d.doc_id)')} AS split "
        "FROM documents d LEFT JOIN reps r ON d.doc_id = r.doc_id"
    ),
    doc=(
        "Dedup-cluster-aware split: near-duplicate documents (MinHash "
        "pairs -> connected components) share a cluster representative, "
        "and the split is a function of the REP — so no near-dup pair "
        "can straddle train and test (the contamination a row-level "
        "split allows). Singletons split by their own id. The oracle "
        "recomputes components with a recursive reachability CTE."
    ),
)
def cluster_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_lsh_pairs
    from ..operators.graph import dedup_clusters

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.5)
    clusters = dedup_clusters(pairs)
    joined = (
        docs.select("doc_id")
        .join(clusters, "doc_id", "left")
        .withColumn("cluster_rep", F.coalesce("cluster_rep", "doc_id"))
    )
    return joined.select(
        "doc_id", "cluster_rep", F.expr(_split_of("cluster_rep")).alias("split")
    )


def _corpus_v2_stats_oracle() -> str:
    """One monolithic DuckDB mirror of build_training_corpus_v2: gate ->
    exact dedup -> near-dedup over the deduped stage (prefix u_) ->
    pooled-benchmark decontamination -> cluster reps from near-dup pairs
    over the RAW corpus (no prefix; recursive reachability) -> split of
    rep -> (split, lang) rollup. Composed from the SAME validated stage
    fragments the individual stage oracles use."""
    from ..operators.text import duck_quality_select, duck_shingle_hash_set, duck_tokens
    from ..plans.training_corpus import (
        MAX_PUNCT_RATIO,
        MAX_STOPWORD_RATIO,
        MIN_TOKENS,
        NEAR_DUP_THRESHOLD,
    )

    qsel = duck_quality_select()
    return f"""
WITH RECURSIVE base AS (
  SELECT doc_id, lang, source, text, {duck_tokens('text')} AS toks FROM documents
), qscored AS (
  SELECT doc_id, lang, source, text,
         {qsel['n_tokens']} AS n_tokens,
         {qsel['stopword_ratio']} AS stopword_ratio,
         {qsel['punct_ratio']} AS punct_ratio
  FROM base
), gated AS (
  SELECT * FROM qscored
  WHERE n_tokens >= {MIN_TOKENS}
    AND stopword_ratio <= {MAX_STOPWORD_RATIO}
    AND punct_ratio <= {MAX_PUNCT_RATIO}
), uniq AS (
  SELECT g.* FROM gated g
  JOIN (SELECT text, MIN(doc_id) AS doc_id FROM gated GROUP BY text) k
    ON g.text = k.text AND g.doc_id = k.doc_id
), {_duck_mh_ctes(table='uniq', threshold=NEAR_DUP_THRESHOLD, prefix='u_')},
survivors AS (
  SELECT u.* FROM uniq u
  WHERE NOT EXISTS (SELECT 1 FROM u_mh_pairs p WHERE p.id_b = u.doc_id)
), allsh AS (
  SELECT doc_id, {duck_shingle_hash_set('text')} AS hs FROM documents
), bench_h AS (
  SELECT DISTINCT unnest(hs) AS h FROM allsh WHERE doc_id % 97 = 0
), surv_sh AS (
  SELECT s.doc_id, unnest(a.hs) AS h
  FROM survivors s JOIN allsh a ON a.doc_id = s.doc_id
), cont AS (
  SELECT doc_id FROM surv_sh JOIN bench_h USING (h)
  GROUP BY doc_id HAVING count(*) >= 4
), clean AS (
  SELECT * FROM survivors
  WHERE doc_id NOT IN (SELECT doc_id FROM cont)
), {_duck_mh_ctes(threshold=NEAR_DUP_THRESHOLD)},
edges AS (
  SELECT id_a AS u, id_b AS v FROM mh_pairs
  UNION SELECT id_b AS u, id_a AS v FROM mh_pairs
), reach AS (
  SELECT u AS node, u AS component FROM edges
  UNION SELECT v AS node, v AS component FROM edges
  UNION SELECT e.u AS node, r.component FROM edges e
  JOIN reach r ON e.v = r.node
), reps AS (
  SELECT node AS doc_id, MIN(component) AS rep FROM reach GROUP BY node
), labeled AS (
  SELECT c.lang, c.n_tokens,
         {_split_of('COALESCE(r.rep, c.doc_id)')} AS split
  FROM clean c LEFT JOIN reps r ON c.doc_id = r.doc_id
)
SELECT split, lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens
FROM labeled GROUP BY split, lang
"""


@query(
    "training_corpus_v2_stats",
    oracle=_corpus_v2_stats_oracle(),
    doc=(
        "Per-(split, lang) corpus composition after the full v2 "
        "pipeline: quality gate -> exact dedup -> near-dedup -> "
        "decontamination -> cluster-aware split. The mix table a "
        "training run starts from."
    ),
)
def training_corpus_v2_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.training_corpus import build_training_corpus_v2

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0).select("text")
    out = build_training_corpus_v2(docs, bench)
    return out.groupBy("split", "lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )
