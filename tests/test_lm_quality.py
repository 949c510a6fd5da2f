"""Semantics of the LM-based curation scores (beyond the exact oracle):
bounds, pool exclusion, and the selection fraction."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_data_etl_gcs_spark.queries.lm_quality import (
    _dsir_weights,
    dsir_select_topfrac,
    unigram_surprisal_scores,
)
from event_data_etl_gcs_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_unigram_mean_inv_p_lower_bound(spark):
    """Every term N/c >= 1 (c <= N), so the mean is >= 1; equality only
    if every token of the doc is the whole corpus."""
    out = unigram_surprisal_scores(spark, SF)
    assert out.filter(F.col("mean_inv_p") < 1.0).count() == 0
    # rare-token-heavy docs must score above common-token docs on average
    assert out.count() > 0


def test_unigram_single_token_doc_identity(spark):
    """For a doc, mean_inv_p >= N / (n * harmonic-bound) sanity: spot-check
    one doc against a direct python recompute."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    toks = {r["doc_id"]: r["text"].split() for r in docs}
    from collections import Counter

    counts = Counter(t for ts in toks.values() for t in ts)
    n_total = sum(counts.values())
    out = {r["doc_id"]: r for r in unigram_surprisal_scores(spark, SF).collect()}
    did = next(d for d, ts in toks.items() if ts)
    ts = toks[did]
    vals = [n_total / counts[t] for t in ts]
    acc = 0.0
    for v in vals:  # same left-to-right fold
        acc += v
    assert abs(out[did]["mean_inv_p"] - acc / len(ts)) < 1e-9
    assert out[did]["n_tokens"] == len(ts)
    assert out[did]["min_tok_count"] == min(counts[t] for t in ts)


def test_dsir_excludes_target_pool(spark):
    w = _dsir_weights(spark, SF)
    assert w.filter(F.col("doc_id") % 97 == 0).count() == 0


def test_dsir_topfrac_counts(spark):
    w = _dsir_weights(spark, SF)
    per_src = {r["source"]: r["n"] for r in
               w.groupBy("source").agg(F.count("*").alias("n")).collect()}
    sel = dsir_select_topfrac(spark, SF)
    got = {r["source"]: r["n"] for r in
           sel.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for src, n in per_src.items():
        assert got.get(src, 0) == (n + 4) // 5


def test_dsir_weights_positive(spark):
    w = _dsir_weights(spark, SF)
    assert w.filter(F.col("mean_lr") <= 0.0).count() == 0
