"""training_corpus_v5: the Lee et al. 2021 ExactSubstr recipe — exact
substring dedup (keep-first) as the HEAD stage on the raw corpus, then
gate -> exact dedup -> DSIR. Oracle exactness is covered by
test_oracle_queries; these tests pin the composition semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_v5_head_engages_on_raw_corpus(spark):
    """The substring head does real work on the RAW corpus (docs
    touched, tokens removed) even though the same pass is a no-op after
    v3's segment stage — the two heads are genuinely orthogonal."""
    from event_data_etl_gcs_spark.queries.corpus_v3 import _v4_unique_docs
    from event_data_etl_gcs_spark.queries.substring_dedup import (
        substring_dedup_keep_first_frame,
    )
    from event_data_etl_gcs_spark.sources.catalog import load_table

    raw = substring_dedup_keep_first_frame(
        load_table(spark, SF001, "documents")
    )
    touched = raw.filter(F.col("n_removed") > 0).count()
    assert touched > 0, "substring head must engage on the raw corpus"

    after_v4 = substring_dedup_keep_first_frame(
        _v4_unique_docs(spark, SF001)
    )
    assert after_v4.filter(F.col("n_removed") > 0).count() == 0, (
        "after segment+exact+containment dedup the keep-first substring "
        "pass must be a no-op (the orthogonality claim in the v5 doc)"
    )


def test_v5_gate_sees_cleaned_text(spark):
    """Every v5 survivor's text is its substring-CLEANED text (not the
    raw text), and each survivor passes the gate on that cleaned text —
    recomputed independently from the standalone keep-first query."""
    from event_data_etl_gcs_spark.plans.training_corpus import (
        MIN_TOKENS,
        quality_gate,
    )
    from event_data_etl_gcs_spark.queries.corpus_v3 import _v5_unique_docs
    from event_data_etl_gcs_spark.queries.substring_dedup import (
        substring_dedup_keep_first,
    )

    uniq5 = _v5_unique_docs(spark, SF001).collect()
    cleaned = {
        r["doc_id"]: r["text_clean"]
        for r in substring_dedup_keep_first(spark, SF001).collect()
    }
    assert uniq5
    for r in uniq5:
        assert r["text"] == cleaned[r["doc_id"]]
        assert len(r["text"].split()) >= MIN_TOKENS

    # and the gate itself accepts every survivor's cleaned text
    df = spark.createDataFrame(
        [(r["doc_id"], r["source"], r["text"]) for r in uniq5],
        "doc_id long, source string, text string",
    )
    assert quality_gate(df).count() == len(uniq5)


def test_v5_exact_dedup_holds_on_cleaned_text(spark):
    """No two v5 survivors share the same cleaned text, and for any
    cleaned text carried by several gated docs the minimum doc_id is
    the survivor (keep-min policy applied AFTER cleaning — two docs
    with distinct raw text can collapse once their duplicated spans
    are cut)."""
    from collections import defaultdict

    from event_data_etl_gcs_spark.plans.training_corpus import quality_gate
    from event_data_etl_gcs_spark.queries.corpus_v3 import _v5_unique_docs
    from event_data_etl_gcs_spark.queries.substring_dedup import (
        substring_dedup_keep_first,
    )

    survivors = _v5_unique_docs(spark, SF01).collect()
    texts = [r["text"] for r in survivors]
    assert len(texts) == len(set(texts))

    gated = quality_gate(
        substring_dedup_keep_first(spark, SF01).select(
            "doc_id", "source", F.col("text_clean").alias("text")
        )
    ).collect()
    by_text = defaultdict(list)
    for r in gated:
        by_text[r["text"]].append(r["doc_id"])
    expect = {min(ids) for ids in by_text.values()}
    assert {r["doc_id"] for r in survivors} == expect


def test_v5_differs_from_v3_where_substring_granularity_matters(spark):
    """v5 and v3 select different corpora at sf0.1 scale inputs: the
    sub-segment head changes survivor texts (tokens cut mid-segment),
    so the pipelines are not interchangeable."""
    from event_data_etl_gcs_spark.queries.corpus_v3 import (
        _v3_unique_docs,
        _v5_unique_docs,
    )

    v3 = {(r["doc_id"], r["text"]) for r in _v3_unique_docs(spark, SF01).collect()}
    v5 = {(r["doc_id"], r["text"]) for r in _v5_unique_docs(spark, SF01).collect()}
    assert v3 != v5
