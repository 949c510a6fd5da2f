"""Physical-plan assertions for the round-9 bigram-LM family: the
100 TB claims in the docstrings must be visible in the executed plan."""

from __future__ import annotations

from event_data_etl_gcs_spark.queries import get_query

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = get_query(name).fn(spark, SF)
    df.count()  # let AQE finalize
    return df._jdf.queryExecution().executedPlan().toString()


def test_bigram_model_join_never_shuffles_corpus_rows(spark):
    """At test scale the bigram model tables (distinct-bigram-bound)
    must broadcast onto the corpus bigram rows — the corpus stream is
    never hash-repartitioned on (prev, cur) to meet the model."""
    plan = plan_of(spark, "bigram_surprisal_scores")
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin [prev#" in plan, plan


def test_bigram_builds_array_side_no_window(spark):
    """Bigrams come from transform(sequence(...)) over the token array
    — no lag() window, so no doc_id shuffle before the model joins."""
    plan = plan_of(spark, "bigram_surprisal_scores")
    assert "Window" not in plan.replace("WindowGroupLimit", ""), plan


def test_domain_cap_pushes_window_group_limit(spark):
    """rn <= K must reach WindowGroupLimit BEFORE the exchange: each
    map task retains a K-row heap per source instead of sorting its
    full partition."""
    plan = plan_of(spark, "domain_frequency_cap")
    pre, _, post = plan.partition("Exchange")
    assert "WindowGroupLimit" in post, plan  # map-side partial limit


def test_bigram_model_join_smj_branch_bit_identical(spark):
    """The at-scale branch (VERDICT r9 directive #3): when the model
    outgrows the broadcast threshold, the scoring join degrades to a
    shuffled sort-merge equi-join on (prev, cur) — forced here with
    autoBroadcastJoinThreshold=-1 — and the scores must be
    BIT-IDENTICAL to the broadcast branch (the per-doc mean is an
    order-pinned fold, so join strategy cannot change a single double).
    Skew on hot stopword contexts is AQE's skew-split at runtime; the
    strategy-independence pinned here is what makes that safe."""
    from event_data_etl_gcs_spark.queries.lm_bigram import bigram_scores
    from event_data_etl_gcs_spark.sources.catalog import load_table

    docs = load_table(spark, SF, "documents")
    want = sorted(tuple(r) for r in bigram_scores(docs).collect())
    conf = spark.conf
    old_bc = conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe_bc = conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        df = bigram_scores(docs)
        df.count()  # let AQE finalize
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin [prev#" in plan, plan
        assert "BroadcastHashJoin [prev#" not in plan, plan
        got = sorted(tuple(r) for r in df.collect())
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        if old_aqe_bc is None:
            conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        else:
            conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe_bc)
    assert got == want


def test_bigram_inner_equals_left_on_self_trained_corpus(spark):
    """Direct frame-equality pin (VERDICT r10 directive #5): on a
    SELF-TRAINED corpus every scored bigram is in the model, so the
    how='inner' fast path must equal the how='left' default
    row-for-row — pinning the fast path against future semantic
    drift in one assertion."""
    from pyspark.sql import functions as F

    from event_data_etl_gcs_spark.queries.lm_bigram import (
        bigram_rows,
        score_bigram_with_model,
    )
    from event_data_etl_gcs_spark.sources.catalog import load_table

    docs = load_table(spark, SF, "documents")
    tk, bg = bigram_rows(docs)
    bgc = bg.groupBy("prev", "cur").agg(F.count("*").alias("cvw"))
    ctx = bgc.groupBy("prev").agg(F.sum("cvw").cast("long").alias("cv"))
    tot = tk.agg(
        F.count("*").alias("n_total"), F.countDistinct("tok").alias("vsz")
    )
    inner = sorted(
        tuple(r)
        for r in score_bigram_with_model(bg, ctx, bgc, tot, how="inner").collect()
    )
    left = sorted(
        tuple(r)
        for r in score_bigram_with_model(bg, ctx, bgc, tot, how="left").collect()
    )
    assert inner == left


def test_phrase_search_broadcasts_the_phrase(spark):
    """The 1-row phrase table broadcasts into the postings join — the
    bigram occurrence stream stays in place."""
    plan = plan_of(spark, "phrase_search_positional")
    assert "BroadcastHashJoin [prev#" in plan, plan
    assert "SortMergeJoin" not in plan, plan
