"""Semantics of exact substring dedup (substring_dedup_frame): removed
set == union of maximal cross-document duplicate runs >= K tokens."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_data_etl_gcs_spark.queries.substring_dedup import (
    SUB_K,
    substring_dedup_frame,
)


def _toks(n, prefix):
    return [f"{prefix}{i}" for i in range(n)]


def _run(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    out = substring_dedup_frame(df)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_exact_k_run_removed_from_both_copies(spark):
    shared = " ".join(_toks(SUB_K, "s"))
    a_only = " ".join(_toks(5, "a"))
    b_only = " ".join(_toks(5, "b"))
    got = _run(
        spark,
        [
            (1, "web", f"{a_only} {shared}"),
            (2, "web", f"{shared} {b_only}"),
        ],
    )
    # exactly the shared K tokens are cut from BOTH documents
    assert got[1]["n_removed"] == SUB_K
    assert got[2]["n_removed"] == SUB_K
    assert got[1]["text_clean"] == a_only
    assert got[2]["text_clean"] == b_only


def test_longer_run_removed_maximally(spark):
    """A shared run of K+3 tokens: all K+3 tokens go (the union of its
    K-subgrams covers the whole run), not just the first K."""
    shared = " ".join(_toks(SUB_K + 3, "s"))
    got = _run(
        spark,
        [
            (1, "web", f"{' '.join(_toks(4, 'a'))} {shared}"),
            (2, "web", f"{shared} {' '.join(_toks(4, 'b'))}"),
        ],
    )
    assert got[1]["n_removed"] == SUB_K + 3
    assert got[2]["n_removed"] == SUB_K + 3


def test_sub_threshold_overlap_untouched(spark):
    shared = " ".join(_toks(SUB_K - 1, "s"))  # one token short
    got = _run(
        spark,
        [
            (1, "web", f"{' '.join(_toks(4, 'a'))} {shared}"),
            (2, "web", f"{shared} {' '.join(_toks(4, 'b'))}"),
        ],
    )
    assert got[1]["n_removed"] == 0
    assert got[2]["n_removed"] == 0
    assert got[1]["n_hits"] == 0


def test_within_doc_repetition_untouched(spark):
    """The same K-gram twice INSIDE one document is not cross-document
    duplication — repetition is a quality-gate concern, not dedup's."""
    block = " ".join(_toks(SUB_K, "r"))
    got = _run(
        spark,
        [
            (1, "web", f"{block} mid {block}"),
            (2, "web", " ".join(_toks(10, "z"))),
        ],
    )
    assert got[1]["n_removed"] == 0
    assert got[2]["n_removed"] == 0


def test_short_docs_pass_through(spark):
    got = _run(
        spark,
        [(1, "web", "just three tokens"), (2, "web", "just three tokens")],
    )
    # < K tokens: no grams, no hits, text survives even though the docs
    # are exact duplicates (that is exact-doc dedup's job)
    assert got[1]["n_removed"] == 0
    assert got[1]["text_clean"] == "just three tokens"


def test_three_way_duplicate_all_copies_cut(spark):
    shared = " ".join(_toks(SUB_K, "s"))
    got = _run(
        spark,
        [
            (1, "web", f"{' '.join(_toks(3, 'a'))} {shared}"),
            (2, "web", f"{shared} {' '.join(_toks(3, 'b'))}"),
            (3, "web", f"{' '.join(_toks(2, 'c'))} {shared} tailc0"),
        ],
    )
    assert all(got[d]["n_removed"] == SUB_K for d in (1, 2, 3))


def test_keep_first_retains_canonical_copy(spark):
    from event_data_etl_gcs_spark.queries.substring_dedup import (
        substring_dedup_keep_first_frame,
    )

    shared = " ".join(_toks(SUB_K, "s"))
    a_only = " ".join(_toks(5, "a"))
    b_only = " ".join(_toks(5, "b"))
    df = spark.createDataFrame(
        [
            (1, "web", f"{a_only} {shared}"),
            (2, "web", f"{shared} {b_only}"),
        ],
        "doc_id long, source string, text string",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in substring_dedup_keep_first_frame(df).collect()
    }
    # the first carrier (doc 1) keeps the span; doc 2 loses it
    assert got[1]["n_removed"] == 0
    assert got[1]["text_clean"] == f"{a_only} {shared}"
    assert got[2]["n_removed"] == SUB_K
    assert got[2]["text_clean"] == b_only


def test_keep_first_removes_subset_of_symmetric(spark):
    """Keep-first hits exclude the first carrier, so per-doc removal is
    always <= the symmetric policy's (and strictly less somewhere)."""
    from event_data_etl_gcs_spark.queries.substring_dedup import (
        substring_dedup_keep_first_frame,
    )
    from event_data_etl_gcs_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    sym = {
        r["doc_id"]: r["n_removed"]
        for r in substring_dedup_frame(docs).collect()
    }
    kf = {
        r["doc_id"]: r["n_removed"]
        for r in substring_dedup_keep_first_frame(docs).collect()
    }
    assert set(sym) == set(kf)
    assert all(kf[d] <= sym[d] for d in sym)
    assert any(kf[d] < sym[d] for d in sym)


def test_span_inventory_consistent_with_rebuild(spark):
    """Internal consistency: per document, the maximal-run inventory's
    total covered length equals exactly the rebuild's n_removed, and
    every run is >= K tokens (a duplicated K-gram covers K positions)."""
    from event_data_etl_gcs_spark.queries import get_query

    sf = "/root/testdata/sf0.001"
    inv = get_query("duplicate_span_inventory").fn(spark, sf).toPandas()
    reb = get_query("substring_dedup_rebuild").fn(spark, sf).toPandas()
    assert (inv["run_len"] >= SUB_K).all()
    got = inv.groupby("doc_id")["run_len"].sum().to_dict()
    want = {
        r.doc_id: r.n_removed
        for r in reb.itertuples()
        if r.n_removed > 0
    }
    assert got == want


def test_dup_gram_reduction_is_partial_not_distinct(spark):
    """The duplicated-gram reduction must stay a partial aggregate
    (min/max), not expand to a two-shuffle count-distinct."""
    df = spark.createDataFrame(
        [(1, "web", " ".join(_toks(SUB_K, "s")))],
        "doc_id long, source string, text string",
    )
    plan = (
        substring_dedup_frame(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "count(distinct" not in plan.lower(), plan
