"""training_corpus_v4: the containment stage spliced between exact
dedup and DSIR (VERDICT r7 #3). Oracle exactness is covered by
test_oracle_queries; these tests pin the stage semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

SF01 = "/root/testdata/sf0.01"


def test_v4_containment_stage_engages_and_matches_keep_policy(spark):
    """At the driver gate scale the containment stage drops at least one
    doc-within-doc duplicate that every v3 stage kept, and the dropped
    set is exactly the keep-the-container losers of the v3 uniq corpus."""
    from event_data_etl_gcs_spark.operators.dedup import containment_pairs
    from event_data_etl_gcs_spark.operators.text import shingle_hash_set_sql
    from event_data_etl_gcs_spark.queries.corpus_v3 import (
        _v3_unique_docs,
        _v4_unique_docs,
    )

    v3 = _v3_unique_docs(spark, SF01).localCheckpoint(eager=True)
    v4_ids = {r["doc_id"] for r in _v4_unique_docs(spark, SF01).collect()}
    v3_ids = {r["doc_id"] for r in v3.collect()}
    dropped = v3_ids - v4_ids
    assert v4_ids <= v3_ids
    assert dropped, "containment stage must engage at sf0.01"

    # independent recomputation of the keep-the-container losers
    sized = {
        r["doc_id"]: r["n"]
        for r in v3.select(
            "doc_id", F.size(F.expr(shingle_hash_set_sql("text"))).alias("n")
        ).collect()
    }
    pairs = containment_pairs(v3, threshold_num=4, threshold_den=5).collect()
    losers = {
        p["id_a"]
        for p in pairs
        if sized[p["id_b"]] > sized[p["id_a"]]
        or (sized[p["id_b"]] == sized[p["id_a"]] and p["id_b"] < p["id_a"])
    }
    assert dropped == losers


def test_v4_subset_of_v3_when_no_containment(spark):
    """At sf0.001 the fixture has no containment pairs among v3's uniq
    docs — v4 must then equal v3 exactly (the stage is a clean no-op)."""
    from event_data_etl_gcs_spark.queries.corpus_v3 import (
        training_corpus_v3_select,
        training_corpus_v4_select,
    )

    sf = "/root/testdata/sf0.001"
    a = sorted(tuple(r) for r in training_corpus_v3_select(spark, sf).collect())
    b = sorted(tuple(r) for r in training_corpus_v4_select(spark, sf).collect())
    assert a == b
