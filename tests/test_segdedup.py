"""Segment-level (CCNet line-dedup analog) semantics pins, on a corpus
built to exercise cross-document boilerplate: the fixture parquet has no
repeated 20-token windows, so these tests construct one."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from event_data_etl_gcs_spark.queries.segdedup import (
    SEG_W,
    _exploded_segments,
    _winners,
    segment_dedup_reconstruct,
)
from event_data_etl_gcs_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _words(tag: str, n: int) -> str:
    return " ".join(f"{tag}{i}" for i in range(n))


@pytest.fixture(scope="module")
def boiler(spark, tmp_path_factory):
    """Three docs sharing a boilerplate first segment; doc 3 is entirely
    made of doc 1's segments (the fully-duplicated-document case)."""
    header = _words("hdr", SEG_W)
    body1 = _words("a", SEG_W)
    body2 = _words("b", SEG_W)
    rows = [
        (1, header + " " + body1, "en", "s1", 0),
        (2, header + " " + body2, "en", "s1", 0),
        (3, header + " " + body1, "en", "s2", 0),
        (4, "", "en", "s2", 0),  # blank doc: spine must survive
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path_factory.mktemp("segboiler") / "documents.parquet")
    df.write.parquet(out)
    return out.rsplit("/documents.parquet", 1)[0]


def test_first_occurrence_wins(spark, boiler):
    docs = spark.read.parquet(boiler + "/documents.parquet")
    w = {r["seg"]: (r["doc_id"], r["seg_pos"]) for r in _winners(
        _exploded_segments(docs)
    ).collect()}
    header = _words("hdr", SEG_W)
    assert w[header] == (1, 0)  # doc 1 owns the boilerplate
    assert w[_words("b", SEG_W)] == (2, 1)


def test_reconstruct_strips_boilerplate(spark, boiler):
    rec = {
        r["doc_id"]: r
        for r in segment_dedup_reconstruct(spark, boiler).collect()
    }
    header = _words("hdr", SEG_W)
    body1 = _words("a", SEG_W)
    body2 = _words("b", SEG_W)
    assert rec[1]["text_dedup"] == header + " " + body1
    assert rec[2]["text_dedup"] == body2  # header deduped away
    assert rec[3]["text_dedup"] == "" and rec[3]["n_kept"] == 0
    assert rec[4]["n_segs"] == 0 and rec[4]["text_dedup"] == ""
    assert rec[2]["n_segs"] == 2 and rec[2]["n_kept"] == 1


def test_kept_tokens_conserved_on_fixture(spark):
    """Over the real fixture: segments partition the token stream, and
    the union of kept segments == the distinct segment set."""
    docs = load_table(spark, SF, "documents")
    segs = _exploded_segments(docs)
    n_distinct = segs.select("seg").distinct().count()
    kept = _winners(segs)
    assert kept.count() == n_distinct
    # winners are a subset of the exploded rows
    joined = kept.join(segs, ["doc_id", "seg_pos", "seg"]).count()
    assert joined == n_distinct
    # token conservation: sum of segment token counts == doc token counts
    t1 = segs.select(F.expr("size(split(seg, ' '))").alias("n")).agg(
        F.sum("n")
    ).collect()[0][0]
    t2 = docs.select(
        F.expr(
            "CASE WHEN length(trim(text)) = 0 THEN 0 "
            "ELSE size(split(trim(text), '\\\\s+')) END"
        ).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert t1 == t2
