"""Streaming exact substring dedup: frontier semantics pins vs the
batch rebuild (final-delivery bit-equality, monotone under-removal),
replay idempotence, and the Available-Now drain."""

from __future__ import annotations

import time as _time

from pyspark.sql import functions as F

from event_data_etl_gcs_spark.queries.substring_dedup import (
    substring_dedup_frame,
)
from event_data_etl_gcs_spark.sources.catalog import load_table
from event_data_etl_gcs_spark.streaming.substring import (
    read_streamed_clean,
    run_streaming_substring_dedup,
    substring_ingest_batch,
)

SF = "/root/testdata/sf0.001"


def _clean_map(df):
    return {
        r["doc_id"]: (r["n_hits"], r["n_removed"], r["text_clean"])
        for r in df.collect()
    }


def _split(docs, n_batches=3):
    n = docs.count()
    cut = [round(i * n / n_batches) for i in range(n_batches + 1)]
    return [
        docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        for lo, hi in zip(cut, cut[1:])
    ]


def test_final_delivery_equals_batch_and_earlier_never_over_removes(
    spark, tmp_path
):
    docs = load_table(spark, SF, "documents")
    batches = _split(docs)
    idx = str(tmp_path / "idx")
    for i, b in enumerate(batches):
        substring_ingest_batch(b, i, idx)

    streamed = _clean_map(read_streamed_clean(spark, idx))
    batch = _clean_map(substring_dedup_frame(docs))
    assert set(streamed) == set(batch)

    last_ids = {r["doc_id"] for r in batches[-1].select("doc_id").collect()}
    over_removed = 0
    final_mismatch = 0
    for did, (s_hits, s_rm, s_text) in streamed.items():
        b_hits, b_rm, b_text = batch[did]
        if did in last_ids:
            # the last delivery sees the whole corpus: bit-identical
            final_mismatch += (s_hits, s_rm, s_text) != (b_hits, b_rm, b_text)
        # every delivery: streamed removal is a SUBSET of batch removal
        over_removed += s_rm > b_rm
        # subset property on the text too: batch clean is derivable by
        # removing MORE tokens, so batch n_keep <= streamed n_keep
    assert final_mismatch == 0
    assert over_removed == 0
    # the frontier actually bites: some earlier doc is cleaned LESS than
    # batch (otherwise the pin above is vacuous on this corpus)
    assert any(
        streamed[d][1] < batch[d][1] for d in streamed if d not in last_ids
    )


def test_within_batch_duplication_cleans_both_copies(spark, tmp_path):
    shared = " ".join(f"s{i}" for i in range(8))
    b0 = spark.createDataFrame(
        [(1, "web", f"a0 a1 a2 {shared}"), (2, "web", f"{shared} b0 b1")],
        "doc_id long, source string, text string",
    )
    idx = str(tmp_path / "idx")
    substring_ingest_batch(b0, 0, idx)
    got = _clean_map(read_streamed_clean(spark, idx))
    assert got[1][1] == 8 and got[2][1] == 8


def test_frontier_semantics_cross_batch(spark, tmp_path):
    """A batch-1 doc duplicating a batch-0 span: batch-1's copy is cut,
    batch-0's already-emitted copy stays (documented frontier rule)."""
    shared = " ".join(f"s{i}" for i in range(8))
    idx = str(tmp_path / "idx")
    b0 = spark.createDataFrame(
        [(1, "web", f"a0 a1 {shared}")],
        "doc_id long, source string, text string",
    )
    b1 = spark.createDataFrame(
        [(2, "web", f"{shared} b0 b1")],
        "doc_id long, source string, text string",
    )
    substring_ingest_batch(b0, 0, idx)
    substring_ingest_batch(b1, 1, idx)
    got = _clean_map(read_streamed_clean(spark, idx))
    assert got[1][1] == 0  # emitted before the duplicate arrived
    assert got[2][1] == 8  # cleaned against everything seen


def test_replay_idempotent(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    b0, b1 = _split(docs, 2)
    idx = str(tmp_path / "idx")
    substring_ingest_batch(b0, 0, idx)
    substring_ingest_batch(b1, 1, idx)
    want = _clean_map(read_streamed_clean(spark, idx))
    # crash before checkpoint commit -> batch 1 replays
    substring_ingest_batch(b1, 1, idx)
    assert _clean_map(read_streamed_clean(spark, idx)) == want


def test_available_now_drain_matches_manual_batches(spark, tmp_path):
    docs = load_table(spark, SF, "documents").select(
        "doc_id", "source", "text"
    )
    docs_dir = str(tmp_path / "docs_stream")
    n = docs.count()
    for lo, hi in [(0, n // 2), (n // 2, n)]:
        docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.mode("append").parquet(docs_dir)
        _time.sleep(1.1)  # distinct mtimes -> deterministic file order

    idx_s = str(tmp_path / "idx_stream")
    run_streaming_substring_dedup(
        spark, docs_dir, idx_s, str(tmp_path / "ckpt")
    )
    idx_m = str(tmp_path / "idx_manual")
    for i, b in enumerate(_split(docs, 2)):
        substring_ingest_batch(b, i, idx_m)
    assert _clean_map(read_streamed_clean(spark, idx_s)) == _clean_map(
        read_streamed_clean(spark, idx_m)
    )
