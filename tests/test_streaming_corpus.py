"""Streaming training-corpus ingest == the batch pipeline.

The capstone contract: draining the documents backlog through the
incremental pipeline (gate -> exact-dedup-vs-index -> near-dedup-vs-
index -> decontamination), in doc_id-ordered batches, yields EXACTLY
the batch pipeline's corpus — however the backlog is split into files —
and a replayed increment leaves the state unchanged."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _stage_ordered_files(spark, docs, docs_dir: str, n_files: int) -> None:
    """Write the corpus as n_files parquet files covering ascending
    doc_id ranges, with ascending mtimes — the file source then feeds
    batches in id order (ids assigned at ingest: the natural shape)."""
    os.makedirs(docs_dir, exist_ok=True)
    ids = sorted(r[0] for r in docs.select("doc_id").collect())
    bounds = [ids[i * len(ids) // n_files] for i in range(n_files)] + [
        ids[-1] + 1
    ]
    for i in range(n_files):
        part = docs.filter(
            (F.col("doc_id") >= bounds[i]) & (F.col("doc_id") < bounds[i + 1])
        ).coalesce(1)
        tmpd = os.path.join(docs_dir, f"_w{i}")
        part.write.mode("overwrite").parquet(tmpd)
        src = glob.glob(os.path.join(tmpd, "part-*.parquet"))[0]
        dst = os.path.join(docs_dir, f"{i:05d}.parquet")
        shutil.move(src, dst)
        shutil.rmtree(tmpd)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))


def _batch_reference(docs, bench):
    from event_data_etl_gcs_spark.plans.training_corpus import (
        decontaminate,
        exact_dedup_keep_min,
        near_dedup_keep_min,
        quality_gate,
    )

    ref = decontaminate(
        near_dedup_keep_min(exact_dedup_keep_min(quality_gate(docs))), bench
    )
    return ref.select("doc_id", "text", "lang", "source", "n_tokens")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streaming_corpus_equals_batch_pipeline(spark, tmp_path):
    from event_data_etl_gcs_spark.streaming.corpus import (
        corpus_ingest_batch,
        read_streamed_corpus,
        run_streaming_corpus_ingest,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 37 == 0).select("text")
    want = _rows(_batch_reference(docs, bench))
    assert want, "reference corpus must be non-empty"
    # the reference must be non-trivial: every stage drops something
    n_all = docs.count()
    assert len(want) < n_all

    def run(n_files: int, tag: str) -> list:
        docs_dir = str(tmp_path / f"docs_{tag}")
        index_dir = str(tmp_path / f"idx_{tag}")
        _stage_ordered_files(spark, docs, docs_dir, n_files)
        run_streaming_corpus_ingest(
            spark,
            docs_dir,
            index_dir,
            str(tmp_path / f"ckpt_{tag}"),
            bench,
            max_files_per_trigger=1,
        )
        return _rows(read_streamed_corpus(spark, index_dir))

    got4 = run(4, "four")
    assert got4 == want

    # batch-split invariance: one big file -> same corpus
    got1 = run(1, "one")
    assert got1 == want

    # replay idempotence: re-run the LAST batch id over its own file's
    # rows against the committed state -> corpus unchanged
    idx = str(tmp_path / "idx_four")
    corpus = spark.read.parquet(os.path.join(idx, "corpus"))
    last_bid = int(corpus.agg(F.max("batch_id")).collect()[0][0])
    ids = sorted(r[0] for r in docs.select("doc_id").collect())
    bounds = [ids[i * len(ids) // 4] for i in range(4)] + [ids[-1] + 1]
    replay = docs.filter(
        (F.col("doc_id") >= bounds[last_bid])
        & (F.col("doc_id") < bounds[last_bid + 1])
    )
    corpus_ingest_batch(replay, last_bid, idx, bench)
    from event_data_etl_gcs_spark.streaming.corpus import read_streamed_corpus

    assert _rows(read_streamed_corpus(spark, idx)) == want


def test_index_mode_survivors_vs_all_chain_semantics(spark, tmp_path):
    """index_mode: 'all' reproduces batch keep-min on chains (a doc
    pairing only with a rejected doc still drops); 'survivors' keeps it
    (greedy online clustering) with flat per-delivery cost. The chain
    1~2, 2~3, 1!~3 (J=0.70/0.70/0.47 at threshold 0.5) separates them."""
    from event_data_etl_gcs_spark.streaming.corpus import (
        corpus_ingest_batch,
        read_streamed_corpus,
    )

    words = [f"tok{i}" for i in range(60)]
    t1, t2, t3 = (
        " ".join(words[0:30]),
        " ".join(words[5:35]),
        " ".join(words[10:40]),
    )
    rows = [(1, t1), (2, t2), (3, t3)]
    bench = spark.createDataFrame([], "text string")

    def run(mode: str) -> set:
        idx = str(tmp_path / f"chain_{mode}")
        for i, (doc_id, text) in enumerate(rows):
            b = spark.createDataFrame(
                [(doc_id, text, "en", "s")],
                "doc_id long, text string, lang string, source string",
            )
            corpus_ingest_batch(b, i, idx, bench, index_mode=mode)
        return {
            r["doc_id"] for r in read_streamed_corpus(spark, idx).collect()
        }

    assert run("all") == {1}          # == batch keep-min (2 and 3 drop)
    assert run("survivors") == {1, 3}  # 3 pairs only with rejected 2


def test_family_guard_warns_on_growing_family(spark, tmp_path):
    """VERDICT r7 #2: index_mode='all' pays per-delivery cost linear in
    the largest near-dup family; the guard must warn loudly when a doc
    pairs with more index members than the threshold, and stay silent
    for 'survivors' mode (flat cost) or an ample guard."""
    import pytest
    import warnings as _w

    from event_data_etl_gcs_spark.streaming.corpus import corpus_ingest_batch

    # one near-dup family: 40 shared tokens + a unique tail token each
    base = " ".join(f"tok{i}" for i in range(40))
    fam = [(i, f"{base} unique{i}", "en", "web") for i in range(9)]
    mk = lambda rows: spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    bench = spark.createDataFrame([("zz yy xx ww vv uu",)], "text string")

    idx = str(tmp_path / "guard_idx")
    # batch 0 indexes the first 8 members (all mode indexes losers too)
    with _w.catch_warnings():
        _w.simplefilter("error", UserWarning)  # ample guard -> silent
        corpus_ingest_batch(mk(fam[:8]), 0, idx, bench, family_guard=1000)
    # batch 1: the 9th member pairs with all 8 indexed members
    with pytest.warns(UserWarning, match="near-dup index members"):
        corpus_ingest_batch(mk(fam[8:]), 1, idx, bench, family_guard=3)

    # survivors mode: same shape, guard never fires (one rep per family)
    idx2 = str(tmp_path / "guard_idx_surv")
    with _w.catch_warnings():
        _w.simplefilter("error", UserWarning)
        corpus_ingest_batch(
            mk(fam[:8]), 0, idx2, bench, index_mode="survivors", family_guard=3
        )
        corpus_ingest_batch(
            mk(fam[8:]), 1, idx2, bench, index_mode="survivors", family_guard=3
        )
