"""Chaos pass over every batch_id-partitioned streaming state writer
(VERDICT r7 #6): simulate a crash BETWEEN any two state writes of the
final batch (the later writes' batch partitions never landed), then a
foreachBatch replay of that batch — the final state of EVERY directory
must equal a clean uninterrupted run.

Writers covered (write order matters — the crash point enumerates the
gaps): corpus (hashes, sigs, corpus), semdedup (members, decisions),
segdedup (clean, segments), sharding (assignments, totals),
containment (pairs, sets, prefix), near-dedup (pairs, signatures),
substring dedup (postings, clean), bigram LM (uni, bi),
LM-gated ingest (uni, bi, accepted).
The gen=N manifest writers (sketches, DSIR, kNN top-k) have their own
crash tests (test_advice_r4, test_streaming_incremental)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F


def _docs(spark, lo, hi):
    """Gate-passing documents with some cross-batch near-dup structure."""
    base = " ".join(f"w{i}" for i in range(30))
    rows = []
    for i in range(lo, hi):
        if i % 3 == 0:
            text = f"{base} uniq{i}"  # near-dup family member
        else:
            text = " ".join(f"t{i}w{j}" for j in range(25))
        rows.append((i, text, "en", "web"))
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def _vecs(spark, lo, hi):
    """Every batch both keeps (near-orthogonal axis vectors) and drops
    (one shared family direction) something, so every state dir gets a
    partition for every batch."""
    rows = []
    for i in range(lo, hi):
        if i % 3 == 0:
            v = [1.0, 1.0, 0.0, 0.0, 0.0, 0.01 * i]  # family direction
        else:
            v = [0.0] * 6
            v[(i * 7) % 5] = 1.0
            v[5] = 0.001 * i
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _corpus_writer(spark, root):
    from event_data_etl_gcs_spark.streaming.corpus import corpus_ingest_batch

    bench = spark.createDataFrame([("zz yy xx",)], "text string")

    def ingest(bdf, bid):
        corpus_ingest_batch(bdf, bid, root, bench)

    return ingest, ["hashes", "sigs", "corpus"], _docs


def _semdedup_writer(spark, root):
    from event_data_etl_gcs_spark.streaming.semdedup import (
        semdedup_ingest_batch,
    )

    def ingest(bdf, bid):
        semdedup_ingest_batch(bdf, bid, root, k=2)

    return ingest, ["members", "decisions"], _vecs


def _segdedup_writer(spark, root):
    from event_data_etl_gcs_spark.streaming.segdedup import (
        segdedup_ingest_batch,
    )

    def ingest(bdf, bid):
        segdedup_ingest_batch(bdf, bid, root)

    return ingest, ["clean", "segments"], _docs


def _sharding_writer(spark, root):
    from event_data_etl_gcs_spark.streaming.sharding import shard_ingest_batch

    def ingest(bdf, bid):
        shard_ingest_batch(bdf, bid, root)

    return ingest, ["assignments", "totals"], _docs


def _containment_writer(spark, root):
    from event_data_etl_gcs_spark.streaming.neardedup import (
        containment_check_batch,
    )

    def ingest(bdf, bid):
        containment_check_batch(
            bdf, os.path.join(root, "index"), os.path.join(root, "pairs"), bid
        )

    return ingest, ["pairs", "index/sets", "index/prefix"], _docs


def _neardedup_writer(spark, root):
    from event_data_etl_gcs_spark.streaming.neardedup import (
        check_batch_against_index,
    )

    def ingest(bdf, bid):
        check_batch_against_index(
            bdf, os.path.join(root, "sigs"), os.path.join(root, "pairs"), bid
        )

    return ingest, ["pairs", "sigs"], _docs


def _gram_writer(spark, root):
    from event_data_etl_gcs_spark.streaming.linalg import gram_maintain_batch

    def ingest(bdf, bid):
        gram_maintain_batch(bdf, bid, root)

    return ingest, ["gram"], _vecs


def _substring_writer(spark, root):
    from event_data_etl_gcs_spark.streaming.substring import (
        substring_ingest_batch,
    )

    def ingest(bdf, bid):
        substring_ingest_batch(bdf, bid, root)

    return ingest, ["postings", "clean"], _docs


def _lm_bigram_writer(spark, root):
    from event_data_etl_gcs_spark.streaming.lm_bigram import lm_ingest_batch

    def ingest(bdf, bid):
        lm_ingest_batch(bdf, bid, root)

    return ingest, ["uni", "bi"], _docs


def _lm_gated_writer(spark, root):
    from event_data_etl_gcs_spark.streaming.lm_bigram import (
        lm_gated_ingest_batch,
    )

    def ingest(bdf, bid):
        # threshold high enough that every batch accepts something
        lm_gated_ingest_batch(bdf, bid, root, 1e18)

    return ingest, ["uni", "bi", "accepted"], _docs


def _linkgraph_writer(spark, root):
    from event_data_etl_gcs_spark.streaming.linkgraph import (
        linkgraph_ingest_batch,
    )

    def ingest(bdf, bid):
        linkgraph_ingest_batch(bdf, bid, root)

    return ingest, ["edges", "frontier"], _docs


WRITERS = {
    "corpus": _corpus_writer,
    "linkgraph": _linkgraph_writer,
    "lm_bigram": _lm_bigram_writer,
    "lm_gated": _lm_gated_writer,
    "substring": _substring_writer,
    "semdedup": _semdedup_writer,
    "segdedup": _segdedup_writer,
    "sharding": _sharding_writer,
    "containment": _containment_writer,
    "neardedup": _neardedup_writer,
    "gram": _gram_writer,
}


def _state_snapshot(spark, root, dirs):
    snap = {}
    for d in dirs:
        p = os.path.join(root, d)
        if os.path.exists(p) and any(
            n.startswith("batch_id=") for n in os.listdir(p)
        ):
            df = spark.read.parquet(p)
            snap[d] = sorted(
                tuple(r) for r in df.select(*sorted(df.columns)).collect()
            )
        else:
            snap[d] = []
    return snap


@pytest.mark.parametrize("writer", sorted(WRITERS))
def test_crash_between_state_writes_then_replay(spark, tmp_path, writer):
    make = WRITERS[writer]
    n_batches, per = 3, 12
    last = n_batches - 1

    # clean reference run
    clean_root = str(tmp_path / f"{writer}_clean")
    ingest, dirs, gen = make(spark, clean_root)
    for b in range(n_batches):
        ingest(gen(spark, b * per, (b + 1) * per), b)
    want = _state_snapshot(spark, clean_root, dirs)
    assert any(want[d] for d in dirs), f"{writer}: clean run wrote no state"

    # crash after write i of the final batch (writes i+1.. never landed),
    # then replay the batch; i = len(dirs) means full write + replay.
    for crash_after in range(1, len(dirs) + 1):
        root = str(tmp_path / f"{writer}_crash{crash_after}")
        ingest_c, dirs_c, gen_c = make(spark, root)
        for b in range(n_batches):
            ingest_c(gen_c(spark, b * per, (b + 1) * per), b)
        # wipe the final batch's partition from the writes AFTER the
        # crash point (they never happened)
        for d in dirs_c[crash_after:]:
            part = os.path.join(root, d, f"batch_id={last}")
            assert os.path.exists(part), f"{writer}/{d} wrote no partition"
            shutil.rmtree(part)
        # foreachBatch replay of the final batch
        ingest_c(gen_c(spark, last * per, (last + 1) * per), last)
        got = _state_snapshot(spark, root, dirs_c)
        assert got == want, f"{writer}: crash point {crash_after} diverged"
