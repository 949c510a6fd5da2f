"""Streaming-state compaction: read equivalence, continuation
equivalence, replay interplay, and the phase-by-phase crash matrix."""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import functions as F

from event_data_etl_gcs_spark.queries.substring_dedup import (
    substring_dedup_frame,
)
from event_data_etl_gcs_spark.sources.catalog import load_table
from event_data_etl_gcs_spark.streaming.compaction import (
    CONSOLIDATED_BATCH_ID,
    committed_batch_ids,
    compact_batch_state,
    gram_merge,
    postings_merge,
    recover_compaction,
)
from event_data_etl_gcs_spark.streaming.substring import (
    read_streamed_clean,
    substring_ingest_batch,
)

SF = "/root/testdata/sf0.001"


def _split(docs, n_batches, id_col="doc_id"):
    n = docs.count()
    cut = [round(i * n / n_batches) for i in range(n_batches + 1)]
    return [
        docs.filter((F.col(id_col) >= lo) & (F.col(id_col) < hi))
        for lo, hi in zip(cut, cut[1:])
    ]


def _posting_rows(spark, path):
    return sorted(
        (r["gram"], r["lo"], r["hi"])
        for r in spark.read.parquet(path)
        .groupBy("gram")
        .agg(F.min("lo").alias("lo"), F.max("hi").alias("hi"))
        .collect()
    )


def _clean_rows(spark, idx):
    return sorted(tuple(r) for r in read_streamed_clean(spark, idx).collect())


def _part_ids(path):
    return sorted(
        int(n.split("=")[1])
        for n in os.listdir(path)
        if n.startswith("batch_id=")
    )


def test_substring_compaction_read_and_continuation_equivalence(
    spark, tmp_path
):
    """Compact the postings mid-stream: the merged postings, the
    already-emitted outputs, and every SUBSEQUENT delivery's cleaned
    output are bit-identical to a never-compacted twin."""
    docs = load_table(spark, SF, "documents")
    batches = _split(docs, 4)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for i, batch in enumerate(batches[:2]):
        substring_ingest_batch(batch, i, a)
        substring_ingest_batch(batch, i, b)

    stats = compact_batch_state(
        spark, os.path.join(a, "postings"), merge=postings_merge
    )
    assert stats["covered"] == [0, 1]
    assert _part_ids(os.path.join(a, "postings")) == [CONSOLIDATED_BATCH_ID]
    # the consolidated partition is pre-reduced: one row per gram
    consolidated = spark.read.parquet(
        os.path.join(a, "postings", f"batch_id={CONSOLIDATED_BATCH_ID}")
    )
    assert consolidated.groupBy("gram").count().filter("count > 1").count() == 0

    assert _posting_rows(
        spark, os.path.join(a, "postings")
    ) == _posting_rows(spark, os.path.join(b, "postings"))

    # continuation: later deliveries clean identically on both sides
    for i, batch in enumerate(batches[2:], start=2):
        substring_ingest_batch(batch, i, a)
        substring_ingest_batch(batch, i, b)
    assert _clean_rows(spark, a) == _clean_rows(spark, b)

    # and the final delivery still matches the batch rebuild (the
    # standing frontier pin survives compaction)
    last_ids = {r["doc_id"] for r in batches[-1].select("doc_id").collect()}
    streamed = {
        r["doc_id"]: (r["n_hits"], r["n_removed"], r["text_clean"])
        for r in read_streamed_clean(spark, a).collect()
        if r["doc_id"] in last_ids
    }
    batch_map = {
        r["doc_id"]: (r["n_hits"], r["n_removed"], r["text_clean"])
        for r in substring_dedup_frame(docs).collect()
        if r["doc_id"] in last_ids
    }
    assert streamed == batch_map


def test_compaction_refolds_consolidated_partition(spark, tmp_path):
    """A second compaction folds the previous batch_id=-1 together with
    the partitions delivered since — state stays one partition."""
    docs = load_table(spark, SF, "documents")
    batches = _split(docs, 4)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for i, batch in enumerate(batches):
        substring_ingest_batch(batch, i, a)
        substring_ingest_batch(batch, i, b)
        compact_batch_state(
            spark, os.path.join(a, "postings"), merge=postings_merge
        )
    post_a = os.path.join(a, "postings")
    assert _part_ids(post_a) == [CONSOLIDATED_BATCH_ID]
    assert _posting_rows(spark, post_a) == _posting_rows(
        spark, os.path.join(b, "postings")
    )
    # file-count claim: the consolidated state is one directory whose
    # parquet files number far fewer than the per-delivery layout's
    n_files_a = sum(len(fs) for _, _, fs in os.walk(post_a))
    n_files_b = sum(len(fs) for _, _, fs in os.walk(os.path.join(b, "postings")))
    assert n_files_a < n_files_b


def test_single_partition_state_is_a_noop(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    a = str(tmp_path / "a")
    substring_ingest_batch(docs, 0, a)
    post = os.path.join(a, "postings")
    before = _posting_rows(spark, post)
    stats = compact_batch_state(spark, post, merge=postings_merge)
    assert stats["covered"] == []
    assert _part_ids(post) == [0]
    assert _posting_rows(spark, post) == before


def test_gram_compaction_needs_checkpoint_scope(spark, tmp_path):
    """Sum-merged Gram state: compaction folds only COMMITTED
    deliveries; the in-flight partition survives, its replay rewrites
    it, and the merged sums equal the clean run exactly (no double
    count)."""
    from event_data_etl_gcs_spark.streaming.linalg import (
        gram_maintain_batch,
        read_streamed_gram,
    )

    emb = load_table(spark, SF, "embeddings")
    batches = _split(emb, 3, id_col="vec_id")
    state = str(tmp_path / "gram_state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(os.path.join(ckpt, "commits"))
    for i, batch in enumerate(batches):
        gram_maintain_batch(batch, i, state)
        if i < 2:  # batch 2 is "in-flight": state written, no commit
            open(os.path.join(ckpt, "commits", str(i)), "w").close()

    clean = sorted(tuple(r) for r in read_streamed_gram(spark, state).collect())

    assert committed_batch_ids(ckpt) == {0, 1}
    gram_path = os.path.join(state, "gram")
    stats = compact_batch_state(
        spark, gram_path, merge=gram_merge, checkpoint_dir=ckpt
    )
    assert stats["covered"] == [0, 1] and stats["skipped"] == [2]
    assert _part_ids(gram_path) == [CONSOLIDATED_BATCH_ID, 2]

    # replay of the in-flight delivery: deterministic rewrite of its
    # own partition, then the merged read equals the clean run
    gram_maintain_batch(batches[2], 2, state)
    after = sorted(tuple(r) for r in read_streamed_gram(spark, state).collect())
    assert after == clean


def test_gram_compaction_model_bit_identical(spark, tmp_path):
    """End to end: compacting the Gram state leaves the fitted PCA
    model (quantized eigenvectors + whitening factors) bit-identical."""
    from event_data_etl_gcs_spark.streaming.linalg import (
        gram_maintain_batch,
        streamed_pca_fit,
    )

    emb = load_table(spark, SF, "embeddings")
    state_a, state_b = str(tmp_path / "a"), str(tmp_path / "b")
    for i, batch in enumerate(_split(emb, 3, id_col="vec_id")):
        gram_maintain_batch(batch, i, state_a)
        gram_maintain_batch(batch, i, state_b)
    compact_batch_state(
        spark, os.path.join(state_a, "gram"), merge=gram_merge
    )
    import numpy as np

    qe_a, qw_a, ev_a = streamed_pca_fit(spark, state_a)
    qe_b, qw_b, ev_b = streamed_pca_fit(spark, state_b)
    assert np.array_equal(np.asarray(qe_a), np.asarray(qe_b))
    assert np.array_equal(np.asarray(qw_a), np.asarray(qw_b))
    assert np.array_equal(np.asarray(ev_a), np.asarray(ev_b))


def _build_postings_state(spark, tmp_path, name):
    docs = load_table(spark, SF, "documents")
    idx = str(tmp_path / name)
    for i, batch in enumerate(_split(docs, 3)):
        substring_ingest_batch(batch, i, idx)
    return os.path.join(idx, "postings")


def test_crash_matrix_every_compaction_phase(spark, tmp_path):
    """Interrupt compaction after each phase; recover_compaction (run
    implicitly by the next compaction) must land every scenario on the
    same merged postings as the untouched twin."""
    ref = _build_postings_state(spark, tmp_path, "ref")
    expected = _posting_rows(spark, ref)
    staging_of = lambda p: p.rstrip("/") + ".compact_staging"

    # --- crash mid-phase-1: staged data, NO manifest -----------------
    p1 = _build_postings_state(spark, tmp_path, "p1")
    data = os.path.join(staging_of(p1), "data")
    postings_merge(spark.read.parquet(p1).drop("batch_id")).write.parquet(data)
    assert recover_compaction(p1) == "dropped"
    assert not os.path.exists(staging_of(p1))
    assert _part_ids(p1) == [0, 1, 2]
    assert _posting_rows(spark, p1) == expected

    # --- crash mid-phase-2: manifest present, sources partly deleted -
    p2 = _build_postings_state(spark, tmp_path, "p2")
    data = os.path.join(staging_of(p2), "data")
    postings_merge(spark.read.parquet(p2).drop("batch_id")).write.parquet(data)
    with open(os.path.join(staging_of(p2), "_COMPACT_MANIFEST.json"), "w") as fh:
        json.dump({"covered": [0, 1, 2]}, fh)
    shutil.rmtree(os.path.join(p2, "batch_id=1"))  # partial phase 2
    assert recover_compaction(p2) == "completed"
    assert _part_ids(p2) == [CONSOLIDATED_BATCH_ID]
    assert _posting_rows(spark, p2) == expected

    # --- crash after phase 3: data renamed, staging+manifest remain --
    p3 = _build_postings_state(spark, tmp_path, "p3")
    data = os.path.join(staging_of(p3), "data")
    postings_merge(spark.read.parquet(p3).drop("batch_id")).write.parquet(data)
    with open(os.path.join(staging_of(p3), "_COMPACT_MANIFEST.json"), "w") as fh:
        json.dump({"covered": [0, 1, 2]}, fh)
    for bid in (0, 1, 2):
        shutil.rmtree(os.path.join(p3, f"batch_id={bid}"))
    os.rename(data, os.path.join(p3, f"batch_id={CONSOLIDATED_BATCH_ID}"))
    assert recover_compaction(p3) == "completed"
    assert not os.path.exists(staging_of(p3))
    assert _posting_rows(spark, p3) == expected

    # --- clean dir: recovery is a no-op -------------------------------
    assert recover_compaction(ref) == "clean"
    assert _posting_rows(spark, ref) == expected

    # --- and the next compact_batch_state call self-recovers ---------
    p4 = _build_postings_state(spark, tmp_path, "p4")
    data = os.path.join(staging_of(p4), "data")
    postings_merge(spark.read.parquet(p4).drop("batch_id")).write.parquet(data)
    with open(os.path.join(staging_of(p4), "_COMPACT_MANIFEST.json"), "w") as fh:
        json.dump({"covered": [0, 1, 2]}, fh)
    stats = compact_batch_state(spark, p4, merge=postings_merge)
    # recovery completed the interrupted fold; the fresh call then saw
    # a single consolidated partition and no-opped
    assert stats["covered"] == []
    assert _part_ids(p4) == [CONSOLIDATED_BATCH_ID]
    assert _posting_rows(spark, p4) == expected


def test_append_only_state_file_compaction(spark, tmp_path):
    """merge=None is pure file compaction for append-only outputs: the
    clean table's rows are unchanged, partition count drops to one."""
    docs = load_table(spark, SF, "documents")
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for i, batch in enumerate(_split(docs, 3)):
        substring_ingest_batch(batch, i, a)
        substring_ingest_batch(batch, i, b)
    before = sorted(
        tuple(r)
        for r in spark.read.parquet(os.path.join(b, "clean"))
        .drop("batch_id")
        .collect()
    )
    compact_batch_state(spark, os.path.join(a, "clean"))
    assert _part_ids(os.path.join(a, "clean")) == [CONSOLIDATED_BATCH_ID]
    after = sorted(
        tuple(r)
        for r in spark.read.parquet(os.path.join(a, "clean"))
        .drop("batch_id")
        .collect()
    )
    assert after == before


def test_runner_with_periodic_compaction_matches_plain_drain(
    spark, tmp_path
):
    """Available-Now drain with compact_every=2 produces bit-identical
    cleaned outputs to a plain drain, and leaves the postings state
    consolidated."""
    from event_data_etl_gcs_spark.streaming.substring import (
        run_streaming_substring_dedup,
    )

    docs = load_table(spark, SF, "documents")
    src = str(tmp_path / "docs")
    for i, batch in enumerate(_split(docs, 4)):
        batch.coalesce(1).write.mode("append").parquet(src)

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    run_streaming_substring_dedup(
        spark, src, a, str(tmp_path / "ck_a"), compact_every=2
    )
    run_streaming_substring_dedup(spark, src, b, str(tmp_path / "ck_b"))

    assert _clean_rows(spark, a) == _clean_rows(spark, b)
    assert _posting_rows(
        spark, os.path.join(a, "postings")
    ) == _posting_rows(spark, os.path.join(b, "postings"))
    ids = _part_ids(os.path.join(a, "postings"))
    assert CONSOLIDATED_BATCH_ID in ids and len(ids) <= 2


def test_lm_counts_compaction_scores_bit_identical(spark, tmp_path):
    """Sum-merged LM count states (uni, bi) compact with counts_merge
    under checkpoint scoping: the in-flight delivery survives the fold,
    its replay rewrites it, and scoring against the maintained model is
    bit-identical to the uncompacted run."""
    from event_data_etl_gcs_spark.streaming.compaction import counts_merge
    from event_data_etl_gcs_spark.streaming.lm_bigram import (
        lm_ingest_batch,
        score_against_lm_model,
    )

    docs = load_table(spark, SF, "documents")
    batches = _split(docs, 3)
    state = str(tmp_path / "lm_state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(os.path.join(ckpt, "commits"))
    for i, batch in enumerate(batches):
        lm_ingest_batch(batch, i, state)
        if i < 2:  # batch 2 in-flight: state written, no commit
            open(os.path.join(ckpt, "commits", str(i)), "w").close()

    def score_rows():
        return sorted(
            tuple(r)
            for r in score_against_lm_model(spark, docs, state).collect()
        )

    clean = score_rows()
    for sub, keys in (("uni", ("tok",)), ("bi", ("prev", "cur"))):
        stats = compact_batch_state(
            spark,
            os.path.join(state, sub),
            merge=counts_merge(*keys),
            checkpoint_dir=ckpt,
        )
        assert stats["covered"] == [0, 1] and stats["skipped"] == [2]
        assert _part_ids(os.path.join(state, sub)) == [
            CONSOLIDATED_BATCH_ID,
            2,
        ]

    # replay of the in-flight delivery, then exact score equality
    lm_ingest_batch(batches[2], 2, state)
    assert score_rows() == clean
