"""Streaming near-dedup: pairs accumulated across micro-batches (and
across RUNS) must equal the full-corpus batch pair set."""

from __future__ import annotations

import time as _time

from pyspark.sql import functions as F

from event_data_etl_gcs_spark.operators.dedup import minhash_lsh_pairs
from event_data_etl_gcs_spark.sources.catalog import load_table
from event_data_etl_gcs_spark.streaming.neardedup import run_streaming_near_dedup

SF = "/root/testdata/sf0.001"


def _pair_set(df):
    return {(r.id_a, r.id_b, r.jaccard) for r in df.collect()}


def test_streaming_near_dedup_matches_full_corpus(spark, tmp_path):
    docs_dir = str(tmp_path / "docs_stream")
    out_dir = str(tmp_path / "dedup_out")
    ckpt = str(tmp_path / "ckpt")

    docs = load_table(spark, SF, "documents")
    # First run: three files (doc_id thirds) -> three micro-batches.
    n = docs.count()
    first = docs.filter(F.col("doc_id") < n * 3 // 4)
    for lo, hi in [(0, n // 4), (n // 4, n // 2), (n // 2, n * 3 // 4)]:
        first.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.mode("append").parquet(docs_dir)
        _time.sleep(1.1)  # distinct mtimes -> deterministic file order

    run_streaming_near_dedup(spark, docs_dir, out_dir, ckpt)
    got_first = _pair_set(spark.read.parquet(out_dir + "/pairs"))
    want_first = _pair_set(minhash_lsh_pairs(first, threshold=0.5))
    assert got_first == want_first

    # Second run: the remaining quarter lands as one new file; the
    # checkpoint skips the old files, the persisted index covers them.
    docs.filter(F.col("doc_id") >= n * 3 // 4).coalesce(1).write.mode(
        "append"
    ).parquet(docs_dir)
    run_streaming_near_dedup(spark, docs_dir, out_dir, ckpt)

    got_all = _pair_set(spark.read.parquet(out_dir + "/pairs"))
    want_all = _pair_set(minhash_lsh_pairs(docs, threshold=0.5))
    assert got_all == want_all
    assert len(got_all) > len(got_first)  # the new file contributed pairs

    # index covers every shingled doc exactly once
    sig = spark.read.parquet(out_dir + "/signatures")
    assert sig.groupBy("id").count().filter(F.col("count") > 1).count() == 0


def test_streaming_ivf_ingest_matches_rebuild(spark, tmp_path):
    """Embeddings streamed file-by-file into the persisted inverted file
    must answer queries bit-identically to a from-scratch index build
    (frozen centroids, map-only assignment)."""
    from event_data_etl_gcs_spark.operators.ivf import (
        build_ivf_index,
        ivf_topk_on_index,
        train_ivf_centroids,
    )
    from event_data_etl_gcs_spark.streaming.neardedup import (
        run_streaming_ivf_ingest,
    )

    emb = load_table(spark, SF, "embeddings")
    cents = train_ivf_centroids(emb, k=8, iterations=2)

    emb_dir = str(tmp_path / "emb_stream")
    n = emb.count()
    for lo, hi in [(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]:
        emb.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        ).coalesce(1).write.mode("append").parquet(emb_dir)
        _time.sleep(1.1)

    idx = str(tmp_path / "ivf_idx")
    run_streaming_ivf_ingest(
        spark, emb_dir, idx, str(tmp_path / "ckpt"), cents
    )

    queries = emb.filter(F.col("vec_id") < 15)
    got = {
        (r.query_id, r.neighbor_id, r.cos_sim, r.rank)
        for r in ivf_topk_on_index(
            spark.read.parquet(idx), queries, cents, k=5, n_probe=3
        ).collect()
    }
    want = {
        (r.query_id, r.neighbor_id, r.cos_sim, r.rank)
        for r in ivf_topk_on_index(
            build_ivf_index(emb, cents), queries, cents, k=5, n_probe=3
        ).collect()
    }
    assert got == want

    # and the raw CELL ASSIGNMENTS themselves are identical (not just
    # the query answers): streamed-ingest per-batch assignment against
    # frozen centroids == one-shot batch assignment, vector for vector
    streamed_cells = {
        (r.vec_id, r.cell) for r in spark.read.parquet(idx).select("vec_id", "cell").collect()
    }
    batch_cells = {
        (r.vec_id, r.cell)
        for r in build_ivf_index(emb, cents).select("vec_id", "cell").collect()
    }
    assert streamed_cells == batch_cells and len(streamed_cells) > 0


def test_streaming_containment_equals_batch(spark, tmp_path):
    """Draining the backlog through the incremental containment check
    yields exactly the full-corpus containment_pairs output, however
    the backlog is split into files, with no duplicate emissions."""
    from event_data_etl_gcs_spark.operators.dedup import containment_pairs
    from event_data_etl_gcs_spark.streaming.neardedup import (
        run_streaming_containment,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    want = sorted(
        (r["id_a"], r["id_b"], r["containment"])
        for r in containment_pairs(docs).collect()
    )
    src = str(tmp_path / "docs_split")
    docs.repartition(3).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "cont_out")
    run_streaming_containment(
        spark, src, out, str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    got = [
        (r["id_a"], r["id_b"], r["containment"])
        for r in spark.read.parquet(f"{out}/pairs").collect()
    ]
    assert sorted(got) == want
    assert len(got) == len(set(got))
