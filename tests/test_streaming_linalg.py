"""Streaming PCA model maintenance: the Gram state is exactly
mergeable int64, so streamed == batch is a BIT-IDENTITY claim."""

from __future__ import annotations

import time as _time

import numpy as np
from pyspark.sql import functions as F

from event_data_etl_gcs_spark.operators.linalg import gram_qsum, pca_fit
from event_data_etl_gcs_spark.sources.catalog import load_table
from event_data_etl_gcs_spark.streaming.linalg import (
    gram_maintain_batch,
    read_streamed_gram,
    run_streaming_gram_maintenance,
    streamed_pca_fit,
)

SF = "/root/testdata/sf0.001"


def _gram_rows(df):
    return sorted((r["i"], r["j"], r["qsum"]) for r in df.collect())


def test_streamed_gram_and_fit_bit_identical_to_batch(spark, tmp_path):
    emb = load_table(spark, SF, "embeddings")
    want = _gram_rows(gram_qsum(emb))
    qe_b, qw_b, lam_b = pca_fit(emb)

    emb_dir = str(tmp_path / "emb_stream")
    n = emb.count()
    for lo, hi in [(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]:
        emb.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        ).coalesce(1).write.mode("append").parquet(emb_dir)
        _time.sleep(1.1)  # distinct mtimes -> deterministic file order

    state = str(tmp_path / "gram_state")
    run_streaming_gram_maintenance(
        spark, emb_dir, state, str(tmp_path / "ckpt")
    )
    assert _gram_rows(read_streamed_gram(spark, state)) == want

    qe_s, qw_s, lam_s = streamed_pca_fit(spark, state)
    assert np.array_equal(qe_s, qe_b)  # bit-identical quantized model
    assert list(qw_s) == list(qw_b)
    assert lam_s == lam_b  # identical doubles (same ints -> same solve)


def test_gram_maintain_replay_and_empty_batches(spark, tmp_path):
    emb = load_table(spark, SF, "embeddings")
    b0 = emb.filter(F.col("vec_id") < 100)
    b1 = emb.filter(F.col("vec_id") >= 100)
    state = str(tmp_path / "g")
    gram_maintain_batch(b0, 0, state)
    gram_maintain_batch(b1, 1, state)
    want = _gram_rows(read_streamed_gram(spark, state))
    # replay of batch 1 (crash before checkpoint commit)
    gram_maintain_batch(b1, 1, state)
    assert _gram_rows(read_streamed_gram(spark, state)) == want
    # an empty delivery neither writes nor breaks anything
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    gram_maintain_batch(empty, 2, state)
    assert _gram_rows(read_streamed_gram(spark, state)) == want
