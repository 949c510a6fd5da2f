"""Streaming segment dedup: in-order deliveries reproduce the batch
reconstruct bit-for-bit; replays are idempotent; out-of-order arrival
keeps the first-arrived copy (documented divergence)."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from event_data_etl_gcs_spark.queries.segdedup import (
    SEG_W,
    segment_dedup_reconstruct,
)
from event_data_etl_gcs_spark.streaming.segdedup import (
    read_clean_corpus,
    run_streaming_segdedup,
    segdedup_ingest_batch,
)

SF = "/root/testdata/sf0.001"


def _stage_files(spark, docs, docs_dir: str, n_files: int) -> None:
    os.makedirs(docs_dir, exist_ok=True)
    ids = sorted(r[0] for r in docs.select("doc_id").collect())
    bounds = [ids[i * len(ids) // n_files] for i in range(n_files)] + [ids[-1] + 1]
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


def _clean_rows(spark, index_dir):
    return sorted(
        (r["doc_id"], r["n_segs"], r["n_kept"], r["text_dedup"])
        for r in read_clean_corpus(spark, index_dir).collect()
    )


def test_in_order_stream_equals_batch(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs_dir = str(tmp_path / "docs")
    idx = str(tmp_path / "idx")
    _stage_files(spark, docs, docs_dir, 3)
    run_streaming_segdedup(spark, docs_dir, idx, str(tmp_path / "cp"))
    got = _clean_rows(spark, idx)
    want = sorted(
        (r["doc_id"], r["n_segs"], r["n_kept"], r["text_dedup"])
        for r in segment_dedup_reconstruct(spark, SF).collect()
    )
    assert got == want


def test_replay_is_idempotent(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs_dir = str(tmp_path / "docs")
    idx = str(tmp_path / "idx")
    _stage_files(spark, docs, docs_dir, 2)
    run_streaming_segdedup(spark, docs_dir, idx, str(tmp_path / "cp"))
    want = _clean_rows(spark, idx)
    n_idx = spark.read.parquet(os.path.join(idx, "segments")).count()
    last = spark.read.parquet(os.path.join(docs_dir, "00001.parquet"))
    segdedup_ingest_batch(last, 1, idx)
    assert _clean_rows(spark, idx) == want
    assert spark.read.parquet(os.path.join(idx, "segments")).count() == n_idx


def test_out_of_order_keeps_first_arrival(spark, tmp_path):
    boiler = " ".join(f"b{i}" for i in range(SEG_W))
    mk = lambda i, text: (i, text, "en", "s", 0)
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    idx = str(tmp_path / "idx")
    # doc 10 (HIGHER id) delivers FIRST and claims the boilerplate
    segdedup_ingest_batch(spark.createDataFrame([mk(10, boiler)], schema), 0, idx)
    segdedup_ingest_batch(spark.createDataFrame([mk(1, boiler)], schema), 1, idx)
    got = {r["doc_id"]: r for r in read_clean_corpus(spark, idx).collect()}
    assert got[10]["n_kept"] == 1 and got[10]["text_dedup"] == boiler
    assert got[1]["n_kept"] == 0 and got[1]["text_dedup"] == ""
