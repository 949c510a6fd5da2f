"""Streaming shard writer: hash-order deliveries reproduce the batch
assignment with the same fixed budget; replays are idempotent; shards
fill continuously across delivery boundaries."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from event_data_etl_gcs_spark.queries.layout import hash_order_prefix_tokens
from event_data_etl_gcs_spark.streaming.sharding import (
    read_shard_assignments,
    run_streaming_sharding,
    shard_ingest_batch,
)

SF = "/root/testdata/sf0.001"
BUDGET = 2_048


def _stage_hash_order(spark, docs, docs_dir: str, n_files: int) -> None:
    """Split deliveries along the HASH order (the batch op's global
    ordering) so the streamed fill is comparable to the batch one."""
    os.makedirs(docs_dir, exist_ok=True)
    cum = hash_order_prefix_tokens(docs).orderBy("cum_before").collect()
    ids = [r["doc_id"] for r in cum]
    bounds = [i * len(ids) // n_files for i in range(n_files)] + [len(ids)]
    for i in range(n_files):
        chunk = ids[bounds[i] : bounds[i + 1]]
        part = docs.filter(F.col("doc_id").isin(chunk)).coalesce(1)
        tmpd = os.path.join(docs_dir, f"_w{i}")
        part.write.mode("overwrite").parquet(tmpd)
        src = glob.glob(os.path.join(tmpd, "part-*.parquet"))[0]
        dst = os.path.join(docs_dir, f"{i:05d}.parquet")
        shutil.move(src, dst)
        shutil.rmtree(tmpd)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))


def _rows(spark, state_dir):
    return sorted(
        (r["doc_id"], r["n_tokens"], r["cum_before"], r["shard_id"])
        for r in read_shard_assignments(spark, state_dir).collect()
    )


def test_hash_order_stream_equals_batch_formula(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs_dir = str(tmp_path / "docs")
    st = str(tmp_path / "st")
    _stage_hash_order(spark, docs, docs_dir, 3)
    run_streaming_sharding(
        spark, docs_dir, st, str(tmp_path / "cp"), token_budget=BUDGET
    )
    got = _rows(spark, st)
    want = sorted(
        (
            r["doc_id"],
            r["n_tokens"],
            r["cum_before"],
            r["cum_before"] // BUDGET,
        )
        for r in hash_order_prefix_tokens(docs).collect()
    )
    assert got == want
    # shards fill continuously: the shard count matches the token total
    total = sum(r[1] for r in want)
    n_shards = len({r[3] for r in got})
    assert n_shards == (total + BUDGET - 1) // BUDGET or n_shards == total // BUDGET + 1


def test_replay_is_idempotent(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs_dir = str(tmp_path / "docs")
    st = str(tmp_path / "st")
    _stage_hash_order(spark, docs, docs_dir, 2)
    run_streaming_sharding(
        spark, docs_dir, st, str(tmp_path / "cp"), token_budget=BUDGET
    )
    want = _rows(spark, st)
    last = spark.read.parquet(os.path.join(docs_dir, "00001.parquet"))
    shard_ingest_batch(last, 1, st, token_budget=BUDGET)
    assert _rows(spark, st) == want
