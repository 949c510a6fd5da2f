"""Streaming DSIR model maintenance: keep the hashed-bucket count table
(the DSIR model's sufficient statistics) up to date from a document
stream, and score fresh batches against the maintained model without
ever rescanning the corpus.

Replay safety: bucket COUNT deltas are not replay-idempotent (the HDR
sketch lesson, sketches.py:286) — a redelivered micro-batch would
double-count. Each batch's partial counts therefore carry their
batch_id and a replay REPLACES the batch's own prior rows inside the
crash-atomic generation commit; all older batches fold into one
batch_id=-1 row set, bounding state at ~2 x DSIR_BUCKETS rows
regardless of stream length.

Because bucket counts are exact integers that sum across any batch
decomposition, the maintained model is BIT-IDENTICAL to the one a batch
rebuild over the full corpus would produce — pinned by
tests/test_streaming_dsir.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dsir import bucket_counts, ratio_table, score_docs, token_buckets
from .sketches import commit_state, read_state

DSIR_STATE_SCHEMA = "h BIGINT, ct BIGINT, cs BIGINT, batch_id BIGINT"


def run_streaming_dsir_maintenance(
    spark: SparkSession,
    stream: DataFrame,
    state_dir: str,
) -> None:
    """Drain a document stream (Available-Now), maintaining the DSIR
    bucket-count model at ``state_dir``."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        delta = bucket_counts(token_buckets(batch_df)).withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        )
        state = read_state(spark, state_dir, DSIR_STATE_SCHEMA)
        if state is not None:
            merged = state.filter(F.col("batch_id") != batch_id).unionByName(
                delta
            )
        else:
            merged = delta
        compacted = (
            merged.withColumn(
                "batch_id",
                F.when(
                    F.col("batch_id") == batch_id, F.col("batch_id")
                ).otherwise(F.lit(-1).cast("long")),
            )
            .groupBy("h", "batch_id")
            .agg(
                F.sum("ct").cast("long").alias("ct"),
                F.sum("cs").cast("long").alias("cs"),
            )
            .select("h", "ct", "cs", "batch_id")
        )
        commit_state(compacted, state_dir)

    q = (
        stream.writeStream.trigger(availableNow=True)
        .foreachBatch(upsert)
        .option("checkpointLocation", os.path.join(state_dir, "_checkpoint"))
        .start()
    )
    q.awaitTermination()


def read_dsir_model(spark: SparkSession, state_dir: str) -> DataFrame:
    """(h, ct, cs): the maintained model, batch partials folded."""
    state = read_state(spark, state_dir, DSIR_STATE_SCHEMA)
    if state is None:
        raise FileNotFoundError(f"no committed DSIR state at {state_dir}")
    return state.groupBy("h").agg(
        F.sum("ct").cast("long").alias("ct"),
        F.sum("cs").cast("long").alias("cs"),
    )


def score_against_model(
    spark: SparkSession, docs: DataFrame, state_dir: str
) -> DataFrame:
    """Score a fresh document frame against the MAINTAINED model — the
    online half of DSIR: the stream keeps the 4096-row statistics
    current; scoring any new delivery is one broadcast join against
    them, never a corpus rescan."""
    model = read_dsir_model(spark, state_dir)
    return score_docs(token_buckets(docs), ratio_table(model))
