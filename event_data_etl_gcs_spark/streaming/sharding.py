"""Streaming training-shard writer: assign arriving documents to
token-budget shards, continuing the fill across deliveries.

Batch counterpart: queries/layout.shard_assignment_token_balanced
divides the corpus's hash-ordered token prefix sums by a budget derived
from the (known) total. A stream never knows the total, so the online
form takes a FIXED per-shard token budget and keeps one scalar of
state — the running token total — so shard N+1 starts exactly where
shard N's budget filled, whatever the delivery boundaries. When
deliveries arrive in hash order, the streamed assignment equals the
batch assignment with the same budget, row for row (pinned by test).

Replay safety: per-batch token totals are batch_id-partitioned with
dynamic overwrite; the offset a batch sees is the sum of OTHER batches'
totals, so redelivery recomputes the identical assignment. The state
read is SHARD_BUCKETS-bounded rows per batch; the in-batch prefix sum
is the shared distributed spelling (hash_order_prefix_tokens).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.layout import hash_order_prefix_tokens
from .corpus import _append_state, _read_state_parts

SHARD_TOTALS_SCHEMA = "batch_tokens BIGINT, batch_id LONG"
SHARD_OUT_SCHEMA = (
    "doc_id LONG, n_tokens BIGINT, cum_before BIGINT, shard_id BIGINT, "
    "batch_id LONG"
)
DEFAULT_SHARD_TOKEN_BUDGET = 2_048


def shard_ingest_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    token_budget: int = DEFAULT_SHARD_TOKEN_BUDGET,
) -> None:
    """One increment: hash-order prefix sums within the batch, offset by
    the committed running total, divided by the fixed budget."""
    spark = batch_df.sparkSession
    tot_path = os.path.join(state_dir, "totals")
    out_path = os.path.join(state_dir, "assignments")

    prior = _read_state_parts(spark, tot_path, SHARD_TOTALS_SCHEMA, batch_id)
    if prior is not None:
        # strictly-earlier batches only: a replayed batch must not see a
        # LATER batch's total in its offset (read_state_parts only
        # excludes the current batch)
        offset = (
            prior.filter(F.col("batch_id") < batch_id)
            .agg(F.sum("batch_tokens"))
            .collect()[0][0]
            or 0
        )
    else:
        offset = 0

    cum = hash_order_prefix_tokens(batch_df)
    assigned = cum.select(
        "doc_id",
        "n_tokens",
        (F.col("cum_before") + F.lit(int(offset))).cast("bigint").alias(
            "cum_before"
        ),
        F.expr(
            f"CAST((cum_before + {int(offset)}L) div {int(token_budget)} "
            "AS BIGINT)"
        ).alias("shard_id"),
    ).localCheckpoint(eager=True)
    batch_tokens = assigned.agg(
        F.sum("n_tokens").cast("bigint").alias("batch_tokens")
    )
    _append_state(assigned, out_path, batch_id)
    _append_state(batch_tokens, tot_path, batch_id)


def run_streaming_sharding(
    spark: SparkSession,
    docs_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    token_budget: int = DEFAULT_SHARD_TOKEN_BUDGET,
    max_files_per_trigger: int = 1,
) -> None:
    """Drain a documents backlog through the shard writer (Available-Now;
    re-runs process only new files and keep filling the current shard)."""
    schema = spark.read.parquet(docs_dir).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        shard_ingest_batch(batch_df, batch_id, state_dir, token_budget)

    q = (
        raw.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(on_batch)
        .start()
    )
    q.awaitTermination()


def read_shard_assignments(spark: SparkSession, state_dir: str) -> DataFrame:
    """(doc_id, n_tokens, cum_before, shard_id, batch_id): every
    assignment made so far."""
    return spark.read.parquet(os.path.join(state_dir, "assignments"))
