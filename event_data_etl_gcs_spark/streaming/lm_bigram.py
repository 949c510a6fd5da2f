"""Streaming bigram-LM model maintenance: keep the bigram model's
sufficient statistics (unigram counts + bigram counts) current from a
document stream, and score any frame against the maintained model
without rescanning the corpus.

The model is two count tables — exact integers that sum across any
batch decomposition, the same exactly-mergeable-state algebra as the
DSIR bucket counts (streaming/dsir.py) and the int64 Gram partials
(streaming/linalg.py). The maintained model is therefore BIT-IDENTICAL
to a batch rebuild over the union of deliveries, and scoring through
the shared ``score_bigram_with_model`` join reproduces
``bigram_surprisal_scores`` double-for-double (pinned in
tests/test_streaming_lm_bigram.py).

Replay safety: count deltas are not replay-idempotent, so each batch's
partials land in their own ``batch_id=N`` partition via dynamic
overwrite — a redelivered batch REWRITES its own partition (a pure
function of the batch) instead of double-counting. Both tables append
under one state root; a crash between the two writes leaves the uni
partial committed and the bi partial missing for that batch, and the
checkpoint replay rewrites BOTH deterministically — the same
multi-writer recovery contract the chaos matrix exercises for the
substring and corpus runners.

State growth is vocabulary-bound (distinct tokens / distinct bigrams),
not corpus-bound; per-delivery partials fold with
``streaming/compaction.py``'s sum merge when delivery count grows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.lm_bigram import bigram_rows, score_bigram_with_model
from .corpus import _append_state

UNI_STATE_SCHEMA = "tok STRING, c LONG, batch_id LONG"
BI_STATE_SCHEMA = "prev STRING, cur STRING, c LONG, batch_id LONG"


def lm_ingest_batch(
    batch_df: DataFrame, batch_id: int, state_dir: str
) -> None:
    """One increment: append this batch's unigram and bigram count
    partials under their own batch_id partition."""
    tk, bg = bigram_rows(batch_df)
    uni = tk.groupBy("tok").agg(F.count("*").cast("long").alias("c"))
    bi = bg.groupBy("prev", "cur").agg(F.count("*").cast("long").alias("c"))
    _append_state(uni, os.path.join(state_dir, "uni"), batch_id)
    _append_state(bi, os.path.join(state_dir, "bi"), batch_id)


def read_lm_model(spark: SparkSession, state_dir: str):
    """(uni, bi): the maintained count tables, batch partials folded."""
    def _has_parts(p: str) -> bool:
        return os.path.exists(p) and any(
            n.startswith("batch_id=") for n in os.listdir(p)
        )

    uni_path = os.path.join(state_dir, "uni")
    bi_path = os.path.join(state_dir, "bi")
    if not _has_parts(uni_path):
        raise FileNotFoundError(f"no committed LM state at {state_dir}")
    uni = (
        spark.read.schema(UNI_STATE_SCHEMA)
        .parquet(uni_path)
        .groupBy("tok")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    if _has_parts(bi_path):
        bi = (
            spark.read.schema(BI_STATE_SCHEMA)
            .parquet(bi_path)
            .groupBy("prev", "cur")
            .agg(F.sum("c").cast("long").alias("c"))
        )
    else:
        # every delivery so far held only sub-2-token docs: the bigram
        # table is legitimately empty (dynamic overwrite writes no
        # partition for an empty partial), not missing state
        bi = spark.createDataFrame([], "prev string, cur string, c long")
    return uni, bi


def score_against_lm_model(
    spark: SparkSession, docs: DataFrame, state_dir: str
) -> DataFrame:
    """Score a document frame against the MAINTAINED model. Context
    counts c(v) derive from the bigram table (sum over continuations),
    vocabulary size from the unigram table's row count — the identical
    integers a batch rebuild computes, feeding the identical scoring
    join, so streamed scores == batch scores bit-for-bit."""
    uni, bi = read_lm_model(spark, state_dir)
    _, bg = bigram_rows(docs)
    ctx = bi.groupBy("prev").agg(F.sum("c").cast("long").alias("cv"))
    bgc = bi.select("prev", "cur", F.col("c").alias("cvw"))
    tot = uni.agg(
        F.sum("c").cast("long").alias("n_total"),
        F.count("*").alias("vsz"),
    )
    return score_bigram_with_model(bg, ctx, bgc, tot)


def run_streaming_lm_maintenance(
    spark: SparkSession,
    stream: DataFrame,
    state_dir: str,
) -> None:
    """Drain a document stream (Available-Now), maintaining the bigram
    LM count tables at ``state_dir``."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        lm_ingest_batch(batch_df, batch_id, state_dir)

    q = (
        stream.writeStream.trigger(availableNow=True)
        .foreachBatch(upsert)
        .option("checkpointLocation", os.path.join(state_dir, "_checkpoint"))
        .start()
    )
    q.awaitTermination()


# ---------------------------------------------------------------------
# LM-gated ingest: the streaming posture of the v6 CCNet quality stage.
# ---------------------------------------------------------------------

ACCEPTED_SCHEMA = (
    "doc_id LONG, source STRING, n_bigrams BIGINT, mean_inv_p DOUBLE, "
    "batch_id LONG"
)


def lm_gated_ingest_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    threshold: float,
) -> None:
    """One increment of the LM-gated ingest: fold the batch's counts
    into the model FIRST (own batch counts — the substring-dedup
    frontier convention), then score the batch's documents against the
    merged seen-so-far model and emit those with mean_inv_p <=
    ``threshold`` to the ``accepted`` state.

    The gate is an ABSOLUTE score cutoff, not the batch pipeline's
    per-language tercile: terciles are a global-rank property the batch
    rebuild owns; an online gate must decide per delivery. The
    documented consequence (same divergence class as
    streaming/segdedup.py): a document's score drifts as the model
    absorbs later deliveries, so early accepts are not retroactively
    re-judged — a ONE-delivery drain is bit-identical to the batch
    score-and-filter (pinned), and any split's per-delivery decisions
    are exactly reproducible from the state prefix (pinned)."""
    spark = batch_df.sparkSession
    lm_ingest_batch(batch_df, batch_id, state_dir)
    scored = score_against_lm_model(spark, batch_df, state_dir)
    src = batch_df.select("doc_id", "source")
    accepted = (
        scored.filter(F.col("mean_inv_p") <= threshold)
        .join(src, "doc_id")
        .select("doc_id", "source", "n_bigrams", "mean_inv_p")
    )
    _append_state(accepted, os.path.join(state_dir, "accepted"), batch_id)


def run_streaming_lm_gated_ingest(
    spark: SparkSession,
    stream: DataFrame,
    state_dir: str,
    threshold: float,
) -> None:
    """Drain a document stream (Available-Now) through the LM-quality
    gate, maintaining the model and the accepted-docs log."""

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        lm_gated_ingest_batch(batch_df, batch_id, state_dir, threshold)

    q = (
        stream.writeStream.trigger(availableNow=True)
        .foreachBatch(on_batch)
        .option("checkpointLocation", os.path.join(state_dir, "_checkpoint"))
        .start()
    )
    q.awaitTermination()


def read_accepted(spark: SparkSession, state_dir: str) -> DataFrame:
    """All deliveries' accepted documents (with batch_id). Explicit
    schema: under a strict threshold every delivery's accepted partial
    can be empty, in which case dynamic overwrite writes NO partitions
    and schema inference would fail — the correct answer is an empty
    frame with the accepted shape, mirroring read_lm_model's
    empty-state handling (ADVICE r9 #3)."""
    path = os.path.join(state_dir, "accepted")
    if not (
        os.path.exists(path)
        and any(n.startswith("batch_id=") for n in os.listdir(path))
    ):
        return spark.createDataFrame([], ACCEPTED_SCHEMA)
    return spark.read.schema(ACCEPTED_SCHEMA).parquet(path)
