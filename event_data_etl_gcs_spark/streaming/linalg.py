"""Streaming PCA model maintenance: the Gram matrix is an EXACTLY
MERGEABLE state (per-batch quantized partial Grams are int64 sums, and
int64 sums are exact in any order), so the streamed model is
BIT-IDENTICAL to a from-scratch batch fit over the same corpus — the
strongest streamed==batch contract in the engine, with no float
accumulation caveat at all.

Per micro-batch: the batch's own (i, j, q) partial Gram lands as its
``batch_id=N`` partition via dynamic partition overwrite (the
:mod:`.corpus` replay-idempotence recipe — a foreachBatch replay
rewrites the same partition). Reading the model = one tiny
``groupBy(i, j).sum(q)`` over dim^2/2-row partitions (data volume:
batches x dim^2 longs — never the corpus) followed by the driver-side
fixed-spec eigensolve (operators/linalg.power_iteration_topk).

Why this matters at 100 TB: the Gram pass is the only corpus-touching
step of a PCA fit, and here it is paid ONCE PER DELIVERY over just the
delivery — refreshing the model after new data arrives costs one
dim x dim eigensolve, not a corpus rescan. The projection queries
(queries/pca.py) consume the refreshed quantized eigenvectors
unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.linalg import (
    PCA_K,
    PCA_N_ITER,
    gram_qsum,
    power_iteration_topk,
    quantize_components,
    whitening_factors,
)
from ..operators.clustering import QMEAN_SCALE
from .corpus import _append_state, _read_state_parts

GRAM_STATE_SCHEMA = "i LONG, j LONG, qsum LONG, batch_id LONG"


def gram_maintain_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """One increment: the batch's partial Gram -> its own batch_id
    partition. An all-null/empty delivery writes nothing (and a replay
    of it is equally empty — still idempotent)."""
    rows = batch_df.filter(F.col(vec_col).isNotNull())
    if rows.isEmpty():
        return
    part = gram_qsum(rows, id_col, vec_col).localCheckpoint(eager=True)
    _append_state(part, os.path.join(state_dir, "gram"), batch_id)


def read_streamed_gram(spark: SparkSession, state_dir: str) -> DataFrame:
    """(i, j, qsum): the full-corpus quantized Gram merged across all
    committed batches — bit-identical to a batch ``gram_qsum`` over the
    union (exact int64 sums, order-free)."""
    path = os.path.join(state_dir, "gram")
    if not (
        os.path.exists(path)
        and any(n.startswith("batch_id=") for n in os.listdir(path))
    ):
        raise FileNotFoundError(
            f"no committed gram batches under {state_dir!r}: run "
            "run_streaming_gram_maintenance first"
        )
    return (
        spark.read.parquet(path)
        .groupBy("i", "j")
        .agg(F.sum("qsum").alias("qsum"))
    )


def streamed_pca_fit(
    spark: SparkSession,
    state_dir: str,
    k: int = PCA_K,
    n_iter: int = PCA_N_ITER,
):
    """(qe, qw, eigvals): the PCA model from the streamed Gram state —
    bit-identical to ``operators.linalg.pca_fit`` over the same corpus
    (identical integer Gram -> identical fixed-spec eigensolve)."""
    import numpy as np

    rows = read_streamed_gram(spark, state_dir).collect()
    dim = max(r["j"] for r in rows)
    G = np.zeros((dim, dim), np.int64)
    for r in rows:
        G[r["i"] - 1, r["j"] - 1] = r["qsum"]
        G[r["j"] - 1, r["i"] - 1] = r["qsum"]
    if np.abs(G).max() >= (1 << 53):
        raise ValueError("gram qsum exceeds exact float64 range")
    eigvals, V = power_iteration_topk(
        G.astype(np.float64) / QMEAN_SCALE, k, n_iter
    )
    return quantize_components(V), whitening_factors(eigvals), eigvals


def run_streaming_gram_maintenance(
    spark: SparkSession,
    emb_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_files_per_trigger: int = 1,
) -> None:
    """Drain an embeddings backlog through the Gram maintenance loop
    (Available-Now trigger; re-runs process only new files)."""
    schema = spark.read.parquet(emb_dir).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(emb_dir)
    )

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        gram_maintain_batch(batch_df, batch_id, state_dir, id_col, vec_col)

    q = (
        raw.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(on_batch)
        .start()
    )
    q.awaitTermination()
