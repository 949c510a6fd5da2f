"""Streaming semantic dedup: greedy online SemDeDup over an embedding
stream.

The batch operator (operators/clustering.semdedup_keep) answers "which
vectors of THIS corpus are semantic duplicates" with the paper's
argmin-centroid-cos policy; an ingest pipeline asks the online form:
"is THIS new embedding a semantic duplicate of anything already
ACCEPTED?" — continuously, without rescanning the corpus. This module
is the greedy-online-clustering posture (the ``index_mode="survivors"``
analog of streaming/corpus.py, which is the standard production ingest
stance): per cluster, a new vector is dropped iff some already-accepted
vector of the same cluster clears the cosine threshold; accepted
vectors join the persisted index.

Semantics vs batch (documented divergence, pinned by test):
  * batch semdedup_keep keeps the argmin-centroid-cos member of each
    duplicate clique; the online rule keeps the FIRST-ARRIVED member.
    Both keep exactly one per clique; WHICH one differs.
  * chains (a~b, b~c, a!~c): batch prunes b and possibly c; online
    keeps a, drops b (vs a), then KEEPS c (its only witness b was
    never accepted) — the greedy property that per-delivery cost stays
    flat (each family has one indexed rep).

Replay safety: member/decision state is partitioned by batch_id and
written with dynamic partition overwrite; a replayed batch overwrites
its own partitions and reads state as ``batch_id != current`` — the
corpus-ingest pattern. The centroid table is derived deterministically
from the first delivery (k smallest-id nonzero vectors) and committed
once; a crash before the commit re-derives the identical table.

Scale posture: centroids are k rows (broadcast); the index is read
cluster-pruned only for clusters the batch touches (a semi-join on
cluster_id reaches the parquet scan as partition/row-group pruning when
the state is written bucketed by cluster); the greedy scan itself is a
cogrouped Arrow kernel whose per-cluster cost is |new| x |accepted|
numpy dot products — and |accepted| per cluster is bounded by the
dedup itself (duplicate families never add members).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.clustering import assign_clusters, initial_centroids
from ..operators.similarity import norm_sql
from .corpus import _append_state, _read_state_parts

SEM_MEMBER_SCHEMA = (
    "id LONG, cluster_id BIGINT, v ARRAY<FLOAT>, nrm DOUBLE, batch_id LONG"
)
SEM_DECISION_SCHEMA = "id LONG, cluster_id BIGINT, kept INT, batch_id LONG"
SEM_K = 8  # matches operators.clustering.K_CLUSTERS conformance scale
SEM_THRESHOLD = 0.4  # matches SEMDEDUP_THRESHOLD


def _nonzero(batch_df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return (
        batch_df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            F.expr(norm_sql(vec_col)).alias("nrm"),
        )
        .filter(F.col("nrm") > 0)
    )


def _ensure_centroids(
    base: DataFrame, cent_path: str, k: int
) -> DataFrame | None:
    """Committed centroid table, deriving it from ``base`` on first use.

    Never commits an EMPTY table: if the first delivery carries zero
    nonzero-norm vectors, the commit is deferred to the first batch
    that actually has some — an empty committed table would silently
    assign no clusters to every later batch, dropping all vectors from
    decisions with no error (ADVICE r7). Returns None when centroids
    cannot be derived yet (caller skips the batch)."""
    spark = base.sparkSession
    if not os.path.exists(os.path.join(cent_path, "_SUCCESS")):
        cand = initial_centroids(base, k, id_col="id", vec_col="v")
        cand = cand.localCheckpoint(eager=True)
        if cand.isEmpty():
            return None
        cand.write.mode("overwrite").parquet(cent_path)
    cent = spark.read.parquet(cent_path)
    if cent.isEmpty():  # legacy bad commit: fail loud, never drop silently
        raise RuntimeError(
            f"committed centroid table at {cent_path!r} is empty; remove it "
            "so the next nonempty batch re-derives centroids"
        )
    return cent


def _greedy_cluster_scan(new_mv: DataFrame, acc_mv: DataFrame, threshold: float):
    """Cogrouped Arrow kernel: per cluster, scan new rows in id order and
    keep each iff its max cosine against (accepted ∪ earlier kept new)
    stays below threshold."""
    import numpy as np
    import pandas as pd

    def fn(new_pdf: pd.DataFrame, acc_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(new_pdf) == 0:
            return pd.DataFrame(
                {
                    "id": pd.Series(dtype="int64"),
                    "cluster_id": pd.Series(dtype="int64"),
                    "kept": pd.Series(dtype="int32"),
                }
            )
        cid = int(new_pdf["cluster_id"].iloc[0])
        order = np.argsort(new_pdf["id"].to_numpy(np.int64), kind="mergesort")
        ids = new_pdf["id"].to_numpy(np.int64)[order]
        U = np.stack(new_pdf["v"].to_numpy())[order].astype(np.float64)
        U /= new_pdf["nrm"].to_numpy(np.float64)[order][:, None]
        if len(acc_pdf):
            A = np.stack(acc_pdf["v"].to_numpy()).astype(np.float64)
            A /= acc_pdf["nrm"].to_numpy(np.float64)[:, None]
            rows = [a for a in A]
        else:
            rows = []
        kept = np.zeros(len(ids), np.int32)
        for i in range(len(ids)):
            u = U[i]
            dup = any(float(np.dot(r, u)) >= threshold for r in rows)
            if not dup:
                kept[i] = 1
                rows.append(u)
        return pd.DataFrame({"id": ids, "cluster_id": cid, "kept": kept})

    return (
        new_mv.groupBy("cluster_id")
        .cogroup(acc_mv.groupBy("cluster_id"))
        .applyInPandas(fn, schema="id long, cluster_id long, kept int")
    )


def semdedup_ingest_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    threshold: float = SEM_THRESHOLD,
    k: int = SEM_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """One increment: keep/drop decisions for ``batch_df`` against the
    persisted accepted-member index, then index append (kept rows only)."""
    spark = batch_df.sparkSession
    cent_path = os.path.join(index_dir, "centroids")
    mem_path = os.path.join(index_dir, "members")
    dec_path = os.path.join(index_dir, "decisions")

    base = _nonzero(batch_df, id_col, vec_col)
    cent = _ensure_centroids(base, cent_path, k)
    if cent is None:
        # No centroids derivable yet (all-zero batch before any commit):
        # the batch has no nonzero vectors to decide on — skip it.
        return
    assign = assign_clusters(base, F.broadcast(cent), id_col="id", vec_col="v")
    # assign_clusters emits (vec_id, cluster_id, sqdist) regardless of id_col
    new_mv = base.join(
        assign.select(F.col("vec_id").alias("id"), "cluster_id"), "id"
    ).select(
        "id", F.col("cluster_id").cast("bigint").alias("cluster_id"), "v", "nrm"
    )
    # prune the index read to clusters this batch touches
    touched = new_mv.select("cluster_id").distinct()
    existing = _read_state_parts(spark, mem_path, SEM_MEMBER_SCHEMA, batch_id)
    if existing is not None:
        acc_mv = existing.join(F.broadcast(touched), "cluster_id").select(
            "id", "cluster_id", "v", "nrm"
        )
    else:
        acc_mv = spark.createDataFrame(
            [], "id LONG, cluster_id BIGINT, v ARRAY<FLOAT>, nrm DOUBLE"
        )
    decisions = _greedy_cluster_scan(new_mv, acc_mv, threshold)
    # one deterministic materialization: decisions feed both sinks
    decisions = decisions.localCheckpoint(eager=True)
    kept_rows = new_mv.join(
        decisions.filter(F.col("kept") == 1).select("id"), "id"
    ).select("id", "cluster_id", "v", "nrm")
    _append_state(kept_rows, mem_path, batch_id)
    _append_state(
        decisions.select("id", "cluster_id", F.col("kept").cast("int").alias("kept")),
        dec_path,
        batch_id,
    )


def run_streaming_semdedup(
    spark: SparkSession,
    emb_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    threshold: float = SEM_THRESHOLD,
    k: int = SEM_K,
    max_files_per_trigger: int = 1,
) -> None:
    """Drain an embeddings backlog through the online semantic-dedup
    check (Available-Now; re-runs process only new files)."""
    schema = spark.read.parquet(emb_dir).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(emb_dir)
    )

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        semdedup_ingest_batch(
            batch_df, batch_id, index_dir, threshold=threshold, k=k
        )

    q = (
        raw.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(on_batch)
        .start()
    )
    q.awaitTermination()


def read_semdedup_decisions(spark: SparkSession, index_dir: str) -> DataFrame:
    """(id, cluster_id, kept, batch_id): every decision made so far."""
    return spark.read.parquet(os.path.join(index_dir, "decisions"))
