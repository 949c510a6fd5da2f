"""Streaming (greedy-online) semantic dedup: decisions are invariant to
how the corpus is split into deliveries, match a sequential numpy
reference, replay idempotently, and diverge from the batch
argmin-centroid-cos policy exactly the documented way."""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
from pyspark.sql import functions as F

from event_data_etl_gcs_spark.operators.clustering import assign_clusters
from event_data_etl_gcs_spark.streaming.semdedup import (
    SEM_K,
    SEM_THRESHOLD,
    read_semdedup_decisions,
    run_streaming_semdedup,
    semdedup_ingest_batch,
)

SF = "/root/testdata/sf0.001"


def _stage_files(spark, emb, emb_dir: str, n_files: int) -> None:
    os.makedirs(emb_dir, exist_ok=True)
    ids = sorted(r[0] for r in emb.select("vec_id").collect())
    bounds = [ids[i * len(ids) // n_files] for i in range(n_files)] + [ids[-1] + 1]
    for i in range(n_files):
        part = emb.filter(
            (F.col("vec_id") >= bounds[i]) & (F.col("vec_id") < bounds[i + 1])
        ).coalesce(1)
        tmpd = os.path.join(emb_dir, f"_w{i}")
        part.write.mode("overwrite").parquet(tmpd)
        src = glob.glob(os.path.join(tmpd, "part-*.parquet"))[0]
        dst = os.path.join(emb_dir, f"{i:05d}.parquet")
        shutil.move(src, dst)
        shutil.rmtree(tmpd)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))


def _decisions(spark, index_dir):
    return {
        r["id"]: (r["cluster_id"], r["kept"])
        for r in read_semdedup_decisions(spark, index_dir).collect()
    }


def _numpy_reference(spark, emb, cent_df, threshold):
    """Sequential greedy in vec_id order, per engine-assigned cluster."""
    assign = {
        r["vec_id"]: r["cluster_id"]
        for r in assign_clusters(emb, cent_df).collect()
    }
    rows = sorted(
        (r["vec_id"], np.array(r["embedding"], np.float64))
        for r in emb.collect()
    )
    accepted: dict[int, list[np.ndarray]] = {}
    out = {}
    for vid, v in rows:
        n = float(np.sqrt(np.dot(v, v)))
        if n == 0:
            continue
        u = v / n
        cid = assign[vid]
        kept = not any(
            float(np.dot(a, u)) >= threshold for a in accepted.get(cid, [])
        )
        out[vid] = (cid, int(kept))
        if kept:
            accepted.setdefault(cid, []).append(u)
    return out


def test_streamed_matches_sequential_reference_and_split_invariance(
    spark, tmp_path
):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    emb_dir = str(tmp_path / "emb3")
    idx3 = str(tmp_path / "idx3")
    _stage_files(spark, emb, emb_dir, 3)
    run_streaming_semdedup(spark, emb_dir, idx3, str(tmp_path / "cp3"))
    got3 = _decisions(spark, idx3)

    # single delivery over the identical corpus
    emb_dir1 = str(tmp_path / "emb1")
    idx1 = str(tmp_path / "idx1")
    _stage_files(spark, emb, emb_dir1, 1)
    run_streaming_semdedup(spark, emb_dir1, idx1, str(tmp_path / "cp1"))
    got1 = _decisions(spark, idx1)
    assert got3 == got1  # batch-decomposition invariance

    cent_df = spark.read.parquet(os.path.join(idx3, "centroids"))
    want = _numpy_reference(spark, emb, cent_df, SEM_THRESHOLD)
    assert got3 == want

    # exactly one decision per nonzero-norm vector
    n_nonzero = len(want)
    assert len(got3) == n_nonzero
    # every cluster with a duplicate family kept at least one member
    kept_per_cluster = {}
    for cid, kept in got3.values():
        kept_per_cluster[cid] = kept_per_cluster.get(cid, 0) + kept
    assert all(v >= 1 for v in kept_per_cluster.values())


def test_replay_is_idempotent(spark, tmp_path):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    emb_dir = str(tmp_path / "emb")
    idx = str(tmp_path / "idx")
    _stage_files(spark, emb, emb_dir, 2)
    run_streaming_semdedup(spark, emb_dir, idx, str(tmp_path / "cp"))
    want = _decisions(spark, idx)
    n_members = spark.read.parquet(os.path.join(idx, "members")).count()

    # redeliver the LAST batch (batch_id=1): state must not change
    last = spark.read.parquet(os.path.join(emb_dir, "00001.parquet"))
    semdedup_ingest_batch(last, 1, idx)
    assert _decisions(spark, idx) == want
    assert spark.read.parquet(os.path.join(idx, "members")).count() == n_members


def test_greedy_keeps_first_arrival_not_argmin_centroid(spark, tmp_path):
    """Documented divergence from batch semdedup_keep: in a duplicate
    pair the ONLINE rule keeps the first-arrived member even when the
    batch policy would keep the other (lower centroid-cos)."""
    dim = 8
    # centroid seeds: ids 0..7 (SEM_K), one per axis — mutually orthogonal
    rows = []
    for i in range(SEM_K):
        v = [0.0] * dim
        v[i] = 1.0
        rows.append((i, v))
    # a duplicate pair on the diagonal (cos vs any axis seed = 1/sqrt(8)
    # = 0.354 < 0.9, so neither collides with a seed): 100 arrives
    # first and wins under the online rule even when the batch
    # argmin-centroid-cos policy would pick 101 (slightly more novel).
    rows.append((100, [1.0] * dim))
    rows.append((101, [1.0] * 7 + [0.8]))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    idx = str(tmp_path / "idx")
    semdedup_ingest_batch(emb, 0, idx, threshold=0.9)
    got = _decisions(spark, idx)
    assert got[100][1] == 1 and got[101][1] == 0
