"""IVF retrain actuator (VERDICT r9 directive #4): stats thresholds
trigger a centroid rebuild + cell reassignment installed as a new
index version — deterministic, crash-safe, bit-identical to a fresh
refined build over the same live rows."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from event_data_etl_gcs_spark.operators.ivf_store import (
    append_ivf_index,
    ivf_index_stats,
    read_manifest,
    recover_retrain,
    retrain_ivf_index,
    search_ivf_index,
    write_ivf_index,
)
from event_data_etl_gcs_spark.operators.linalg import pca_fit
from event_data_etl_gcs_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _fit(spark):
    emb = load_table(spark, SF, "embeddings")
    qe, qw, _ = pca_fit(emb)
    return emb, qe, qw


def _drift(spark, emb, n=600, start=100_000):
    """A burst of near-duplicate vectors around one existing embedding:
    they all route to a single cell, making it hot."""
    base = emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]
    rows = [
        (start + i, [float(v) + 0.001 * ((i % 7) + 1) for v in base])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _index_rows(spark, path):
    df = spark.read.parquet(os.path.join(path, "index"))
    return sorted(
        (r["vec_id"], r["cell"], tuple(r["embedding"]), r["nrm"])
        for r in df.collect()
    )


def _cent_rows(spark, path):
    df = spark.read.parquet(os.path.join(path, "centroids"))
    return sorted((r["cid"], tuple(r["cvec"])) for r in df.collect())


def test_retrain_triggers_on_hot_cell_and_matches_fresh_build(spark, tmp_path):
    emb, qe, qw = _fit(spark)
    path = str(tmp_path / "idx")
    write_ivf_index(emb, qe, path, qw=qw)
    drift = _drift(spark, emb)
    append_ivf_index(drift, path, qe, qw=qw)
    before = ivf_index_stats(spark, path)
    assert before["max_cell_fraction"] > 0.3, before  # drift made a hot cell

    out = retrain_ivf_index(spark, path, qe, qw=qw, lloyd_iters=2)
    assert out["retrained"] is True and "max_cell_fraction" in out["trigger"]
    assert out["index_version"] == 2

    after = ivf_index_stats(spark, path)
    assert after["index_version"] == 2
    assert after["max_cell_fraction"] < before["max_cell_fraction"], (
        before,
        after,
    )

    # bit-identity: a fresh Lloyd-refined build over the same live rows
    fresh = str(tmp_path / "fresh")
    live = emb.select("vec_id", "embedding").unionByName(drift)
    write_ivf_index(live, qe, fresh, qw=qw, lloyd_iters=2)
    assert _index_rows(spark, path) == _index_rows(spark, fresh)
    assert _cent_rows(spark, path) == _cent_rows(spark, fresh)

    # the retrained index searches under the SAME model version
    queries = emb.filter(F.col("vec_id") < 3)
    assert search_ivf_index(spark, path, queries, qe, qw=qw).count() > 0


def test_retrain_noop_below_thresholds(spark, tmp_path):
    emb, qe, qw = _fit(spark)
    path = str(tmp_path / "idx")
    write_ivf_index(emb, qe, path, qw=qw)
    healthy = ivf_index_stats(spark, path)
    out = retrain_ivf_index(
        spark,
        path,
        qe,
        qw=qw,
        max_cell_fraction=healthy["max_cell_fraction"] + 0.01,
        max_imbalance=healthy["imbalance"] + 0.01,
    )
    assert out["retrained"] is False and out["trigger"] == []
    assert read_manifest(path)["index_version"] == 1


def test_retrain_rejects_model_mismatch(spark, tmp_path):
    emb, qe, qw = _fit(spark)
    path = str(tmp_path / "idx")
    write_ivf_index(emb, qe, path, qw=qw)
    bad = [list(row) for row in qe]
    bad[0][0] += 1
    with pytest.raises(ValueError, match="model version mismatch"):
        retrain_ivf_index(spark, path, bad, qw=qw, force=True)


@pytest.mark.parametrize("crash", ["pre_manifest", "pre_install", "mid_install"])
def test_retrain_install_crash_recovery(spark, tmp_path, crash):
    """Torn retrain installs repair on the next lifecycle call: staging
    without a manifest is dropped (old index intact); staging with a
    manifest is authoritative and finishes installing."""
    emb, qe, qw = _fit(spark)
    path = str(tmp_path / "idx")
    write_ivf_index(emb, qe, path, qw=qw)
    v1_rows = _index_rows(spark, path)

    staging = os.path.join(path, ".retrain_staging")
    if crash == "pre_manifest":
        # phase 1 interrupted: no manifest yet -> must drop, keep v1
        os.makedirs(os.path.join(staging, "index"), exist_ok=True)
        with open(os.path.join(staging, "index", "junk"), "w") as fh:
            fh.write("incomplete")
        assert recover_retrain(path) == "dropped"
        assert _index_rows(spark, path) == v1_rows
        assert read_manifest(path)["index_version"] == 1
        return

    # stage a complete refined build (manifest last — write_ivf_index's
    # own ordering), as retrain does just before installing
    write_ivf_index(emb, qe, staging, qw=qw, lloyd_iters=2, index_version=2)
    want_rows = _index_rows(spark, staging)
    if crash == "mid_install":
        # simulate a crash after the index piece moved but before
        # centroids/manifest: displaced old index left behind
        os.rename(
            os.path.join(path, "index"),
            os.path.join(path, "index.retrain_old"),
        )
        os.rename(os.path.join(staging, "index"), os.path.join(path, "index"))
    # READ-ONLY entry points must NOT repair (concurrent-reader rename
    # race, ADVICE r10 #2): they detect the torn install and raise
    with pytest.raises(RuntimeError, match="torn retrain install"):
        ivf_index_stats(spark, path)
    with pytest.raises(RuntimeError, match="torn retrain install"):
        search_ivf_index(
            spark, path, emb.filter(F.col("vec_id") < 3), qe, qw=qw
        )
    # a WRITE-path entry (or explicit recovery) completes the install
    assert recover_retrain(path) in ("completed", "clean")
    stats = ivf_index_stats(spark, path)
    assert stats["index_version"] == 2
    assert not os.path.isdir(staging)
    assert not os.path.isdir(os.path.join(path, "index.retrain_old"))
    assert _index_rows(spark, path) == want_rows
    queries = emb.filter(F.col("vec_id") < 3)
    assert search_ivf_index(spark, path, queries, qe, qw=qw).count() > 0
