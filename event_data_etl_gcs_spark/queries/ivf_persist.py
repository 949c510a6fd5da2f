"""Persisted-IVF-index queries: build-once / search-many (VERDICT r8
directive #3).

``pca_ivf_topk`` measures the whole build+search composition in one
plan; real ANN serving builds the inverted file ONCE and answers every
later query from the persisted, cell-partitioned parquet. This module
registers that capability with the SAME exact oracle: the persisted
index is deterministic (pinned seed centroids, quantized-exact
projection, lower-cell tie-breaks), so a search over it returns
bit-for-bit the rows the inline composition returns — the oracle SQL is
literally shared with ``pca_ivf_topk``.

The index is content-addressed by (corpus fingerprint, model version):
a rewritten corpus or a refitted PCA model gets a fresh build, and a
stale mix fails loudly inside ``search_ivf_index`` (model lifecycle,
VERDICT r8 directive #6).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ivf_store import (
    model_version,
    read_manifest,
    search_ivf_index,
    write_ivf_index,
)
from ..sources.catalog import load_table
from .pca import (
    _PCA_IVF_N_PROBE,
    _PCA_IVF_N_QUERY,
    _PCA_IVF_TOP_K,
    _corpus_fingerprint,
    _fit_spark,
    _pca_ivf_topk_oracle,
)
from .registry import query


def ensure_ivf_index(spark: SparkSession, sf_dir: str) -> str:
    """Path of the persisted index for this corpus+model, building it on
    first use. Content-addressed: (sf_dir, corpus fingerprint, model
    version) -> a stable directory under the system tempdir, so repeat
    queries in any process reuse the build (the manifest's version check
    guards against a stale directory from a different model)."""
    qe, qw = _fit_spark(spark, sf_dir)
    ver = model_version(qe, qw)
    key = hashlib.sha256(
        repr((os.path.abspath(sf_dir), _corpus_fingerprint(sf_dir), ver)).encode()
    ).hexdigest()[:24]
    path = os.path.join(tempfile.gettempdir(), "spark_graft_ivf", key)
    m = read_manifest(path)
    if m is None or m["model_version"] != ver:
        emb = load_table(spark, sf_dir, "embeddings")
        write_ivf_index(emb, qe, path, qw=qw)
    return path


@query(
    "ivf_persisted_topk",
    oracle=_pca_ivf_topk_oracle,
    doc=(
        "Top-k ANN answered from a PERSISTED cell-partitioned IVF index "
        "— the build-once/search-many production shape: the inverted "
        "file (vec_id, embedding, nrm, cell) lives as parquet "
        "partitioned by cell with the centroid table and a versioned "
        "model manifest beside it; a search projects the queries into "
        "the PCA subspace, routes to the n_probe nearest persisted "
        "centroids, scans ONLY the probed cells (static partition "
        "filter — unprobed cells cost zero I/O), and re-ranks by exact "
        "64-dim cosine. Deterministic build -> the search shares "
        "pca_ivf_topk's exact oracle verbatim; a model-version mismatch "
        "between the caller and the index fails loudly."
    ),
)
def ivf_persisted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = ensure_ivf_index(spark, sf_dir)
    qe, qw = _fit_spark(spark, sf_dir)
    queries = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < _PCA_IVF_N_QUERY
    )
    return search_ivf_index(
        spark,
        path,
        queries,
        qe,
        qw=qw,
        top_k=_PCA_IVF_TOP_K,
        n_probe=_PCA_IVF_N_PROBE,
    )
