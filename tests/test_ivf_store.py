"""Persisted IVF index (build-once/search-many) + PCA model lifecycle
(VERDICT r8 directives #3 and #6)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from event_data_etl_gcs_spark.operators.ivf_store import (
    model_version,
    read_manifest,
    search_ivf_index,
    write_ivf_index,
)
from event_data_etl_gcs_spark.operators.linalg import pca_fit, pca_project
from event_data_etl_gcs_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r["query_id"], r["neighbor_id"], r["cos_sim"], r["rank"])
        for r in df.collect()
    )


def _fit(spark):
    emb = load_table(spark, SF, "embeddings")
    qe, qw, _ = pca_fit(emb)
    return emb, qe, qw


def test_persisted_search_bit_identical_to_inline_composition(spark, tmp_path):
    """Searching the persisted index returns bit-for-bit the rows the
    inline build+search composition (pca_ivf_topk) returns — the
    persisted index IS the inline one, written down."""
    from event_data_etl_gcs_spark.queries.pca import pca_ivf_topk_frame

    emb, qe, qw = _fit(spark)
    path = str(tmp_path / "idx")
    write_ivf_index(emb, qe, path, qw=qw)
    queries = emb.filter(F.col("vec_id") < 15)
    got = search_ivf_index(spark, path, queries, qe, qw=qw, top_k=5, n_probe=3)
    want = pca_ivf_topk_frame(emb, qe, n_query=15, n_probe=3, top_k=5)
    assert _rows(got) == _rows(want)


def test_search_scans_only_probed_cells(spark, tmp_path):
    """The search-side index scan must carry a static partition filter
    on cell (probed cells are known driver-side) — the plan's FileScan
    shows PartitionFilters and the unprobed cells cost zero I/O."""
    emb, qe, qw = _fit(spark)
    path = str(tmp_path / "idx")
    write_ivf_index(emb, qe, path, qw=qw)
    queries = emb.filter(F.col("vec_id") < 3)
    out = search_ivf_index(spark, path, queries, qe, qw=qw, n_probe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # static pruning on the partition column of the index scan
    assert "PartitionFilters: [cell" in plan.replace("  ", " "), plan
    # routing side broadcasts into the candidate join; the index scan is
    # never shuffled on cell (the r8 pca_ivf_topk fix, persisted form)
    assert "SortMergeJoin" not in plan, plan
    assert "Exchange hashpartitioning(cell" not in plan, plan


def test_model_version_content_addressed():
    qe = [[1, 2, 3], [4, 5, 6]]
    qw = [7, 8]
    v1 = model_version(qe, qw)
    assert v1 == model_version([[1, 2, 3], [4, 5, 6]], [7, 8])
    assert v1 != model_version([[1, 2, 4], [4, 5, 6]], [7, 8])  # qe change
    assert v1 != model_version(qe, [7, 9])  # qw change
    assert v1 != model_version(qe)  # missing qw


def test_version_mismatch_fails_loudly(spark, tmp_path):
    """A consumer holding model-N literals must not silently search an
    index built under model N+1 (VERDICT r8 #6)."""
    emb, qe, qw = _fit(spark)
    path = str(tmp_path / "idx")
    write_ivf_index(emb, qe, path, qw=qw)
    queries = emb.filter(F.col("vec_id") < 3)
    stale = [list(row) for row in qe]
    stale[0][0] += 1  # a refit that moved one component
    with pytest.raises(ValueError, match="version mismatch"):
        search_ivf_index(spark, path, queries, stale, qw=qw)
    # missing manifest is equally loud
    with pytest.raises(FileNotFoundError):
        search_ivf_index(spark, str(tmp_path / "nope"), queries, qe, qw=qw)


def test_streamed_refresh_reprojects_bit_identical_to_batch(spark, tmp_path):
    """Model lifecycle pin (VERDICT r8 #6): after a streamed Gram
    refresh, the refreshed model (a) carries the SAME version as a
    from-scratch batch refit (bit-identical ints -> same content
    address) and (b) reprojects the corpus bit-identically to the batch
    model — so an index rebuilt from the streamed model serves exactly
    the batch answers."""
    from event_data_etl_gcs_spark.streaming.linalg import (
        gram_maintain_batch,
        streamed_pca_fit,
    )

    emb, qe_b, qw_b = _fit(spark)
    state = str(tmp_path / "gram")
    n = emb.count()
    gram_maintain_batch(emb.filter(F.col("vec_id") < n // 2), 0, state)
    gram_maintain_batch(emb.filter(F.col("vec_id") >= n // 2), 1, state)
    qe_s, qw_s, _ = streamed_pca_fit(spark, state)
    assert model_version(qe_s, qw_s) == model_version(qe_b, qw_b)
    proj_s = pca_project(emb, qe_s, qw_s).toPandas()
    proj_b = pca_project(emb, qe_b, qw_b).toPandas()
    key = ["vec_id", "component"]
    a = proj_s.sort_values(key).reset_index(drop=True)
    b = proj_b.sort_values(key).reset_index(drop=True)
    assert np.array_equal(a["proj"].values, b["proj"].values)
    assert np.array_equal(a["whitened"].values, b["whitened"].values)


def test_append_equals_fresh_full_build(spark, tmp_path):
    """build(half) + append(half) == build(all): frozen centroids make
    assignment per-vector, so the persisted index rows are identical —
    BUT ONLY when the build-side centroids come from the same seed set.
    We build on the FULL corpus's seed prefix both times by building on
    a half that contains the k smallest vec_ids (initial_centroids'
    seed rule), then searching both indexes returns identical rows."""
    from event_data_etl_gcs_spark.operators.ivf_store import append_ivf_index

    emb, qe, qw = _fit(spark)
    n = emb.count()
    half_a = emb.filter(F.col("vec_id") < n // 2)  # holds the seed prefix
    half_b = emb.filter(F.col("vec_id") >= n // 2)

    p_inc = str(tmp_path / "inc")
    write_ivf_index(half_a, qe, p_inc, qw=qw)
    m = append_ivf_index(half_b, p_inc, qe, qw=qw)

    p_full = str(tmp_path / "full")
    m_full = write_ivf_index(emb, qe, p_full, qw=qw)

    # identical manifests (n_rows) — but the seed centroids differ only
    # if half_a lacked the k smallest ids, which it doesn't
    assert m["n_rows"] == m_full["n_rows"]
    inc_rows = sorted(
        tuple(r)
        for r in spark.read.parquet(p_inc + "/index")
        .select("vec_id", "cell", "nrm")
        .collect()
    )
    full_rows = sorted(
        tuple(r)
        for r in spark.read.parquet(p_full + "/index")
        .select("vec_id", "cell", "nrm")
        .collect()
    )
    assert inc_rows == full_rows
    # and the search over the appended index matches the fresh build
    queries = emb.filter(F.col("vec_id") < 5)
    got = search_ivf_index(spark, p_inc, queries, qe, qw=qw)
    want = search_ivf_index(spark, p_full, queries, qe, qw=qw)
    assert _rows(got) == _rows(want)


def test_append_version_mismatch_fails_loudly(spark, tmp_path):
    from event_data_etl_gcs_spark.operators.ivf_store import append_ivf_index

    emb, qe, qw = _fit(spark)
    path = str(tmp_path / "idx")
    write_ivf_index(emb, qe, path, qw=qw)
    stale = [list(row) for row in qe]
    stale[0][0] += 1
    with pytest.raises(ValueError, match="version mismatch"):
        append_ivf_index(emb.limit(3), path, stale, qw=qw)


def test_refit_on_changed_corpus_changes_version(spark, tmp_path):
    """A model refitted after the corpus changed gets a NEW version, so
    an old index + new model (or vice versa) cannot silently mix."""
    emb, qe, qw = _fit(spark)
    path = str(tmp_path / "idx")
    write_ivf_index(emb, qe, path, qw=qw)
    grown = emb.select("vec_id", "embedding").union(
        emb.select((F.col("vec_id") + 1_000_000).alias("vec_id"),
                   F.reverse("embedding").alias("embedding"))
    )
    qe2, qw2, _ = pca_fit(grown)
    assert model_version(qe2, qw2) != read_manifest(path)["model_version"]
    with pytest.raises(ValueError, match="version mismatch"):
        search_ivf_index(
            spark, path, emb.filter(F.col("vec_id") < 3), qe2, qw=qw2
        )
