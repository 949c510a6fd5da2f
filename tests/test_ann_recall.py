"""Recall behavior of the reduced-space IVF ANN search (VERDICT r8
directive #5): recall@k must be NON-DECREASING in n_probe.

This is a mathematical property of the composition, not a tuning
accident: the probed cell sets are nested in n_probe, so the candidate
sets are nested, and a true top-k member present in the candidates can
only be displaced by a higher-cosine vector — of which there are at
most rank-1 < k. A routing bug (wrong cell ordering, off-by-one probe
cut, non-deterministic tie-break) breaks the nesting and shows up here
at fixture scale for free."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from event_data_etl_gcs_spark.operators.clustering import K_CLUSTERS
from event_data_etl_gcs_spark.operators.linalg import pca_fit
from event_data_etl_gcs_spark.queries.pca import pca_ivf_topk_frame
from event_data_etl_gcs_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"
N_QUERY, TOP_K = 15, 5


def _truth(emb_pd):
    """Exact cosine top-k per query id < N_QUERY (numpy, independent)."""
    X = np.stack(emb_pd["embedding"].to_numpy()).astype(np.float64)
    ids = emb_pd["vec_id"].to_numpy()
    nrm = np.linalg.norm(X, axis=1)
    keep = nrm > 0
    X, ids, nrm = X[keep], ids[keep], nrm[keep]
    truth = {}
    for qi in range(N_QUERY):
        qpos = np.nonzero(ids == qi)[0]
        if not len(qpos):
            continue
        q = X[qpos[0]]
        cos = (X @ q) / (nrm * np.linalg.norm(q))
        order = sorted(
            ((-cos[i], ids[i]) for i in range(len(ids)) if ids[i] != qi)
        )
        truth[qi] = {nid for _c, nid in order[:TOP_K]}
    return truth


def test_recall_monotone_in_n_probe_and_full_probe_exact(spark):
    emb = load_table(spark, SF, "embeddings")
    qe, _qw, _ = pca_fit(emb)
    truth = _truth(emb.select("vec_id", "embedding").toPandas())

    recalls = []
    for n_probe in range(1, K_CLUSTERS + 1):
        out = pca_ivf_topk_frame(
            emb, qe, n_query=N_QUERY, n_probe=n_probe, top_k=TOP_K
        ).select("query_id", "neighbor_id").collect()
        got: dict[int, set] = {}
        for r in out:
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        hit = sum(len(got.get(q, set()) & t) for q, t in truth.items())
        total = sum(len(t) for t in truth.values())
        recalls.append(hit / total)

    # non-decreasing in n_probe (nested candidate sets)
    for lo, hi in zip(recalls, recalls[1:]):
        assert hi >= lo - 1e-12, recalls
    # probing every cell IS brute force: recall must be exactly 1
    assert recalls[-1] == 1.0, recalls
    # and the documented default (3-of-8) stays above the pinned floor
    assert recalls[2] >= 0.6, recalls
