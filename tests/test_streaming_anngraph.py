"""Incremental ANN-graph maintenance (VERDICT r11 directive #4):
graph analytics recomputed over the streamed kNN edge state ==
the batch ANN composition bit-identically, replay idempotence at the
GRAPH-METRIC level, and the crash phase the generic chaos matrix
cannot express (vectors committed, topk generation not yet advanced).
The state layer itself (split invariance, edge equality, crash-mid-
commit) is pinned in tests/test_streaming_incremental.py; structure
mirrors tests/test_streaming_linkgraph.py."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from event_data_etl_gcs_spark.operators.graph import (
    bfs_hops,
    knn_edges_ann,
    pagerank_quantized,
    triangle_counts,
)
from event_data_etl_gcs_spark.queries.graph import BFS_MAX_HOPS, PR_ITERS
from event_data_etl_gcs_spark.streaming.anngraph import (
    ann_graph_ingest_batch,
    streamed_bfs_hops_ann,
    streamed_knn_edges,
    streamed_pagerank_ann,
    streamed_triangle_counts_ann,
)
from event_data_etl_gcs_spark.streaming.neardedup import read_knn_topk

SF = "/root/testdata/sf0.001"


def _deliveries(spark, n=3):
    """The embeddings table split into n disjoint deliveries by vec_id."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    return emb, [emb.filter(F.col("vec_id") % n == i) for i in range(n)]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _batch_edges(spark):
    """The uncapped batch build the maintained state is contracted to
    equal (same pinned band geometry as the ingest defaults)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    return knn_edges_ann(
        emb, k=3, band_bits=4, max_bucket=None, ring_cap=None,
        scoring="fold",
    ).select("u", "v")


def _ingest_all(spark, parts, root):
    for bid, part in enumerate(parts):
        ann_graph_ingest_batch(part, bid, root)


def test_streamed_pagerank_equals_batch(spark, tmp_path):
    _, parts = _deliveries(spark)
    root = str(tmp_path / "ag")
    _ingest_all(spark, parts, root)
    got = _rows(streamed_pagerank_ann(spark, root))
    want = _rows(pagerank_quantized(_batch_edges(spark), iterations=PR_ITERS))
    assert got == want and len(got) > 10


def test_streamed_triangles_and_bfs_equal_batch(spark, tmp_path):
    _, parts = _deliveries(spark)
    root = str(tmp_path / "ag")
    _ingest_all(spark, parts, root)
    edges = _batch_edges(spark)
    assert _rows(streamed_triangle_counts_ann(spark, root)) == _rows(
        triangle_counts(edges)
    )
    assert _rows(streamed_bfs_hops_ann(spark, root)) == _rows(
        bfs_hops(edges, max_hops=BFS_MAX_HOPS)
    )


def test_replay_leaves_graph_metrics_unchanged(spark, tmp_path):
    _, parts = _deliveries(spark)
    root = str(tmp_path / "ag")
    _ingest_all(spark, parts, root)
    before_edges = _rows(streamed_knn_edges(spark, root))
    before_pr = _rows(streamed_pagerank_ann(spark, root))
    # foreachBatch replay of the final delivery: same batch_id
    ann_graph_ingest_batch(parts[-1], len(parts) - 1, root)
    assert _rows(streamed_knn_edges(spark, root)) == before_edges
    assert _rows(streamed_pagerank_ann(spark, root)) == before_pr


def test_crash_between_vector_and_topk_writes_then_replay(spark, tmp_path):
    """The knn writer's two-write crash window: vectors/batch_id=N
    committed, the topk generation NOT yet advanced. The generic chaos
    matrix (tests/test_chaos_streaming.py) wipes batch_id partitions
    and cannot express the generation rollback, so the phase is pinned
    here: roll the manifest back (uncommitted gen dirs are garbage by
    contract), replay the crashed delivery, and the final state AND
    graph metrics equal a clean run's."""
    from event_data_etl_gcs_spark.streaming.sketches import STATE_MANIFEST

    _, parts = _deliveries(spark)

    clean = str(tmp_path / "clean")
    _ingest_all(spark, parts, clean)
    want_topk = _rows(read_knn_topk(spark, clean))
    want_pr = _rows(streamed_pagerank_ann(spark, clean))

    root = str(tmp_path / "crash")
    for bid, part in enumerate(parts[:-1]):
        ann_graph_ingest_batch(part, bid, root)
    topk_dir = os.path.join(root, "topk")
    manifest = os.path.join(topk_dir, STATE_MANIFEST)
    saved = open(manifest).read()
    gens_before = {
        n for n in os.listdir(topk_dir) if n.startswith("gen=")
    }
    # the delivery whose topk commit "never happened"
    ann_graph_ingest_batch(parts[-1], len(parts) - 1, root)
    # crash: manifest pointer still on the old generation; the staged
    # new gen dir may or may not exist (cover the worst case: it does
    # not — data write itself torn away)
    with open(manifest, "w") as fh:
        fh.write(saved)
    for n in os.listdir(topk_dir):
        if n.startswith("gen=") and n not in gens_before:
            shutil.rmtree(os.path.join(topk_dir, n))
    # replay converges to the clean state: the batch folds into the OLD
    # topk generation + the already-committed vectors (its own
    # batch_id partition is excluded from 'existing' by the reader)
    ann_graph_ingest_batch(parts[-1], len(parts) - 1, root)
    assert _rows(read_knn_topk(spark, root)) == want_topk
    assert _rows(streamed_pagerank_ann(spark, root)) == want_pr
