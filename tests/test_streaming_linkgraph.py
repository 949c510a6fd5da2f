"""Incremental link-graph maintenance (VERDICT r10 directive #4):
streamed edge-count state == batch aggregate bit-identically, replay
idempotence, compaction fold + torn-compaction recovery on merge-read,
and streamed authority == batch authority. The crash matrix in
tests/test_chaos_streaming.py additionally exercises the writer at
every crash phase."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from event_data_etl_gcs_spark.queries.linkgraph import (
    domain_authority,
    link_graph_edges,
)
from event_data_etl_gcs_spark.sources.catalog import load_table
from event_data_etl_gcs_spark.streaming.compaction import (
    compact_batch_state,
)
from event_data_etl_gcs_spark.streaming.linkgraph import (
    edges_merge,
    linkgraph_ingest_batch,
    read_link_graph_edges,
    run_streaming_linkgraph,
    streamed_domain_authority,
)

SF = "/root/testdata/sf0.001"


def _deliveries(spark, n=3):
    """The documents table split into n disjoint deliveries by doc_id."""
    docs = load_table(spark, SF, "documents")
    return docs, [docs.filter(F.col("doc_id") % n == i) for i in range(n)]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streamed_edges_equal_batch(spark, tmp_path):
    docs, parts = _deliveries(spark)
    root = str(tmp_path / "lg")
    for bid, part in enumerate(parts):
        linkgraph_ingest_batch(part, bid, root)
    got = _rows(read_link_graph_edges(spark, root))
    want = _rows(link_graph_edges(spark, SF))
    assert got == want and len(got) > 0


def test_replay_rewrites_own_partition(spark, tmp_path):
    _, parts = _deliveries(spark)
    root = str(tmp_path / "lg")
    for bid, part in enumerate(parts):
        linkgraph_ingest_batch(part, bid, root)
    before = _rows(read_link_graph_edges(spark, root))
    # foreachBatch replay of the final delivery: same batch_id, same rows
    linkgraph_ingest_batch(parts[-1], len(parts) - 1, root)
    assert _rows(read_link_graph_edges(spark, root)) == before


def test_streamed_frontier_equals_batch(spark, tmp_path):
    from event_data_etl_gcs_spark.queries.linkgraph import crawl_frontier
    from event_data_etl_gcs_spark.streaming.linkgraph import (
        read_crawl_frontier,
    )

    _, parts = _deliveries(spark)
    root = str(tmp_path / "lg")
    for bid, part in enumerate(parts):
        linkgraph_ingest_batch(part, bid, root)
    got = _rows(read_crawl_frontier(spark, root))
    want = _rows(crawl_frontier(spark, SF))
    assert got == want and len(got) > 0


def test_streamed_authority_equals_batch(spark, tmp_path):
    _, parts = _deliveries(spark)
    root = str(tmp_path / "lg")
    for bid, part in enumerate(parts):
        linkgraph_ingest_batch(part, bid, root)
    got = _rows(streamed_domain_authority(spark, root))
    want = _rows(domain_authority(spark, SF))
    assert got == want and len(got) > 10


def test_compaction_folds_and_merge_read_recovers(spark, tmp_path):
    _, parts = _deliveries(spark)
    root = str(tmp_path / "lg")
    for bid, part in enumerate(parts):
        linkgraph_ingest_batch(part, bid, root)
    edges_path = os.path.join(root, "edges")
    want = _rows(read_link_graph_edges(spark, root))

    out = compact_batch_state(spark, edges_path, merge=edges_merge)
    assert sorted(out["covered"]) == [0, 1, 2]
    parts_left = [
        n for n in os.listdir(edges_path) if n.startswith("batch_id=")
    ]
    assert parts_left == ["batch_id=-1"]
    assert _rows(read_link_graph_edges(spark, root)) == want

    # torn compaction: a second fold staged WITH manifest (authoritative),
    # crash before the source-partition deletes — a plain merge-read must
    # repair first (recover_compaction on every read) and agree
    import json

    linkgraph_ingest_batch(parts[0].filter(F.col("doc_id") < 50), 7, root)
    want2 = _rows(read_link_graph_edges(spark, root))
    staging = edges_path + ".compact_staging"
    shutil.rmtree(staging, ignore_errors=True)
    data = os.path.join(staging, "data")
    edges_merge(spark.read.parquet(edges_path).drop("batch_id")).write.parquet(
        data
    )
    with open(os.path.join(staging, "_COMPACT_MANIFEST.json"), "w") as fh:
        json.dump({"covered": [-1, 7]}, fh)
    assert _rows(read_link_graph_edges(spark, root)) == want2
    assert not os.path.exists(staging)
    parts_left = [
        n for n in os.listdir(edges_path) if n.startswith("batch_id=")
    ]
    assert parts_left == ["batch_id=-1"]


def test_available_now_drain(spark, tmp_path):
    docs, _ = _deliveries(spark)
    src = str(tmp_path / "src")
    docs.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    root = str(tmp_path / "lg")
    run_streaming_linkgraph(spark, stream, root)
    got = _rows(read_link_graph_edges(spark, root))
    want = _rows(link_graph_edges(spark, SF))
    assert got == want


def test_empty_state_reads_typed_empty(spark, tmp_path):
    df = read_link_graph_edges(spark, str(tmp_path / "nothing"))
    assert df.columns == ["src_host", "dst_host", "n_links", "n_docs"]
    assert df.count() == 0
