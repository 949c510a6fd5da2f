"""Regression pins for the five ADVICE r10 findings:

1. (medium) delete_from_ivf_index runs retrain recovery FIRST, and
   recover_retrain's completed-install branch PRESERVES a tombstone
   log instead of deleting it — the crash sequence retrain-crash ->
   delete -> next lifecycle call must NOT resurrect the deleted
   vectors.
2. read-only entry points (search/stats) never repair a torn retrain
   install: they raise (rename-race safety for concurrent readers).
   The raise itself is pinned in test_ivf_retrain.py; here we pin
   that a torn install leaves the filesystem untouched by readers.
3. pagerank / pagerank_quantized on an EMPTY edge list return a typed
   empty frame instead of raising ZeroDivisionError (reachable via
   domain_authority on a corpus with no external links).
4. the whitespace regex class is spelled explicitly in both dialects:
   a document containing a vertical tab (\\x0B — inside Java's \\s but
   outside RE2's) extracts IDENTICALLY in Spark and DuckDB.
5. release_ann_caches(all_threads=True) reclaims intermediates cached
   by a DIFFERENT thread's build (the thread-local-only form silently
   no-opped for cross-thread teardown).
"""

from __future__ import annotations

import os
import threading

import pandas as pd
import pytest
from pyspark.sql import functions as F

from event_data_etl_gcs_spark.operators.graph import (
    pagerank,
    pagerank_quantized,
)
from event_data_etl_gcs_spark.operators.ivf_store import (
    delete_from_ivf_index,
    ivf_index_stats,
    read_manifest,
    recover_retrain,
    search_ivf_index,
    write_ivf_index,
)
from event_data_etl_gcs_spark.operators.linalg import pca_fit
from event_data_etl_gcs_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------
# 1. torn-retrain + delete: no resurrection
# ---------------------------------------------------------------------


def _staged_torn_retrain(spark, tmp_path):
    """Build an index, stage a complete retrain (manifest written =
    authoritative), and 'crash' before the install."""
    emb = load_table(spark, SF, "embeddings")
    qe, qw, _ = pca_fit(emb)
    path = str(tmp_path / "idx")
    write_ivf_index(emb, qe, path, qw=qw)
    staging = os.path.join(path, ".retrain_staging")
    write_ivf_index(emb, qe, staging, qw=qw, lloyd_iters=2, index_version=2)
    return emb, qe, qw, path


def test_delete_after_torn_retrain_does_not_resurrect(spark, tmp_path):
    emb, qe, qw, path = _staged_torn_retrain(spark, tmp_path)
    dead = [0, 1, 2]
    # delete is a WRITE path: it must complete the staged install FIRST,
    # so the tombstones land against the index that will serve reads
    manifest = delete_from_ivf_index(spark, path, dead)
    assert manifest["n_tombstones"] == 3
    assert read_manifest(path)["index_version"] == 2  # install completed
    assert not os.path.isdir(os.path.join(path, ".retrain_staging"))
    hits = (
        search_ivf_index(
            spark, path, emb.filter(F.col("vec_id") < 10), qe, qw=qw, top_k=50
        )
        .filter(F.col("neighbor_id").isin(dead))
        .count()
    )
    assert hits == 0, "tombstoned vectors resurrected after torn retrain"


def test_recover_retrain_preserves_tombstone_log(spark, tmp_path):
    """Even if a tombstone log somehow coexists with a staged install
    (defense in depth beyond the delete-path fix), completing the
    install must PRESERVE the log: it can only contain post-staging
    deletes, which are not folded into the staged index."""
    emb, qe, qw, path = _staged_torn_retrain(spark, tmp_path)
    # simulate the pre-fix hazard: a delete log written against the old
    # live index while the staged install is pending
    spark.createDataFrame([(5,), (6,)], "vec_id long").write.mode(
        "append"
    ).parquet(os.path.join(path, "tombstones"))
    assert recover_retrain(path) == "completed"
    assert os.path.isdir(os.path.join(path, "tombstones"))
    stats = ivf_index_stats(spark, path)
    assert stats["index_version"] == 2
    assert stats["n_tombstones"] == 2
    hits = (
        search_ivf_index(
            spark, path, emb.filter(F.col("vec_id") < 10), qe, qw=qw, top_k=50
        )
        .filter(F.col("neighbor_id").isin([5, 6]))
        .count()
    )
    assert hits == 0


# ---------------------------------------------------------------------
# 2. readers leave a torn install untouched
# ---------------------------------------------------------------------


def test_readers_do_not_mutate_torn_install(spark, tmp_path):
    _, qe, qw, path = _staged_torn_retrain(spark, tmp_path)
    staging = os.path.join(path, ".retrain_staging")
    before = sorted(os.listdir(path)), sorted(os.listdir(staging))
    with pytest.raises(RuntimeError, match="torn retrain install"):
        ivf_index_stats(spark, path)
    assert (sorted(os.listdir(path)), sorted(os.listdir(staging))) == before
    assert read_manifest(path)["index_version"] == 1  # live manifest intact


# ---------------------------------------------------------------------
# 3. empty-edge PageRank
# ---------------------------------------------------------------------


def test_pagerank_empty_edges(spark):
    empty = spark.createDataFrame([], "u long, v long")
    pq = pagerank_quantized(empty)
    assert pq.columns == ["node", "pr_scaled", "pagerank"]
    assert pq.count() == 0
    pf = pagerank(empty)
    assert pf.columns == ["node", "pagerank"]
    assert pf.count() == 0


# ---------------------------------------------------------------------
# 4. vertical tab: Spark extraction == DuckDB extraction
# ---------------------------------------------------------------------


def test_vertical_tab_whitespace_bit_exact(spark, duck):
    from event_data_etl_gcs_spark.operators.html import (
        blocks_sql,
        duck_blocks,
        duck_extracted_text,
        extracted_text_sql,
    )

    html = (
        "<html><body><p>alpha\x0bbeta gamma delta epsilon zeta eta "
        "theta iota kappa lambda</p><p>short</p></body></html>"
    )
    sdf = spark.createDataFrame([(html,)], "html string")
    got_spark = sdf.select(
        F.expr(extracted_text_sql(blocks_sql("html"))).alias("t")
    ).collect()[0]["t"]
    duck.register("vt_doc", pd.DataFrame({"html": [html]}))
    got_duck = duck.execute(
        f"SELECT {duck_extracted_text(duck_blocks('html'))} AS t FROM vt_doc"
    ).fetchone()[0]
    duck.unregister("vt_doc")
    assert got_spark == got_duck
    # \x0B must collapse like any whitespace, not survive into the text
    assert "\x0b" not in got_spark and "alpha beta" in got_spark


# ---------------------------------------------------------------------
# 5. cross-thread cache release
# ---------------------------------------------------------------------


def test_release_ann_caches_all_threads(spark):
    from event_data_etl_gcs_spark.operators.graph import (
        knn_edges_ann,
        release_ann_caches,
    )

    emb = load_table(spark, SF, "embeddings").limit(64)
    tracked: list = []
    err: list = []

    def build():
        try:
            from event_data_etl_gcs_spark.operators import graph as g

            knn_edges_ann(emb, k=2, band_bits=4).count()
            tracked.extend(getattr(g._ANN_CACHES, "frames", []) or [])
        except Exception as e:  # pragma: no cover - surfaced below
            err.append(e)

    t = threading.Thread(target=build)
    t.start()
    t.join()
    assert not err, err
    assert tracked, "build tracked no caches (test premise broken)"
    live = [df for df in tracked if df.storageLevel.useMemory]
    assert live, "nothing was persisted (test premise broken)"
    # current-thread-only release (the r10 behavior) is a no-op here
    release_ann_caches()
    assert any(df.storageLevel.useMemory for df in live)
    release_ann_caches(all_threads=True)
    assert not any(df.storageLevel.useMemory for df in live)
