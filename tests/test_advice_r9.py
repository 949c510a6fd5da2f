"""Regression pins for the four ADVICE r9 findings:

1. substring streaming: a crash DURING compact_every compaction
   (phases 1-3) followed by a foreachBatch replay must merge-read a
   REPAIRED postings state (recover_compaction now runs at the top of
   substring_ingest_batch), at every crash phase.
2. score_bigram_with_model: bigrams absent from the model must score
   per add-one smoothing ((c(v)+V)/1, c(v)=0 for unseen contexts) —
   not silently vanish from the per-doc mean (left joins + coalesce).
3. read_accepted under a strict threshold (every delivery's accepted
   partial empty -> no partitions on disk) returns an empty frame with
   the accepted schema instead of failing schema inference.
4. compact_ivf_index with every row tombstoned leaves a READABLE empty
   index (search/stats/append keep working; manifest carries the
   index schema).
"""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from event_data_etl_gcs_spark.streaming.substring import (
    substring_ingest_batch,
)
from event_data_etl_gcs_spark.streaming.compaction import (
    compact_batch_state,
    postings_merge,
)

SF = "/root/testdata/sf0.001"


def _docs(spark, lo, hi):
    base = " ".join(f"w{i}" for i in range(30))
    rows = []
    for i in range(lo, hi):
        if i % 3 == 0:
            text = f"{base} uniq{i}"  # shared duplicated span family
        else:
            text = " ".join(f"t{i}w{j}" for j in range(25))
        rows.append((i, text, "en", "web"))
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def _snap(spark, root, d):
    p = os.path.join(root, d)
    df = spark.read.parquet(p)
    return sorted(tuple(r) for r in df.select(*sorted(df.columns)).collect())


# ---------------------------------------------------------------------
# 1. torn compaction + replay (the interleaving ADVICE r9 #1 describes)
# ---------------------------------------------------------------------

@pytest.mark.parametrize("crash_phase", ["pre_manifest", "mid_delete", "pre_cleanup"])
def test_substring_replay_after_torn_compaction(spark, tmp_path, crash_phase):
    """Scenario: deliveries 0..2 ingest; compact_every fires after batch
    2 and CRASHES mid-compaction (before the checkpoint commit), so the
    restarted stream replays batch 2. The replayed
    substring_ingest_batch must repair the torn postings state BEFORE
    its merge-read — otherwise missing grams silently under-detect
    duplicated spans and the wrong text_clean is committed."""
    n_batches, per = 3, 12
    last = n_batches - 1

    # clean reference: ingest all, compact cleanly, replay last batch
    # (replay after a CLEAN compact is the already-pinned idempotent case)
    clean_root = str(tmp_path / "clean")
    for b in range(n_batches):
        substring_ingest_batch(_docs(spark, b * per, (b + 1) * per), b, clean_root)
    compact_batch_state(
        spark, os.path.join(clean_root, "postings"), merge=postings_merge
    )
    substring_ingest_batch(_docs(spark, last * per, (last + 1) * per), last, clean_root)
    want = _snap(spark, clean_root, "clean")

    # torn run: same ingests, then a compaction crash at crash_phase
    root = str(tmp_path / f"torn_{crash_phase}")
    for b in range(n_batches):
        substring_ingest_batch(_docs(spark, b * per, (b + 1) * per), b, root)
    post = os.path.join(root, "postings")
    covered = sorted(
        int(n.split("=")[1])
        for n in os.listdir(post)
        if n.startswith("batch_id=")
    )
    staging = post.rstrip("/") + ".compact_staging"
    data_dir = os.path.join(staging, "data")
    if crash_phase == "pre_manifest":
        # phase 1 interrupted: staged rows present, manifest never
        # written -> staging is garbage, state untouched
        os.makedirs(data_dir, exist_ok=True)
        with open(os.path.join(data_dir, "junk"), "w") as fh:
            fh.write("incomplete")
    else:
        src = spark.read.parquet(
            *[os.path.join(post, f"batch_id={b}") for b in covered]
        )
        postings_merge(src).write.mode("overwrite").parquet(data_dir)
        with open(os.path.join(staging, "_COMPACT_MANIFEST.json"), "w") as fh:
            json.dump({"covered": covered}, fh)
        if crash_phase == "mid_delete":
            # phase 2 interrupted: manifest authoritative, one covered
            # partition already gone, consolidated partition NOT installed
            shutil.rmtree(os.path.join(post, f"batch_id={covered[0]}"))
        else:  # pre_cleanup: phases 2-3 done, staging cleanup missed
            for b in covered:
                shutil.rmtree(os.path.join(post, f"batch_id={b}"))
            os.rename(data_dir, os.path.join(post, "batch_id=-1"))

    # the restarted stream replays the final delivery
    substring_ingest_batch(_docs(spark, last * per, (last + 1) * per), last, root)
    assert not os.path.isdir(staging), "replay did not repair the torn state"
    assert _snap(spark, root, "clean") == want, crash_phase


# ---------------------------------------------------------------------
# 2. out-of-model bigrams score per add-one smoothing
# ---------------------------------------------------------------------

def test_score_with_model_keeps_unseen_bigrams(spark, tmp_path):
    from event_data_etl_gcs_spark.streaming.lm_bigram import (
        lm_ingest_batch,
        score_against_lm_model,
    )

    state = str(tmp_path / "lm")
    corpus = spark.createDataFrame(
        [(1, "a b c")], "doc_id long, text string"
    )
    lm_ingest_batch(corpus, 0, state)
    # model: bigrams (a,b):1 (b,c):1; c(a)=c(b)=1; V=3
    frame = spark.createDataFrame(
        [(99, "x y"), (100, "a b x")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r
        for r in score_against_lm_model(spark, frame, state).collect()
    }
    # doc 99: single bigram (x,y), context x unseen -> 1/p = (0+3)/(0+1)
    assert 99 in got, "doc with only unseen bigrams vanished from output"
    assert got[99]["n_bigrams"] == 1
    assert got[99]["mean_inv_p"] == 3.0
    assert got[99]["min_bigram_count"] == 0
    # doc 100: (a,b) seen -> (1+3)/(1+1)=2.0; (b,x) unseen, c(b)=1 ->
    # (1+3)/(0+1)=4.0; mean=3.0 with BOTH transitions counted
    assert got[100]["n_bigrams"] == 2
    assert got[100]["mean_inv_p"] == 3.0
    assert got[100]["min_bigram_count"] == 0


def test_self_trained_scores_unchanged_by_left_joins(spark):
    """When the model is trained on the scored corpus itself (the
    oracle queries' shape), every bigram is in the model and the left
    joins must be row-identical to the old inner joins."""
    from event_data_etl_gcs_spark.queries.lm_bigram import bigram_scores
    from event_data_etl_gcs_spark.sources.catalog import load_table

    docs = load_table(spark, SF, "documents").limit(50)
    out = bigram_scores(docs)
    assert out.count() > 0
    # self-trained: every scored transition is in the model, so the
    # coalesced cvw floor of 0 is never reached
    assert out.filter(F.col("min_bigram_count") < 1).count() == 0


# ---------------------------------------------------------------------
# 3. read_accepted with an always-empty accepted state
# ---------------------------------------------------------------------

def test_read_accepted_empty_state_returns_typed_empty_frame(spark, tmp_path):
    from event_data_etl_gcs_spark.streaming.lm_bigram import (
        lm_gated_ingest_batch,
        read_accepted,
    )

    state = str(tmp_path / "gate")
    # mean_inv_p >= 1 always (cv >= cvw), so threshold -1 accepts nothing
    lm_gated_ingest_batch(_docs(spark, 0, 8), 0, state, -1.0)
    assert not os.path.isdir(os.path.join(state, "accepted")) or not any(
        n.startswith("batch_id=")
        for n in os.listdir(os.path.join(state, "accepted"))
    )
    out = read_accepted(spark, state)
    assert out.count() == 0
    assert set(out.columns) == {
        "doc_id", "source", "n_bigrams", "mean_inv_p", "batch_id"
    }


def test_ann_cache_registry_is_thread_local(spark):
    """VERDICT r9 'what's wrong' #2: a concurrent build (parallel
    streaming queries run foreachBatch on separate threads) must not
    release another thread's live ANN caches mid-build."""
    import threading

    from event_data_etl_gcs_spark.operators.graph import (
        _track_ann_cache,
        release_ann_caches,
    )

    df = spark.range(5).cache()
    df.count()
    _track_ann_cache(df)
    t = threading.Thread(target=release_ann_caches)  # other thread's entry
    t.start()
    t.join()
    assert df.is_cached  # untouched by the other thread's release
    release_ann_caches()  # own thread releases as before
    assert not df.is_cached


# ---------------------------------------------------------------------
# 4. all-rows-tombstoned IVF compaction leaves a readable empty index
# ---------------------------------------------------------------------

def test_compact_all_tombstoned_index_stays_readable(spark, tmp_path):
    from event_data_etl_gcs_spark.operators.ivf_store import (
        append_ivf_index,
        compact_ivf_index,
        delete_from_ivf_index,
        ivf_index_stats,
        search_ivf_index,
        write_ivf_index,
    )
    from event_data_etl_gcs_spark.operators.linalg import pca_fit
    from event_data_etl_gcs_spark.sources.catalog import load_table

    emb = load_table(spark, SF, "embeddings")
    qe, qw, _ = pca_fit(emb)
    path = str(tmp_path / "idx")
    write_ivf_index(emb, qe, path, qw=qw)
    delete_from_ivf_index(spark, path, emb.select("vec_id"))
    m = compact_ivf_index(spark, path)
    assert m["n_rows"] == 0 and m["n_tombstones"] == 0

    # every lifecycle read of the empty index keeps working
    stats = ivf_index_stats(spark, path)
    assert stats["n_rows"] == 0 and stats["n_cells_used"] == 0
    queries = emb.filter(F.col("vec_id") < 3)
    got = search_ivf_index(spark, path, queries, qe, qw=qw)
    assert got.count() == 0
    # compacting again (no tombstones) is a no-op, not an error
    m2 = compact_ivf_index(spark, path)
    assert m2["n_rows"] == 0

    # the index accepts appends again and search comes back to life
    append_ivf_index(emb, path, qe, qw=qw)
    assert search_ivf_index(spark, path, queries, qe, qw=qw).count() > 0
