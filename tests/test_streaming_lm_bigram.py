"""Streaming bigram-LM maintenance == the batch model, however the
corpus splits into deliveries; replays rewrite instead of
double-counting; scoring against the maintained model reproduces
``bigram_surprisal_scores`` bit-for-bit."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_data_etl_gcs_spark.queries.lm_bigram import bigram_scores
from event_data_etl_gcs_spark.streaming.lm_bigram import (
    lm_ingest_batch,
    read_lm_model,
    run_streaming_lm_maintenance,
    score_against_lm_model,
)

from .test_streaming_dsir import _stage_files

SF = "/root/testdata/sf0.001"


def _model_rows(uni, bi):
    u = sorted(tuple(r) for r in uni.collect())
    b = sorted(tuple(r) for r in bi.collect())
    return u, b


def _drain(spark, docs, docs_dir, state_dir, n_files):
    _stage_files(spark, docs, docs_dir, n_files)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
    run_streaming_lm_maintenance(spark, stream, state_dir)


def test_streamed_scores_bit_identical_to_batch(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    state_dir = str(tmp_path / "state")
    _drain(spark, docs, str(tmp_path / "docs"), state_dir, 3)

    got = {
        r.doc_id: (r.n_bigrams, r.mean_inv_p, r.min_bigram_count)
        for r in score_against_lm_model(spark, docs, state_dir).collect()
    }
    want = {
        r.doc_id: (r.n_bigrams, r.mean_inv_p, r.min_bigram_count)
        for r in bigram_scores(docs).collect()
    }
    # exact double equality: the streamed model's folded integers feed
    # the identical scoring join
    assert got == want


def test_split_invariance(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    s2 = str(tmp_path / "s2")
    s4 = str(tmp_path / "s4")
    _drain(spark, docs, str(tmp_path / "d2"), s2, 2)
    _drain(spark, docs, str(tmp_path / "d4"), s4, 4)
    assert _model_rows(*read_lm_model(spark, s2)) == _model_rows(
        *read_lm_model(spark, s4)
    )


def test_replay_rewrites_not_double_counts(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    state_dir = str(tmp_path / "state")
    _drain(spark, docs, str(tmp_path / "docs"), state_dir, 2)
    want = _model_rows(*read_lm_model(spark, state_dir))

    # redeliver the second half under its original batch_id
    ids = sorted(r[0] for r in docs.select("doc_id").collect())
    half = docs.filter(F.col("doc_id") >= ids[len(ids) // 2])
    lm_ingest_batch(half, 1, state_dir)
    assert _model_rows(*read_lm_model(spark, state_dir)) == want


def test_fresh_batch_scored_against_stale_model_differs(spark, tmp_path):
    """Sanity direction pin: scoring against a HALF-corpus model is not
    the full-corpus score (the maintenance loop is load-bearing)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ids = sorted(r[0] for r in docs.select("doc_id").collect())
    first = docs.filter(F.col("doc_id") < ids[len(ids) // 2])
    state_dir = str(tmp_path / "state")
    lm_ingest_batch(first, 0, state_dir)
    got = {
        r.doc_id: r.mean_inv_p
        for r in score_against_lm_model(spark, first, state_dir).collect()
    }
    full = {
        r.doc_id: r.mean_inv_p
        for r in bigram_scores(docs).collect()
        if r.doc_id in got
    }
    assert got != full


# ---------------------------------------------------------------------
# LM-gated ingest (streaming posture of the v6 quality stage)
# ---------------------------------------------------------------------


def _gate_rows(df):
    return sorted(
        (r.doc_id, r.source, r.n_bigrams, r.mean_inv_p) for r in df.collect()
    )


def test_one_delivery_drain_equals_batch_filter(spark, tmp_path):
    from event_data_etl_gcs_spark.streaming.lm_bigram import (
        read_accepted,
        run_streaming_lm_gated_ingest,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    scores = bigram_scores(docs)
    thr = sorted(r.mean_inv_p for r in scores.collect())[len(scores.collect()) // 2]

    state_dir = str(tmp_path / "state")
    _stage_files(spark, docs, str(tmp_path / "docs"), 1)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "docs"))
    )
    run_streaming_lm_gated_ingest(spark, stream, state_dir, thr)

    got = _gate_rows(
        read_accepted(spark, state_dir).drop("batch_id")
    )
    from pyspark.sql import functions as F2

    want = _gate_rows(
        scores.filter(F2.col("mean_inv_p") <= thr)
        .join(docs.select("doc_id", "source"), "doc_id")
        .select("doc_id", "source", "n_bigrams", "mean_inv_p")
    )
    assert got == want and 0 < len(got) < scores.count()


def test_per_delivery_decisions_reproducible_from_prefix(spark, tmp_path):
    """Each delivery's accepted set must equal scoring that batch
    against the model built from deliveries <= it — the frontier
    contract, reconstructed independently per prefix."""
    from event_data_etl_gcs_spark.streaming.lm_bigram import (
        lm_ingest_batch,
        read_accepted,
        run_streaming_lm_gated_ingest,
        score_against_lm_model,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    thr = 60.0
    state_dir = str(tmp_path / "state")
    _stage_files(spark, docs, str(tmp_path / "docs"), 3)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "docs"))
    )
    run_streaming_lm_gated_ingest(spark, stream, state_dir, thr)

    acc = read_accepted(spark, state_dir)
    ids = sorted(r[0] for r in docs.select("doc_id").collect())
    bounds = [ids[i * len(ids) // 3] for i in range(3)] + [ids[-1] + 1]
    ref_state = str(tmp_path / "ref_state")
    for b in range(3):
        batch = docs.filter(
            (F.col("doc_id") >= bounds[b]) & (F.col("doc_id") < bounds[b + 1])
        )
        lm_ingest_batch(batch, b, ref_state)
        want = _gate_rows(
            score_against_lm_model(spark, batch, ref_state)
            .filter(F.col("mean_inv_p") <= thr)
            .join(docs.select("doc_id", "source"), "doc_id")
            .select("doc_id", "source", "n_bigrams", "mean_inv_p")
        )
        got = _gate_rows(
            acc.filter(F.col("batch_id") == b).drop("batch_id")
        )
        assert got == want, f"delivery {b} diverged"


def test_gated_replay_idempotent(spark, tmp_path):
    from event_data_etl_gcs_spark.streaming.lm_bigram import (
        lm_gated_ingest_batch,
        read_accepted,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ids = sorted(r[0] for r in docs.select("doc_id").collect())
    halves = [
        docs.filter(F.col("doc_id") < ids[len(ids) // 2]),
        docs.filter(F.col("doc_id") >= ids[len(ids) // 2]),
    ]
    state_dir = str(tmp_path / "state")
    for b, batch in enumerate(halves):
        lm_gated_ingest_batch(batch, b, state_dir, 60.0)
    want = _gate_rows(read_accepted(spark, state_dir))
    lm_gated_ingest_batch(halves[1], 1, state_dir, 60.0)  # redelivery
    assert _gate_rows(read_accepted(spark, state_dir)) == want


def test_bigramless_deliveries_read_as_empty_model(spark, tmp_path):
    """A delivery of only sub-2-token docs writes no bigram partition;
    the model must read as EMPTY bigram table, not missing state, and
    scoring against it applies add-one smoothing to the (all-unseen)
    transitions — 1/p = (0+V)/(0+1) = V — instead of crashing or
    silently dropping the doc (ADVICE r9 #2 contract)."""
    from event_data_etl_gcs_spark.streaming.lm_bigram import (
        lm_ingest_batch,
        read_lm_model,
        score_against_lm_model,
    )

    tiny = spark.createDataFrame(
        [(1, "solo"), (2, "x")], "doc_id long, text string"
    )
    state_dir = str(tmp_path / "state")
    lm_ingest_batch(tiny, 0, state_dir)
    uni, bi = read_lm_model(spark, state_dir)
    assert uni.count() == 2 and bi.count() == 0
    docs = spark.createDataFrame(
        [(3, "a b c")], "doc_id long, text string"
    )
    rows = score_against_lm_model(spark, docs, state_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["doc_id"] == 3 and r["n_bigrams"] == 2
    assert r["mean_inv_p"] == 2.0  # V = 2 ('solo', 'x')
    assert r["min_bigram_count"] == 0
