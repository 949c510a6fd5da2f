"""Streaming DSIR model maintenance == the batch-built model, however
the corpus is split into deliveries; replays don't double-count; and
scoring against the maintained model equals the batch query's scores."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from event_data_etl_gcs_spark.operators.dsir import (
    bucket_counts,
    ratio_table,
    score_docs,
    token_buckets,
)

SF = "/root/testdata/sf0.001"


def _stage_files(spark, docs, docs_dir: str, n_files: int) -> None:
    os.makedirs(docs_dir, exist_ok=True)
    ids = sorted(r[0] for r in docs.select("doc_id").collect())
    bounds = [ids[i * len(ids) // n_files] for i in range(n_files)] + [
        ids[-1] + 1
    ]
    for i in range(n_files):
        part = docs.filter(
            (F.col("doc_id") >= bounds[i]) & (F.col("doc_id") < bounds[i + 1])
        ).coalesce(1)
        tmpd = os.path.join(docs_dir, f"_w{i}")
        part.write.mode("overwrite").parquet(tmpd)
        src = glob.glob(os.path.join(tmpd, "part-*.parquet"))[0]
        dst = os.path.join(docs_dir, f"{i:05d}.parquet")
        shutil.move(src, dst)
        shutil.rmtree(tmpd)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))


def _model_rows(df):
    return sorted(tuple(r) for r in df.select("h", "ct", "cs").collect())


def test_streamed_model_equals_batch(spark, tmp_path):
    from event_data_etl_gcs_spark.streaming.dsir import (
        read_dsir_model,
        run_streaming_dsir_maintenance,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    want = _model_rows(bucket_counts(token_buckets(docs)))

    docs_dir = str(tmp_path / "docs")
    state_dir = str(tmp_path / "state")
    _stage_files(spark, docs, docs_dir, 3)
    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(docs_dir)
    run_streaming_dsir_maintenance(spark, stream, state_dir)
    got = _model_rows(read_dsir_model(spark, state_dir))
    assert got == want


def test_replay_does_not_double_count(spark, tmp_path):
    from event_data_etl_gcs_spark.streaming.dsir import (
        read_dsir_model,
        run_streaming_dsir_maintenance,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs_dir = str(tmp_path / "docs")
    state_dir = str(tmp_path / "state")
    _stage_files(spark, docs, docs_dir, 2)
    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(docs_dir)
    run_streaming_dsir_maintenance(spark, stream, state_dir)
    want = _model_rows(read_dsir_model(spark, state_dir))

    # simulate an at-least-once redelivery of the LAST batch: re-apply
    # the same (batch_df, batch_id) pair through the same upsert path
    from event_data_etl_gcs_spark.streaming.sketches import (
        commit_state,
        read_state,
    )
    from event_data_etl_gcs_spark.streaming.dsir import DSIR_STATE_SCHEMA

    ids = sorted(r[0] for r in docs.select("doc_id").collect())
    mid = ids[len(ids) // 2]
    last_batch = docs.filter(F.col("doc_id") >= mid)
    state = read_state(spark, state_dir, DSIR_STATE_SCHEMA)
    last_bid = int(state.agg(F.max("batch_id")).collect()[0][0])
    delta = bucket_counts(token_buckets(last_batch)).withColumn(
        "batch_id", F.lit(last_bid).cast("long")
    )
    merged = state.filter(F.col("batch_id") != last_bid).unionByName(delta)
    commit_state(merged.select("h", "ct", "cs", "batch_id"), state_dir)
    assert _model_rows(read_dsir_model(spark, state_dir)) == want


def test_score_against_maintained_model_matches_batch_query(spark, tmp_path):
    from event_data_etl_gcs_spark.streaming.dsir import (
        run_streaming_dsir_maintenance,
        score_against_model,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs_dir = str(tmp_path / "docs")
    state_dir = str(tmp_path / "state")
    _stage_files(spark, docs, docs_dir, 3)
    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(docs_dir)
    run_streaming_dsir_maintenance(spark, stream, state_dir)

    want = sorted(
        tuple(r)
        for r in score_docs(
            token_buckets(docs),
            ratio_table(bucket_counts(token_buckets(docs))),
        ).collect()
    )
    got = sorted(
        tuple(r) for r in score_against_model(spark, docs, state_dir).collect()
    )
    assert got == want


def test_score_docs_window_form(spark):
    """Round-13 restructure pin: the running-window score_docs must be
    BIT-IDENTICAL to the original sort_array(collect_list) + fold form
    (pos is unique per doc, ratios strictly positive, so the running
    double sum visits the same order the array fold pinned)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    tk = token_buckets(docs)
    ratios = ratio_table(bucket_counts(tk))
    got = {
        (r["doc_id"], r["source"]): (r["n_tokens"], r["mean_lr"])
        for r in score_docs(tk, ratios).collect()
    }
    legacy = (
        tk.filter(~F.col("is_target"))
        .join(F.broadcast(ratios), "h")
        .select("doc_id", "source", "pos", "ratio")
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sort_array(F.collect_list(F.struct("pos", "ratio"))).alias("pr"),
        )
        .select(
            "doc_id",
            "source",
            "n_tokens",
            (
                F.expr(
                    "aggregate(transform(pr, p -> p.ratio), "
                    "CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
                )
                / F.col("n_tokens").cast("double")
            ).alias("mean_lr"),
        )
    )
    want = {
        (r["doc_id"], r["source"]): (r["n_tokens"], r["mean_lr"])
        for r in legacy.collect()
    }
    assert got == want  # exact doubles, not approx
