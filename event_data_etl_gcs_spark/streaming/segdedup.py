"""Streaming segment-level dedup: maintain the first-occurrence segment
index over a document stream and emit each delivery's RECONSTRUCTED
(boilerplate-stripped) text without rescanning the corpus.

Batch counterpart: queries/segdedup.py (global min-(doc_id, seg_pos)
winner per distinct segment). The online rule is first-ARRIVAL wins:
a new document keeps exactly the segments absent from the persisted
index (and, within the batch, segments whose minimum (doc_id, seg_pos)
it owns). When deliveries arrive in doc_id order the two rules
coincide — pinned bit-identical by test; out-of-order arrival keeps
the first-arrived copy instead of the global-minimum one (the same
documented divergence class as streaming/semdedup.py).

Replay safety: the segment index and the per-batch cleaned output are
batch_id-partitioned with dynamic overwrite; a replayed batch reads
state as batch_id != current and overwrites only its own partitions —
the corpus-ingest pattern.

Scale: the index holds one row per DISTINCT segment ever seen,
keyed by the exact segment string (a truncated hash would drop fresh
segments on collision; at petabyte scale the index would carry a
128-bit content hash instead). Per delivery: one
groupBy(segment) over the batch, one anti-join against the index
(both sides hash-partitioned on the segment hash), one
groupBy(doc_id) to rebuild text. Nothing rescans history.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.segdedup import SEG_W, _exploded_segments, _winners
from .corpus import _append_state, _read_state_parts

SEG_INDEX_SCHEMA = "seg STRING, batch_id LONG"
CLEAN_SCHEMA = (
    "doc_id LONG, n_segs BIGINT, n_kept BIGINT, text_dedup STRING, batch_id LONG"
)


def segdedup_ingest_batch(
    batch_df: DataFrame, batch_id: int, index_dir: str
) -> None:
    """One increment: within-batch first-occurrence winners, minus
    segments already in the persisted index; then index append."""
    spark = batch_df.sparkSession
    idx_path = os.path.join(index_dir, "segments")
    out_path = os.path.join(index_dir, "clean")

    segs = _exploded_segments(batch_df)
    batch_winners = _winners(segs)
    existing = _read_state_parts(spark, idx_path, SEG_INDEX_SCHEMA, batch_id)
    if existing is not None:
        # exact-string membership: a truncated hash would silently drop
        # fresh segments on collision (birthday bound ~31k segments at
        # the 1e9+7 polynomial hash) — the index carries the segment
        fresh = batch_winners.join(
            existing.select("seg"), "seg", "left_anti"
        )
    else:
        fresh = batch_winners
    fresh = fresh.localCheckpoint(eager=True)

    n_segs = batch_df.select(
        "doc_id",
        F.expr(
            "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE "
            f"(size(split(trim(text), '\\\\s+')) + {SEG_W - 1}) div {SEG_W} "
            "END AS BIGINT)"
        ).alias("n_segs"),
    )
    rec = fresh.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.array_join(
            F.expr(
                "transform(sort_array(collect_list(struct(seg_pos, seg))), p -> p.seg)"
            ),
            " ",
        ).alias("text_dedup"),
    )
    clean = n_segs.join(rec, "doc_id", "left").select(
        "doc_id",
        "n_segs",
        F.coalesce(F.col("n_kept"), F.lit(0).cast("bigint")).alias("n_kept"),
        F.coalesce(F.col("text_dedup"), F.lit("")).alias("text_dedup"),
    )
    _append_state(clean, out_path, batch_id)
    _append_state(fresh.select("seg"), idx_path, batch_id)


def run_streaming_segdedup(
    spark: SparkSession,
    docs_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> None:
    """Drain a documents backlog through the online segment-dedup check
    (Available-Now; re-runs process only new files)."""
    schema = spark.read.parquet(docs_dir).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        segdedup_ingest_batch(batch_df, batch_id, index_dir)

    q = (
        raw.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(on_batch)
        .start()
    )
    q.awaitTermination()


def read_clean_corpus(spark: SparkSession, index_dir: str) -> DataFrame:
    """(doc_id, n_segs, n_kept, text_dedup, batch_id): every cleaned
    document emitted so far."""
    return spark.read.parquet(os.path.join(index_dir, "clean"))
