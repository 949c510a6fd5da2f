"""Streaming exact substring dedup: clean each delivery's documents
against the duplicated-span set of EVERYTHING SEEN SO FAR, maintaining
a mergeable gram-postings state — never rescanning history.

Batch counterpart: queries/substring_dedup.py (symmetric removal — a
span duplicated across documents is cut from EVERY document carrying
it). The online rule is necessarily frontier-based: a delivery-N
document loses every token covered by a K-gram that occurs in MORE THAN
ONE DISTINCT DOCUMENT among all documents seen up to and including
delivery N (its own batch counts). Documents already emitted are not
retroactively re-cleaned when a LATER document duplicates their spans —
the same documented frontier-vs-batch divergence class as
streaming/segdedup.py and the survivors-mode corpus ingest. Two exact
pins follow and are tested:

* **Final-delivery equality**: for the last delivery, "seen" is the
  whole corpus, so its documents' cleaned text is BIT-IDENTICAL to the
  batch rebuild restricted to those documents.
* **Monotone under-removal**: for every earlier document the streamed
  output removes a SUBSET of the batch removal (a gram duplicated at
  time N is still duplicated in the full corpus — min/max doc postings
  only ever widen), so streamed text_clean is always the batch
  text_clean with zero or more duplicated spans still present, never an
  over-removal.

State: one row per DISTINCT gram ever seen — ``(gram, lo, hi)``, the
min/max doc_id carrying it. Duplicated across >1 distinct doc iff
``lo <> hi``, and the pair is EXACTLY MERGEABLE (min of mins, max of
maxes — order-free, replay-safe), the same algebra as the streamed
int64 Gram state. Per delivery: one groupBy(gram) over the batch's
grams, one merge-read of dim-free postings partials, one
occurrence-linear hit join, one groupBy(doc_id) rebuild. The state is
batch_id-partitioned with dynamic overwrite; a replayed batch
deterministically REWRITES its own postings partition (a pure function
of the batch) before the merge-read, so replay converges to the clean
run (chaos-tested in tests/test_chaos_streaming.py).

Why not keep-batch-parity by re-emitting old docs? Retroactive
re-cleaning would make every delivery's output depend on every future
delivery — an unbounded output contract no streaming system honors;
the batch rebuild exists for corpus-final cleaning (and costs one run).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.decontam_span import _grams_sql
from ..queries.substring_dedup import SUB_K
from ..operators.text import tokens_sql
from .corpus import _append_state

GRAM_POSTINGS_SCHEMA = "gram STRING, lo LONG, hi LONG, batch_id LONG"
CLEAN_SCHEMA = (
    "doc_id LONG, source STRING, n_tokens BIGINT, n_hits BIGINT, "
    "n_removed BIGINT, text_clean STRING, batch_id LONG"
)


def _batch_grams(batch_df: DataFrame, k: int) -> DataFrame:
    tk = batch_df.select(
        "doc_id", "source", F.expr(tokens_sql("text")).alias("toks")
    )
    return tk.select(
        "doc_id",
        F.posexplode(F.expr(_grams_sql("toks", k))).alias("pos0", "gram"),
    ).select("doc_id", (F.col("pos0") + 1).cast("int").alias("pos"), "gram")


def substring_ingest_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    k: int = SUB_K,
) -> None:
    """One increment: update the gram postings with the batch's grams,
    then clean the batch's documents against the merged (seen-so-far,
    batch included) duplicated-gram set."""
    spark = batch_df.sparkSession
    post_path = os.path.join(index_dir, "postings")
    out_path = os.path.join(index_dir, "clean")

    # A crash during a compact_every compaction (phases 2-3: manifest
    # staged, source partitions partly deleted, batch_id=-1 not yet
    # installed) would otherwise leave a torn postings state that THIS
    # replayed delivery merge-reads before any later compact call runs
    # recovery — missing grams would silently under-detect duplicated
    # spans. Repair first; recover_compaction is a cheap no-op ('clean')
    # in the common case. Chaos-tested (torn-state-then-replay writer)
    # in tests/test_chaos_streaming.py.
    from .compaction import recover_compaction

    recover_compaction(post_path)

    grams = _batch_grams(batch_df, k).localCheckpoint(eager=True)
    batch_post = grams.groupBy("gram").agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    )
    # Write the batch partial FIRST (own batch_id partition — a replay
    # deterministically rewrites identical content), then merge postings
    # across ALL partials (own batch included: within-batch duplication
    # must clean the batch's own docs). Reading after the write is safe
    # because the own-partition content is a pure function of the batch.
    _append_state(batch_post, post_path, batch_id)
    merged = spark.read.parquet(post_path)
    dup = (
        merged.groupBy("gram")
        .agg(F.min("lo").alias("lo"), F.max("hi").alias("hi"))
        .filter(F.col("lo") != F.col("hi"))
        .select("gram")
    )
    hits = grams.join(dup, "gram").select("doc_id", "pos")

    tk = batch_df.select(
        "doc_id", "source", F.expr(tokens_sql("text")).alias("toks")
    )
    tpos = tk.select(
        "doc_id",
        "source",
        F.expr("size(toks)").cast("bigint").alias("n_tokens"),
        F.posexplode("toks").alias("ti0", "tok"),
    ).select(
        "doc_id", "source", "n_tokens",
        (F.col("ti0") + 1).cast("int").alias("pos"), "tok",
    )
    h = hits.select(F.col("doc_id").alias("h_doc"), F.col("pos").alias("h_pos"))
    kept = tpos.join(
        h,
        (F.col("doc_id") == F.col("h_doc"))
        & (F.col("pos") >= F.col("h_pos"))
        & (F.col("pos") <= F.col("h_pos") + k - 1),
        "left_anti",
    )
    per_doc = kept.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_keep"),
        F.array_join(
            F.expr(
                "transform(sort_array(collect_list(struct(pos, tok))), p -> p.tok)"
            ),
            " ",
        ).alias("text_clean"),
    )
    hit_counts = hits.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_hits")
    )
    spine = tk.select(
        "doc_id", "source", F.expr("size(toks)").cast("bigint").alias("n_tokens")
    )
    clean = (
        spine.join(hit_counts, "doc_id", "left")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.coalesce(F.col("n_hits"), F.lit(0).cast("bigint")).alias("n_hits"),
            (
                F.col("n_tokens")
                - F.coalesce(F.col("n_keep"), F.lit(0).cast("bigint"))
            ).alias("n_removed"),
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
        )
    )
    _append_state(clean, out_path, batch_id)


def read_streamed_clean(spark: SparkSession, index_dir: str) -> DataFrame:
    """All deliveries' cleaned documents (doc_id, ..., batch_id)."""
    return spark.read.parquet(os.path.join(index_dir, "clean"))


def run_streaming_substring_dedup(
    spark: SparkSession,
    docs_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    k: int = SUB_K,
    max_files_per_trigger: int = 1,
    compact_every: int | None = None,
) -> None:
    """Drain a documents backlog through the online substring-dedup
    check (Available-Now; re-runs process only new files).

    ``compact_every=N`` folds the postings state into its single
    consolidated partition after every N-th delivery (see
    :mod:`.compaction`) so the per-delivery merge-read stays
    distinct-gram-bound instead of growing with the delivery count.
    Doing this INSIDE foreachBatch is safe for this state specifically:
    the postings merge is min/max — idempotent — so the one bad
    interleaving (crash after the fold but before the checkpoint
    commit, then a replay re-appending the already-folded delivery)
    converges to the same merged postings. Sum-merged states must
    compact between drains with ``checkpoint_dir`` scoping instead."""
    schema = spark.read.parquet(docs_dir).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        substring_ingest_batch(batch_df, batch_id, index_dir, k)
        if compact_every and (batch_id + 1) % compact_every == 0:
            from .compaction import compact_batch_state, postings_merge

            compact_batch_state(
                spark,
                os.path.join(index_dir, "postings"),
                merge=postings_merge,
            )

    q = (
        raw.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(on_batch)
        .start()
    )
    q.awaitTermination()
