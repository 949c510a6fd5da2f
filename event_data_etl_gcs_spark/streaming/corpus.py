"""Streaming training-corpus ingest: the full batch pipeline
(quality gate -> exact dedup -> near-dedup -> benchmark
decontamination) run INCREMENTALLY over arriving document batches —
the composition a 100 TB ingest actually runs, where re-executing the
batch pipeline over the whole corpus per delivery is the cost being
avoided.

Per micro-batch:

  1. quality gate — map-only, no state.
  2. exact dedup — keep-min within the batch, then an anti-join of the
     batch's content hashes (md5 of the text) against the persisted
     seen-hash index. md5 collisions are the accepted risk vs the batch
     pipeline's full-text groupBy (2^-64-ish; a 100 TB deployment would
     carry a 128-bit hash exactly like this one).
  3. near-dedup — ``minhash_incremental_pairs`` of the batch's unique
     docs against the persisted signature index. The index holds
     signatures of EVERY exact-unique gated doc ever seen — including
     near-dup losers and contaminated docs — because the batch
     pipeline's keep-min policy drops any doc pairing with ANY smaller
     id, not just with surviving ids (a chain a~b, b~c with no a~c
     drops BOTH b and c; if the index held survivors only, c would
     sneak back in).
  4. decontamination — per-doc and order-free (broadcast benchmark
     shingles), applied to the batch's survivors.
  5. state appends — hashes / signatures / accepted corpus rows, each
     written as the batch's OWN ``batch_id=N`` partition via dynamic
     partition overwrite: a foreachBatch replay rewrites the same
     partitions instead of duplicating rows, and every state read
     filters ``batch_id != current`` so a replay after a partial commit
     sees exactly the pre-batch state (the vector-index recipe from
     :mod:`.neardedup`).

Equivalence contract (pytest-pinned): when batches arrive in doc_id
order — the natural shape when ids are assigned at ingest — the final
accepted corpus is IDENTICAL to the batch pipeline
``decontaminate(near_dedup_keep_min(exact_dedup_keep_min(
quality_gate(docs))))``, however the corpus is split into batches.
Out-of-order arrival degrades keep-min to keep-first-arrival for the
affected pair only (the already-accepted member is never retroactively
dropped; at scale that remediation is a partition-pruned MERGE delete,
which ``sources/parquet_sink.merge_into`` provides).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import minhash_incremental_pairs
from ..plans.training_corpus import (
    NEAR_DUP_THRESHOLD,
    decontaminate,
    exact_dedup_keep_min,
    quality_gate,
)
from .neardedup import SIGNATURE_SCHEMA

HASH_STATE_SCHEMA = "doc_id LONG, text_md5 STRING"
CORPUS_SCHEMA = (
    "doc_id LONG, text STRING, lang STRING, source STRING, n_tokens BIGINT"
)

# index_mode="all" guard (VERDICT r7 #2): with every near-dup loser
# indexed, a new member of a family of size m pairs against all m prior
# members — per-delivery cost grows linearly with the largest family.
# Above this pair-degree the batch warns loudly and recommends
# index_mode="survivors" (flat per-delivery cost, greedy-online
# semantics). The guard measures the max per-doc pair degree of the
# CURRENT batch — exactly the quantity that grows with family size —
# so it costs one tiny agg over pairs the batch computed anyway.
FAMILY_GUARD_DEFAULT = 10_000


def _read_state_parts(
    spark: SparkSession, path: str, schema, batch_id: int
) -> DataFrame | None:
    """Committed state partitions EXCLUDING the current batch's own
    (replay idempotence: a replayed batch must see the pre-batch
    state). None when no partition exists yet."""
    if os.path.exists(path) and any(
        n.startswith("batch_id=") for n in os.listdir(path)
    ):
        return spark.read.parquet(path).filter(F.col("batch_id") != batch_id)
    return None


def _append_state(df: DataFrame, path: str, batch_id: int) -> None:
    df.withColumn("batch_id", F.lit(batch_id)).write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("batch_id").parquet(path)


def corpus_ingest_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    benchmark: DataFrame,
    threshold: float = NEAR_DUP_THRESHOLD,
    index_mode: str = "all",
    family_guard: int | None = FAMILY_GUARD_DEFAULT,
) -> None:
    """One increment of the streaming corpus pipeline (see module doc).

    ``index_mode`` picks the signature-index membership — a genuine
    semantics/scale tradeoff (measured in SCALE_r7.md):

    * ``"all"`` (default): every exact-unique gated doc is indexed,
      near-dup losers included — EXACT batch-pipeline keep-min parity
      (chains drop their whole tail). Cost: a new member of a growing
      near-dup family pairs against every prior member, so per-delivery
      cost grows linearly with family size (total quadratic — the same
      pair count the batch pipeline pays ONCE, paid incrementally).
    * ``"survivors"``: only ACCEPTED (post-near-dedup, pre-decon) docs
      are indexed — greedy online clustering, the standard production
      ingest posture. Each family keeps one indexed representative, so
      per-delivery cost stays FLAT. Divergence from batch keep-min is
      confined to chains: a doc pairing ONLY with a rejected doc (not
      with any survivor) is accepted here, dropped by the batch build.
      The exact-dedup hash index always keeps all uniques (hash rows
      are tiny and carry no quadratic hazard).
    """
    if index_mode not in ("all", "survivors"):
        raise ValueError(
            f"index_mode must be all|survivors, got {index_mode!r}"
        )
    spark = batch_df.sparkSession
    hash_path = os.path.join(index_dir, "hashes")
    sig_path = os.path.join(index_dir, "sigs")
    corpus_path = os.path.join(index_dir, "corpus")

    gated = quality_gate(batch_df)
    uniq = exact_dedup_keep_min(gated)
    seen = _read_state_parts(spark, hash_path, HASH_STATE_SCHEMA, batch_id)
    uniq = uniq.withColumn("text_md5", F.md5("text"))
    if seen is not None:
        uniq = uniq.join(
            seen.select("text_md5").distinct(), "text_md5", "left_anti"
        )

    existing_sig = _read_state_parts(spark, sig_path, None, batch_id)
    if existing_sig is None:
        existing_sig = spark.createDataFrame([], SIGNATURE_SCHEMA)
    else:
        existing_sig = existing_sig.select("id", "sh_hashes", "mhs")
    pairs, new_sig = minhash_incremental_pairs(
        uniq, existing_sig, threshold=threshold
    )
    # Materialize pairs once: both the loser resolution and the family
    # guard below read them (one compute, two consumers).
    pairs = pairs.localCheckpoint(eager=True)
    if index_mode == "all" and family_guard is not None:
        deg = (
            pairs.select(F.explode(F.array("id_a", "id_b")).alias("id"))
            .groupBy("id")
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        if deg is not None and deg > family_guard:
            import warnings

            warnings.warn(
                f"streaming corpus ingest batch {batch_id}: a document "
                f"paired with {deg} near-dup index members (> guard "
                f"{family_guard}) — index_mode='all' pays per-delivery "
                "cost linear in the largest near-dup family (total "
                "quadratic). For production ingest use "
                "index_mode='survivors' (flat per-delivery cost; "
                "divergence from batch keep-min confined to chains — "
                "see module doc / COVERAGE.md).",
                stacklevel=2,
            )
    # Keep-first loser resolution: a new doc pairing with an ALREADY
    # INDEXED doc loses regardless of id order (the indexed member is
    # immutable); among two new docs the larger id loses (== the batch
    # pipeline's keep-min). Both-old pairs cannot occur (the
    # incremental join only emits pairs touching a new doc).
    new_ids = uniq.select(F.col("doc_id").alias("nid")).distinct()
    p = (
        pairs.join(
            new_ids.select(F.col("nid").alias("id_a")).withColumn(
                "a_new", F.lit(True)
            ),
            "id_a",
            "left",
        )
        .join(
            new_ids.select(F.col("nid").alias("id_b")).withColumn(
                "b_new", F.lit(True)
            ),
            "id_b",
            "left",
        )
        .withColumn(
            "loser",
            F.when(
                F.col("a_new").isNotNull() & F.col("b_new").isNull(),
                F.col("id_a"),
            ).otherwise(F.col("id_b")),
        )
    )
    losers = p.select(F.col("loser").alias("doc_id")).distinct()
    accepted = uniq.join(losers, "doc_id", "left_anti")
    clean = decontaminate(accepted, benchmark).select(
        "doc_id", "text", "lang", "source", "n_tokens"
    )

    sig_out = new_sig.select("id", "sh_hashes", "mhs")
    if index_mode == "survivors":
        sig_out = sig_out.join(
            accepted.select(F.col("doc_id").alias("id")), "id", "left_semi"
        )
    # Materialize every output BEFORE the first state write: their plans
    # read the state directories being appended to, and parquet file
    # listing happens at execution time (the neardedup/merge_into
    # read-overwrite lesson).
    clean = clean.localCheckpoint(eager=True)
    sig_rows = sig_out.localCheckpoint(eager=True)
    hash_rows = uniq.select("doc_id", "text_md5").localCheckpoint(eager=True)

    _append_state(hash_rows, hash_path, batch_id)
    _append_state(sig_rows, sig_path, batch_id)
    _append_state(clean, corpus_path, batch_id)
    from ..operators.graph import release_ann_caches

    release_ann_caches()  # per-batch signature caches (bounded loop)


def run_streaming_corpus_ingest(
    spark: SparkSession,
    docs_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    benchmark: DataFrame,
    threshold: float = NEAR_DUP_THRESHOLD,
    max_files_per_trigger: int = 1,
    index_mode: str = "all",
    family_guard: int | None = FAMILY_GUARD_DEFAULT,
) -> None:
    """Drain the documents backlog through the incremental corpus
    pipeline (Available-Now trigger; re-running after new files land
    processes only the new files). See :func:`corpus_ingest_batch` for
    ``index_mode`` and ``family_guard``."""
    schema = spark.read.parquet(docs_dir).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )
    bench = benchmark.localCheckpoint(eager=True)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        corpus_ingest_batch(
            batch_df,
            batch_id,
            index_dir,
            bench,
            threshold=threshold,
            index_mode=index_mode,
            family_guard=family_guard,
        )

    q = (
        raw.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(on_batch)
        .start()
    )
    q.awaitTermination()


def read_streamed_corpus(spark: SparkSession, index_dir: str) -> DataFrame:
    """The accepted corpus across all committed batches."""
    corpus_path = os.path.join(index_dir, "corpus")
    if not (
        os.path.exists(corpus_path)
        and any(n.startswith("batch_id=") for n in os.listdir(corpus_path))
    ):
        raise FileNotFoundError(
            f"no committed corpus batches under {index_dir!r}: run "
            "run_streaming_corpus_ingest first"
        )
    return spark.read.parquet(corpus_path).drop("batch_id")
