"""Streaming near-dedup: every arriving document batch is checked
against the ever-growing persisted MinHash signature index.

The batch operator family (operators/dedup.py) answers "find all pairs
in a corpus"; a training-data ingest pipeline asks a different question:
"does THIS new document duplicate anything we already have?" — asked
continuously. This module wires ``minhash_incremental_pairs`` into a
Structured Streaming file source + foreachBatch loop:

  * per micro-batch: signatures for the new docs only; (new bands) x
    (all bands) candidate join against the persisted signature table;
    Jaccard verify on candidates; emit pairs touching a new doc.
  * then append the new signatures to the index — the next batch (or the
    next run: the file-source checkpoint makes re-runs process only new
    files) sees them.

Invariant (tested): the union of emitted pairs over all batches equals
the full-corpus ``minhash_lsh_pairs`` output — each pair is found
exactly once, in the batch where its later member arrives.

Scale/exactly-once notes: every state write (pairs, signatures,
containment sets/prefix) lands as the batch's OWN ``batch_id=N``
partition via dynamic partition overwrite, and every state read filters
``batch_id != current`` — a foreachBatch replay after a crash between
the writes and the checkpoint commit rewrites the same partitions
instead of duplicating rows (the :mod:`.corpus` recipe). The indexes
are re-read per batch, which is the point: they live on storage, grow
monotonically, and are never recomputed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from ..operators.dedup import minhash_incremental_pairs

SIGNATURE_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("sh_hashes", ArrayType(LongType())),
        StructField("mhs", ArrayType(LongType())),
    ]
)


def check_batch_against_index(
    batch_docs: DataFrame,
    sig_path: str,
    pairs_path: str,
    batch_id: int,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """One increment: near-dup pairs for ``batch_docs`` vs the persisted
    index at ``sig_path`` (created if absent), then index append.

    Both writes land as the batch's own ``batch_id=N`` partition
    (dynamic overwrite), and the index read excludes the current
    batch's partition — a foreachBatch replay after a crash between
    the writes and the checkpoint commit rewrites the same partitions
    instead of duplicating index rows / re-emitting pairs (ADVICE r7)."""
    from .corpus import _append_state, _read_state_parts

    spark = batch_docs.sparkSession
    existing = _read_state_parts(spark, sig_path, None, batch_id)
    if existing is None:
        existing = spark.createDataFrame([], SIGNATURE_SCHEMA)
    else:
        existing = existing.select("id", "sh_hashes", "mhs")
    pairs, new_sig = minhash_incremental_pairs(
        batch_docs, existing, id_col=id_col, text_col=text_col, threshold=threshold
    )
    try:
        # Materialize before writing to what their plans read (parquet
        # file listing happens at execution time).
        pairs = pairs.localCheckpoint(eager=True)
        new_sig = new_sig.localCheckpoint(eager=True)
        _append_state(pairs, pairs_path, batch_id)
        _append_state(new_sig, sig_path, batch_id)
    finally:
        # minhash_signatures caches per batch; the direct unpersist()
        # this replaced was a no-op (it targeted a derived filter, not
        # the persisted plan) — the registry tracks the real one.
        from ..operators.graph import release_ann_caches

        release_ann_caches()


def run_streaming_near_dedup(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    max_files_per_trigger: int = 1,
) -> None:
    """Drain the documents backlog through the incremental index check
    (Available-Now trigger; re-running after new files land processes
    only the new files)."""
    schema = spark.read.parquet(docs_dir).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )
    sig_path = os.path.join(out_dir, "signatures")
    pairs_path = os.path.join(out_dir, "pairs")

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        check_batch_against_index(
            batch_df, sig_path, pairs_path, batch_id, threshold
        )

    q = (
        raw.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(on_batch)
        .start()
    )
    q.awaitTermination()


def run_streaming_ivf_ingest(
    spark: SparkSession,
    emb_dir: str,
    index_path: str,
    checkpoint_dir: str,
    centroids,
    max_files_per_trigger: int = 1,
) -> None:
    """Streaming ANN-index ingest: each arriving embedding batch is
    assigned to the frozen trained centroids (map-only, no retrain) and
    appended to the persisted inverted file, partitioned by cell so
    probes keep reading only probed cells. Same posture as the near-dedup
    loop: the index lives on storage, grows monotonically, and re-runs
    process only new files (file-source checkpoint). Assignment is
    per-vector, so the streamed index is bit-identical to a from-scratch
    rebuild over the same corpus (tested)."""
    from ..operators.ivf import ivf_append_batch

    schema = spark.read.parquet(emb_dir).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(emb_dir)
    )

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        ivf_append_batch(batch_df, centroids).write.mode("append").partitionBy(
            "cell"
        ).parquet(index_path)

    q = (
        raw.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(on_batch)
        .start()
    )
    q.awaitTermination()


def run_streaming_pq_ingest(
    spark: SparkSession,
    emb_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    codebook,
    max_files_per_trigger: int = 1,
) -> None:
    """Streaming PQ-index ingest: each arriving embedding batch encodes
    against the frozen codebook (map-only broadcast argmin) and its
    PACKED codes append to the persisted code table — the ANN index
    grows at 8 bytes/vector while the stream flows. Same monotone-index
    posture as the IVF ingest above; encoding is per-vector, so the
    streamed code table is bit-identical to a from-scratch encode of the
    same corpus (tested in test_pq.py)."""
    from ..operators.pq import pack_codes, pq_append_batch

    schema = spark.read.parquet(emb_dir).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(emb_dir)
    )

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        pack_codes(pq_append_batch(batch_df, codebook)).write.mode(
            "append"
        ).parquet(f"{index_dir}/codes")

    q = (
        raw.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(on_batch)
        .start()
    )
    q.awaitTermination()


VECTOR_INDEX_SCHEMA = "id LONG, embedding ARRAY<FLOAT>, nrm DOUBLE"
TOPK_STATE_SCHEMA = "query_id LONG, neighbor_id LONG, cos_sim DOUBLE"


def knn_maintain_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    k: int = 3,
    n_bands: int = 4,
    band_bits: int = 4,
) -> None:
    """One increment of streaming kNN-graph maintenance (see
    operators/graph.knn_topk_append_batch for the semantics and the
    batch-split-invariance contract).

    State layout under ``index_dir``:

    * ``vectors/batch_id=N/`` — the vector index, appended per batch
      via a dynamic partition OVERWRITE of this batch's own partition:
      a foreachBatch replay rewrites the same partition instead of
      duplicating rows (replay-idempotent), and the candidate join
      reads existing vectors as ``batch_id != current`` so a replay
      after a partial commit scores the same candidate set.
    * ``topk/`` — the directed top-k state, a full functional rewrite
      per batch committed through the crash-atomic generation pattern
      of :mod:`.sketches` (``gen=N`` data first, manifest pointer last,
      ``os.replace`` atomic): a crash mid-rewrite leaves the previous
      generation readable, so a foreachBatch replay folds the batch
      into the REAL prior state instead of silently resetting to empty
      — the in-place ``_SUCCESS``-gated overwrite this replaced could
      permanently drop all prior neighbors on a crash between delete
      and commit (ADVICE r6). Edge-count-bounded at n x k rows; at
      100 TB rewrite only the touched query_ids via MERGE/replace
      instead.
    """
    from ..operators.graph import knn_topk_append_batch
    from .sketches import commit_state, read_state

    # Same lesson as merge_into's source checkpoint: a batch frame
    # LAZILY derived from the index itself (a replay re-fed from
    # vectors/, tests do exactly this) would be re-read AFTER its own
    # partition is overwritten below. One eager batch-sized checkpoint
    # closes the read-overwrite hazard for any batch provenance.
    batch_df = batch_df.localCheckpoint(eager=True)
    spark = batch_df.sparkSession
    vec_path = os.path.join(index_dir, "vectors")
    topk_path = os.path.join(index_dir, "topk")
    has_vecs = os.path.exists(vec_path) and any(
        n.startswith("batch_id=") for n in os.listdir(vec_path)
    )
    if has_vecs:
        existing_vecs = (
            spark.read.parquet(vec_path)
            .filter(F.col("batch_id") != batch_id)
            .select("id", "embedding", "nrm")
        )
    else:
        existing_vecs = spark.createDataFrame([], VECTOR_INDEX_SCHEMA)
    existing_topk = read_state(spark, topk_path, TOPK_STATE_SCHEMA)
    if existing_topk is None:
        existing_topk = spark.createDataFrame([], TOPK_STATE_SCHEMA)

    updated, new_vecs = knn_topk_append_batch(
        batch_df,
        existing_vecs,
        existing_topk,
        k=k,
        n_bands=n_bands,
        band_bits=band_bits,
    )
    # Vector index first (a replay overwrites the same batch_id
    # partition, which `updated` never reads — it filters batch_id !=
    # current); then the state generation. A crash between the two
    # replays the batch against the OLD topk gen + the committed
    # vectors, reproducing the same new generation. The old generation
    # stays on disk untouched while gen N+1 is built, so `updated` can
    # read it lazily during the write — no checkpoint-before-overwrite
    # dance (commit_state's contract).
    new_vecs.withColumn("batch_id", F.lit(batch_id)).write.mode(
        "overwrite"
    ).option("partitionOverwriteMode", "dynamic").partitionBy(
        "batch_id"
    ).parquet(vec_path)
    commit_state(updated, topk_path)


def read_knn_topk(spark: SparkSession, index_dir: str) -> DataFrame:
    """Current committed directed top-k state of a streaming kNN index
    (query_id, neighbor_id, cos_sim). Raises if no generation has
    committed yet."""
    from .sketches import read_state

    state = read_state(
        spark, os.path.join(index_dir, "topk"), TOPK_STATE_SCHEMA
    )
    if state is None:
        raise FileNotFoundError(
            f"no committed kNN top-k state under {index_dir!r}: run "
            "run_streaming_knn_maintenance over at least one batch first"
        )
    return state


def run_streaming_knn_maintenance(
    spark: SparkSession,
    emb_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    k: int = 3,
    n_bands: int = 4,
    band_bits: int = 4,
    max_files_per_trigger: int = 1,
) -> None:
    """Streaming kNN-graph maintenance: each arriving embedding batch
    joins the persisted banded-signature candidate space, is exactly
    cosine-scored against its bucket matches, and the directed top-k
    state is re-ranked — completing the incremental-ANN story alongside
    the MinHash near-dedup index, the IVF cell ingest and the PQ code
    ingest. The final state is invariant to how the corpus was split
    into batches, and its edge derivation equals the uncapped batch
    build (both pytest-pinned)."""
    schema = spark.read.parquet(emb_dir).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(emb_dir)
    )

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        knn_maintain_batch(
            batch_df, batch_id, index_dir, k=k, n_bands=n_bands,
            band_bits=band_bits,
        )

    q = (
        raw.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(on_batch)
        .start()
    )
    q.awaitTermination()


CONTAINMENT_SETS_SCHEMA = "id LONG, s ARRAY<BIGINT>"
CONTAINMENT_PREFIX_SCHEMA = "id LONG, h BIGINT"


def containment_check_batch(
    batch_docs: DataFrame,
    state_dir: str,
    pairs_path: str,
    batch_id: int,
    threshold_num: int = 4,
    threshold_den: int = 5,
) -> None:
    """One increment of streaming containment checking: pairs for
    ``batch_docs`` vs the persisted set/prefix index at ``state_dir``
    (created if absent), then index append — the containment face of
    :func:`check_batch_against_index`. Exactness contract (the frozen-
    prefix argument) and single-emission guarantee are pinned in
    tests/test_training_ops.py::test_containment_incremental_union_equals_batch.

    All three state writes (pairs, sets, prefix) land as the batch's own
    ``batch_id=N`` partition via dynamic overwrite and the index reads
    exclude the current batch — a foreachBatch replay after a crash
    between the writes and the checkpoint commit rewrites the same
    partitions instead of duplicating index rows (duplicated sets rows
    would otherwise multiply verify-join output on every later batch;
    ADVICE r7).

    Scale posture (measured, SCALE_r8.md): the incremental form cannot
    collapse identical shingle sets (collapse keys depend on full-corpus
    membership — emission would become batch-dependent), so on a
    REPLICA-HEAVY backlog every replica probes full posting lists and
    cost degrades toward the blocked quadratic (a 100x-replica corpus
    spills unboundedly). Route duplicate-heavy BACKLOGS through the
    batch build (``containment_pairs``, collapse-on); this incremental
    index is the steady-state path for the clean frontier, where its
    per-delivery wall is flat and a full drain costs one batch rebuild."""
    from ..operators.dedup import containment_incremental_pairs
    from ..operators.graph import release_ann_caches
    from .corpus import _append_state, _read_state_parts

    spark = batch_docs.sparkSession
    sets_path = os.path.join(state_dir, "sets")
    prefix_path = os.path.join(state_dir, "prefix")
    # Read each side independently: a first-batch crash between the
    # sets and prefix writes leaves one directory without the other.
    sets = _read_state_parts(spark, sets_path, None, batch_id)
    prefix = _read_state_parts(spark, prefix_path, None, batch_id)
    sets = (
        spark.createDataFrame([], CONTAINMENT_SETS_SCHEMA)
        if sets is None
        else sets.select("id", "s")
    )
    prefix = (
        spark.createDataFrame([], CONTAINMENT_PREFIX_SCHEMA)
        if prefix is None
        else prefix.select("id", "h")
    )
    pairs, new_sets, new_prefix = containment_incremental_pairs(
        batch_docs,
        sets,
        prefix,
        threshold_num=threshold_num,
        threshold_den=threshold_den,
    )
    # materialize before writing to what their plans read
    pairs = pairs.localCheckpoint(eager=True)
    new_sets = new_sets.localCheckpoint(eager=True)
    new_prefix = new_prefix.localCheckpoint(eager=True)
    _append_state(pairs, pairs_path, batch_id)
    _append_state(new_sets, sets_path, batch_id)
    _append_state(new_prefix, prefix_path, batch_id)
    release_ann_caches()  # per-batch set cache (bounded loop)


def run_streaming_containment(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> None:
    """Drain the documents backlog through the incremental containment
    check (Available-Now trigger; re-runs process only new files)."""
    schema = spark.read.parquet(docs_dir).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )
    state_dir = os.path.join(out_dir, "index")
    pairs_path = os.path.join(out_dir, "pairs")

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        containment_check_batch(batch_df, state_dir, pairs_path, batch_id)

    q = (
        raw.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(on_batch)
        .start()
    )
    q.awaitTermination()
