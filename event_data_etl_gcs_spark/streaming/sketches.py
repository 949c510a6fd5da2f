"""Streaming sketch maintenance: per-day HLL distinct sketches kept
up to date by a stream, merged on read for any date range.

The streaming face of the `hll_distinct_rollup` batch query: Datasketches
HLL sketches are mergeable state, so a stream maintains ONE small row per
(day) — not per user — and a distinct-count query over any range is a
sketch union over the covered days. At 100 TB this replaces re-scanning
history for every "distinct users last N days" ask with a merge over N
binary blobs.

foreachBatch (at-least-once) + idempotent per-batch union: each batch's
day-partial sketch is unioned into the stored sketch. HLL union is
idempotent for REPLAYED IDENTICAL input (register max), so a crash-replay
of the same micro-batch cannot inflate the count — the property that
makes HLL (unlike a raw counter) safe under foreachBatch redelivery.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import ensure_tz_timestamp

SKETCH_SCHEMA = "day TIMESTAMP, sk BINARY"

# ---------------------------------------------------------------------------
# Crash-atomic state storage (ADVICE r3): overwriting the live state dir
# in place deletes it before rewriting, so a crash in between loses state
# that the streaming checkpoint has already committed — those batches are
# never replayed and the rebuilt state silently misses them. Instead each
# new state generation is written to an immutable gen=N directory (data
# files + _SUCCESS fully written first) and then a tiny manifest pointer
# is advanced with os.replace (atomic on POSIX): readers see either the
# old complete generation or the new one, never nothing. Same pattern as
# sources/versioned.py. Older generations are pruned only AFTER the
# pointer has moved past them (keep current + previous as crash fallback).
# ---------------------------------------------------------------------------

STATE_MANIFEST = "_state_manifest.json"


def _state_current_gen(state_dir: str) -> int:
    p = os.path.join(state_dir, STATE_MANIFEST)
    if not os.path.exists(p):
        return 0
    with open(p) as f:
        return int(json.load(f)["current"])


def read_state(
    spark: SparkSession, state_dir: str, schema: str | None = None
) -> DataFrame | None:
    """Current state generation, or None if no generation committed yet."""
    gen = _state_current_gen(state_dir)
    if gen == 0:
        return None
    reader = spark.read.schema(schema) if schema else spark.read
    return reader.parquet(os.path.join(state_dir, f"gen={gen}"))


def commit_state(df: DataFrame, state_dir: str) -> int:
    """Write the next state generation, data first / pointer last; prune
    generations older than the previous one. Returns the new gen number.
    Because gen N is built while gen N-1 stays on disk untouched, the
    merged plan can read the old state lazily during the write — no
    cache-materialize-before-overwrite dance is needed."""
    gen = _state_current_gen(state_dir) + 1
    gen_dir = os.path.join(state_dir, f"gen={gen}")
    # The manifest pointer proves any gen > current is uncommitted garbage
    # (a crash between data write and pointer advance). Clear it so a
    # checkpoint-replayed retry of the same batch can recommit instead of
    # wedging on errorifexists forever (ADVICE r4). Safe: foreachBatch is
    # single-writer, so errorifexists below only guards same-process
    # double-writes, which remain a hard error.
    if os.path.exists(gen_dir):
        shutil.rmtree(gen_dir)
    df.write.mode("errorifexists").parquet(gen_dir)
    tmp = os.path.join(state_dir, STATE_MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump({"current": gen}, f)
        f.flush()
        os.fsync(f.fileno())  # rename must not outlive its contents on power loss
    os.replace(tmp, os.path.join(state_dir, STATE_MANIFEST))
    try:  # persist the rename itself (directory entry) across power loss
        dfd = os.open(state_dir, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
    except OSError:
        pass  # platform without directory fsync: best effort
    for g in range(1, gen - 1):
        old = os.path.join(state_dir, f"gen={g}")
        if os.path.exists(old):
            shutil.rmtree(old)
    return gen


def batch_day_sketches(df: DataFrame, key_col: str = "user_id") -> DataFrame:
    """(day, sk): one HLL sketch row per event day (batch or micro-batch)."""
    df = ensure_tz_timestamp(df, "ts")
    return df.groupBy(F.date_trunc("DAY", "ts").alias("day")).agg(
        F.hll_sketch_agg(key_col).alias("sk")
    )


def merge_day_sketches(state: DataFrame, delta: DataFrame) -> DataFrame:
    """Union per-day partial sketches into the maintained table: existing
    days merge via hll_union, new days insert. Pure sketch algebra — the
    raw events are never rescanned."""
    return (
        state.unionByName(delta)
        .groupBy("day")
        .agg(F.hll_union_agg("sk").alias("sk"))
    )


def run_streaming_sketch_maintenance(
    spark: SparkSession,
    stream: DataFrame,
    state_dir: str,
    key_col: str = "user_id",
) -> None:
    """Drain a stream (Available-Now) maintaining the day-sketch table at
    state_dir. Parquet round-trips the sketch blobs losslessly."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        delta = batch_day_sketches(batch_df, key_col)
        state = read_state(spark, state_dir, SKETCH_SCHEMA)
        merged = merge_day_sketches(state, delta) if state is not None else delta
        commit_state(merged, state_dir)

    q = (
        stream.writeStream.trigger(availableNow=True)
        .foreachBatch(upsert)
        .option("checkpointLocation", state_dir + "_ckpt")
        .start()
    )
    q.awaitTermination()


def range_distinct_estimate(
    spark: SparkSession, state_dir: str, day_from: str, day_to: str
) -> DataFrame:
    """(est_distinct): sketch-union distinct estimate over [from, to] —
    the read path: merges <= a few hundred day rows, touches no events."""
    state = read_state(spark, state_dir, SKETCH_SCHEMA)
    if state is None:
        raise ValueError(f"no committed state generation at {state_dir}")
    return (
        state.filter(
            (F.col("day") >= F.lit(day_from)) & (F.col("day") <= F.lit(day_to))
        )
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_distinct"))
    )


# ---------------------------------------------------------------------------
# KMV maintenance — same posture for the k-minimum-values distinct sketch
# (operators/kmv.py): state is k rows per group, merge = set-union + re-rank.
# Union + min-k is idempotent for replayed identical input, so foreachBatch
# at-least-once redelivery cannot perturb the sketch — same safety argument
# as the HLL register max above.
# ---------------------------------------------------------------------------

KMV_STATE_SCHEMA = "grp STRING, h BIGINT"


def batch_kmv_rows(
    df: DataFrame, group_col: str = "event_type", value_col: str = "user_id"
) -> DataFrame:
    """(grp, h): this batch's per-group candidate minima (already top-k)."""
    from ..operators.kmv import kmv_sketch

    return kmv_sketch(df, group_col, value_col).select(
        F.col(group_col).alias("grp"), "h"
    )


def merge_kmv_rows(state: DataFrame, delta: DataFrame) -> DataFrame:
    """Set-union the hash rows, keep the k smallest per group."""
    from pyspark.sql import Window

    from ..operators.kmv import KMV_K

    u = state.unionByName(delta).distinct()
    w = Window.partitionBy("grp").orderBy("h")
    return (
        u.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .select("grp", "h")
    )


def run_streaming_kmv_maintenance(
    spark: SparkSession,
    stream: DataFrame,
    state_dir: str,
    group_col: str = "event_type",
    value_col: str = "user_id",
) -> None:
    """Drain a stream (Available-Now) maintaining the per-group KMV
    sketch table at state_dir — k rows per group, never the raw keys."""

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        delta = batch_kmv_rows(batch_df, group_col, value_col)
        state = read_state(spark, state_dir, KMV_STATE_SCHEMA)
        if state is None:
            state = delta.limit(0)
        commit_state(merge_kmv_rows(state, delta), state_dir)

    q = (
        stream.writeStream.trigger(availableNow=True)
        .foreachBatch(upsert)
        .option("checkpointLocation", state_dir + "_ckpt")
        .start()
    )
    q.awaitTermination()


# ---------------------------------------------------------------------------
# Partition-checksum maintenance — the digests of operators/validation.py
# are mergeable (sums mod P), so a stream keeps per-partition table
# checksums current without rescanning history. NOTE the replay caveat:
# unlike HLL/KMV (idempotent set algebra), checksum addition is NOT
# idempotent — so the state table keeps the last applied batch_id per
# partition and skips batches it has already folded in (the standard
# foreachBatch exactly-once recipe: idempotent-by-transaction-id).
# ---------------------------------------------------------------------------

CKSUM_STATE_SCHEMA = (
    "part STRING, n_rows BIGINT, checksum BIGINT, checksum2 BIGINT, "
    "last_batch BIGINT"
)


def run_streaming_checksum_maintenance(
    spark: SparkSession,
    stream: DataFrame,
    state_dir: str,
    part_expr: str,
    canonical_sql: str,
) -> None:
    from ..operators.text import HASH_P
    from ..operators.validation import partition_checksums

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        delta = partition_checksums(batch_df, part_expr, canonical_sql)
        state = read_state(spark, state_dir, CKSUM_STATE_SCHEMA)
        if state is not None:
            if (
                state.filter(F.col("last_batch") >= batch_id).count() > 0
            ):  # replayed batch: already folded in, skip (non-idempotent add)
                return
            merged = (
                state.select("part", "n_rows", "checksum", "checksum2")
                .unionByName(delta)
                .groupBy("part")
                .agg(
                    F.sum("n_rows").cast("long").alias("n_rows"),
                    (F.sum("checksum") % HASH_P).cast("long").alias("checksum"),
                    (F.sum("checksum2") % HASH_P).cast("long").alias("checksum2"),
                )
            )
        else:
            merged = delta
        commit_state(
            merged.withColumn("last_batch", F.lit(batch_id).cast("long")),
            state_dir,
        )

    q = (
        stream.writeStream.trigger(availableNow=True)
        .foreachBatch(upsert)
        .option("checkpointLocation", state_dir + "_ckpt")
        .start()
    )
    q.awaitTermination()


def run_streaming_hdr_maintenance(
    spark: SparkSession,
    stream: DataFrame,
    state_dir: str,
) -> None:
    """Maintain the mergeable quantile sketch (operators/histsketch.py)
    from a stream. COUNT deltas are not replay-idempotent the way HLL
    unions are, so each batch's partial rows carry their batch_id and a
    redelivered batch REPLACES its own prior rows (delete-then-insert
    inside the crash-atomic generation commit); everything older than
    the live batch folds into one batch_id=-1 row set, bounding state at
    ~2x days x buckets regardless of batch count."""
    from pyspark.sql import functions as F

    from ..operators.histsketch import day_histogram_sketch

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        delta = day_histogram_sketch(batch_df).withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        )
        state = read_state(
            spark, state_dir, "day TIMESTAMP, bin BIGINT, cnt BIGINT, batch_id BIGINT"
        )
        if state is not None:
            merged = state.filter(F.col("batch_id") != batch_id).unionByName(delta)
        else:
            merged = delta
        compacted = (
            merged.withColumn(
                "batch_id",
                F.when(F.col("batch_id") == batch_id, F.col("batch_id")).otherwise(
                    F.lit(-1).cast("long")
                ),
            )
            .groupBy("day", "bin", "batch_id")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
            .select("day", "bin", "cnt", "batch_id")
        )
        commit_state(compacted, state_dir)

    q = (
        stream.writeStream.trigger(availableNow=True)
        .foreachBatch(upsert)
        .option(
            "checkpointLocation", os.path.join(state_dir, "_checkpoint")
        )
        .start()
    )
    q.awaitTermination()


def read_hdr_quantiles(
    spark: SparkSession,
    state_dir: str,
    probs: tuple[float, ...] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Quantiles from the maintained sketch state — a prefix-sum walk
    over a few hundred rows, never the event history."""
    from ..operators.histsketch import merged_quantiles

    state = read_state(
        spark, state_dir, "day TIMESTAMP, bin BIGINT, cnt BIGINT, batch_id BIGINT"
    )
    if state is None:
        raise FileNotFoundError(
            f"no committed HDR sketch state in {state_dir!r}: run "
            "run_streaming_hdr_maintenance over at least one batch first"
        )
    return merged_quantiles(state.select("bin", "cnt"), probs)
