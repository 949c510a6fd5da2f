"""Streaming-state compaction: fold a batch_id-partitioned state
directory (one partition per micro-batch delivery — the layout every
foreachBatch writer in this package uses, see :mod:`.corpus`
``_append_state``) into ONE consolidated partition, without changing
what any reader computes.

Why this is a 100 TB capability and not housekeeping: every delivery
adds one ``batch_id=N`` partition holding that batch's state partial,
so after B deliveries a merge-read opens B partitions and re-reduces
B x (partial rows) every time — the per-delivery cost of the streaming
substring/Gram/corpus indexes grows with the NUMBER OF DELIVERIES even
when the merged state itself is small. Compaction rewrites the covered
partitions as one pre-reduced partition: the merge-read becomes
distinct-key-bound instead of delivered-partial-bound, and the file
count drops from O(batches x shuffle partitions) to one directory.

Correctness contract (all pytest-pinned in tests/test_compaction.py):

* **Read equivalence**: for a state whose consumers reduce with an
  associative, commutative merge (min/max postings, int64 Gram sums,
  plain row append), the compacted directory merge-reads BIT-IDENTICAL
  to the uncompacted one — compaction applies the same reduction the
  readers apply, just earlier.
* **Replay safety**: the consolidated partition lives at
  ``batch_id = -1``; Structured Streaming batch ids are non-negative,
  so a replayed delivery can never collide with it. When
  ``checkpoint_dir`` is passed, partitions whose batch id has no commit
  file are EXCLUDED from the fold — an in-flight delivery that crashed
  mid-batch keeps its own partition and is deterministically rewritten
  by the replay, exactly as without compaction. Sum-merged states
  (the Gram) MUST pass ``checkpoint_dir``: folding an uncommitted
  partial and then replaying it would double-count (min/max and
  append-only states are idempotent under that duplication; sums are
  not).
* **Crash safety**: compaction itself is staged — (1) write the
  reduced rows plus a covered-ids manifest to a staging directory,
  (2) delete the covered source partitions, (3) one atomic rename of
  the staged data into ``batch_id=-1``, (4) remove staging. A crash at
  any point is repaired by :func:`recover_compaction` (called
  automatically on the next compaction): manifest absent -> staging is
  incomplete garbage, drop it, state untouched; manifest present ->
  the staged data is authoritative for the covered ids, so re-running
  phases 2-4 is idempotent. Chaos-tested phase by phase.

Not supported: compacting WHILE a stream is actively delivering to the
same state directory (the delete/rename window would be visible to a
concurrent merge-read). Run it between drains — the Available-Now
triggers this package uses make "between runs" a natural, frequent
state.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CONSOLIDATED_BATCH_ID = -1

_STAGING_SUFFIX = ".compact_staging"
_MANIFEST = "_COMPACT_MANIFEST.json"
_PART_RE = re.compile(r"^batch_id=(-?\d+)$")


def committed_batch_ids(checkpoint_dir: str) -> set[int]:
    """Batch ids with a commit file in the Structured Streaming
    checkpoint — the deliveries whose foreachBatch completed. Anything
    else that left state behind was in-flight at a crash and WILL be
    replayed."""
    commits = os.path.join(checkpoint_dir, "commits")
    if not os.path.isdir(commits):
        return set()
    out = set()
    for name in os.listdir(commits):
        if name.isdigit():
            out.add(int(name))
    return out


def _partition_ids(path: str) -> list[int]:
    if not os.path.isdir(path):
        return []
    out = []
    for name in os.listdir(path):
        m = _PART_RE.match(name)
        if m and os.path.isdir(os.path.join(path, name)):
            out.append(int(m.group(1)))
    return sorted(out)


def _staging_dir(path: str) -> str:
    return path.rstrip("/") + _STAGING_SUFFIX


def recover_compaction(path: str) -> str:
    """Repair an interrupted compaction of ``path``. Returns one of
    'clean' (no staging present), 'dropped' (incomplete staging
    discarded — the state was never touched), or 'completed' (the
    staged fold was authoritative and phases 2-4 were re-applied)."""
    staging = _staging_dir(path)
    if not os.path.isdir(staging):
        return "clean"
    manifest_path = os.path.join(staging, _MANIFEST)
    if not os.path.exists(manifest_path):
        # Phase 1 never finished: the staged rows are garbage and the
        # source partitions are all still in place.
        shutil.rmtree(staging)
        return "dropped"
    with open(manifest_path) as fh:
        covered = set(json.load(fh)["covered"])
    data_dir = os.path.join(staging, "data")
    if os.path.isdir(data_dir):
        # Crash during phase 2 or before phase 3: finish the deletes,
        # then install the staged data.
        for bid in covered:
            part = os.path.join(path, f"batch_id={bid}")
            if os.path.isdir(part):
                shutil.rmtree(part)
        os.rename(data_dir, os.path.join(path, f"batch_id={CONSOLIDATED_BATCH_ID}"))
    # data_dir absent => phase 3 already ran; only cleanup remains.
    shutil.rmtree(staging)
    return "completed"


def compact_batch_state(
    spark: SparkSession,
    path: str,
    merge: Callable[[DataFrame], DataFrame] | None = None,
    checkpoint_dir: str | None = None,
) -> dict:
    """Fold the committed ``batch_id=N`` partitions of ``path`` into one
    ``batch_id=-1`` partition.

    ``merge`` receives the union of the covered partitions (without the
    ``batch_id`` column) and must apply the SAME reduction the state's
    readers apply on merge-read (e.g. ``postings_merge``,
    ``gram_merge``); ``None`` keeps rows as-is (pure file compaction
    for append-only states). ``checkpoint_dir`` scopes the fold to
    committed deliveries — REQUIRED for sum-merged states, recommended
    always; without it every present partition is assumed committed
    (safe only between clean drains).

    Returns ``{"covered": [...], "skipped": [...], "rows": n}``.
    """
    recover_compaction(path)
    present = _partition_ids(path)
    committed = committed_batch_ids(checkpoint_dir) if checkpoint_dir else None
    covered, skipped = [], []
    for bid in present:
        if (
            bid == CONSOLIDATED_BATCH_ID
            or committed is None
            or bid in committed
        ):
            covered.append(bid)
        else:
            skipped.append(bid)
    if len(covered) <= 1:
        return {"covered": [], "skipped": skipped, "rows": 0}

    staging = _staging_dir(path)
    if os.path.isdir(staging):  # pragma: no cover - recover() handled it
        shutil.rmtree(staging)
    data_dir = os.path.join(staging, "data")

    src = spark.read.parquet(
        *[os.path.join(path, f"batch_id={bid}") for bid in covered]
    )
    folded = merge(src) if merge is not None else src
    # Phase 1: stage the reduced rows, manifest written LAST (its
    # presence marks the staging as complete and authoritative).
    folded.write.mode("overwrite").parquet(data_dir)
    n_rows = spark.read.parquet(data_dir).count()
    with open(os.path.join(staging, _MANIFEST), "w") as fh:
        json.dump({"covered": covered}, fh)
    # Phase 2: drop the source partitions.
    for bid in covered:
        part = os.path.join(path, f"batch_id={bid}")
        if os.path.isdir(part):
            shutil.rmtree(part)
    # Phase 3: one atomic rename installs the consolidated partition.
    os.rename(data_dir, os.path.join(path, f"batch_id={CONSOLIDATED_BATCH_ID}"))
    # Phase 4: staging (incl. manifest) goes away.
    shutil.rmtree(staging)
    return {"covered": covered, "skipped": skipped, "rows": n_rows}


# ---------------------------------------------------------------------
# Canned merge reductions — each mirrors its reader's merge-read.
# ---------------------------------------------------------------------

def postings_merge(df: DataFrame) -> DataFrame:
    """Gram-postings state (streaming/substring.py): (gram, lo, hi)
    with min-of-mins / max-of-maxes — idempotent, so safe even if a
    folded delivery is also replayed."""
    return df.groupBy("gram").agg(
        F.min("lo").alias("lo"), F.max("hi").alias("hi")
    )


def gram_merge(df: DataFrame) -> DataFrame:
    """Quantized Gram state (streaming/linalg.py): (i, j, qsum) int64
    sums — exact in any order, but NOT idempotent: compact this state
    only with ``checkpoint_dir`` so an in-flight delivery is never both
    folded and replayed."""
    return df.groupBy("i", "j").agg(F.sum("qsum").alias("qsum"))


def counts_merge(*keys: str) -> Callable[[DataFrame], DataFrame]:
    """Generic keyed-count state: SUM the ``c`` column over ``keys`` —
    the bigram-LM uni/bi tables (streaming/lm_bigram.py) and any other
    (key..., c) count partial. Sum-merged, so NOT idempotent: like the
    Gram, compact only with ``checkpoint_dir``."""

    def merge(df: DataFrame) -> DataFrame:
        return df.groupBy(*keys).agg(F.sum("c").cast("long").alias("c"))

    return merge
