"""Surrogate-key functions.

The reference keys its fact table with ``monotonically_increasing_id()``
(``spark-jobs/sparkify_etl.py:206``) — partition-encoded, non-dense,
run-dependent (SURVEY.md §4.3-5). We expose both that (cheap, narrow, fine
when stability doesn't matter) and a deterministic alternative for golden
tests and reproducible pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def monotonic_id() -> Column:
    """Partition-encoded 64-bit id — unique per run, NOT stable across
    runs or repartitioning. Narrow (no shuffle)."""
    return F.monotonically_increasing_id()


def stable_row_id(df: DataFrame, order_by: list[str], name: str = "row_id") -> DataFrame:
    """Deterministic dense 1-based id by an explicit total order.

    Costs one global sort (single-partition window) — acceptable for
    dimension-sized frames; for 100 TB facts prefer ``monotonic_id`` or a
    key derived from the data (e.g. xxhash64 of natural keys).
    """
    w = Window.orderBy(*[F.col(c) for c in order_by])
    return df.withColumn(name, F.row_number().over(w))


def content_hash_id(*cols: str) -> Column:
    """Collision-resistant-enough 64-bit key from natural columns —
    deterministic, shuffle-free, scales to any size."""
    return F.xxhash64(*[F.col(c) for c in cols])
