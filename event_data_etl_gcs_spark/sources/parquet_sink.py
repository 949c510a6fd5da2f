"""Partitioned Parquet sink.

Reference behaviors reproduced (SURVEY.md §2.1 S5-S7):
  * overwrite-mode partitioned writes
    (``spark-jobs/sparkify_etl.py:50-54,166-170,210-214``),
  * unpartitioned writes (``:70-72,141-143``).

Scale-posture replacements:
  * The reference's ``coalesce(1)`` (``sparkify_etl_2.py:79,107``) is NOT
    the default — it serializes the final stage through one task. We size
    output files by target rows-per-file instead; ``single_file=True``
    remains available for the small-export parity case.
  * Dynamic partition overwrite (set in session.py) so incremental runs
    replace only the partitions they produce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    target_partitions: int | None = None,
    single_file: bool = False,
    range_by: list[str] | None = None,
    sort_within_by: list[str] | None = None,
) -> None:
    """Parquet write with layout control.

    * ``range_by`` — repartitionByRange on these columns: files cover
      disjoint key ranges (globally clustered output; range predicates
      prune whole files via footer stats).
    * ``sort_within_by`` — sortWithinPartitions before writing: row
      groups inside each file get tight, disjoint min/max stats, so
      range predicates also skip row groups (property pinned in
      tests/test_scale_techniques2.py).
    """
    out = df
    if single_file:
        out = out.coalesce(1)
    elif range_by:
        out = (
            out.repartitionByRange(target_partitions, *range_by)
            if target_partitions
            else out.repartitionByRange(*range_by)
        )
    elif target_partitions is not None:
        if partition_by:
            # Cluster rows by the partition columns so each Hive partition
            # is written by few tasks -> few right-sized files, no
            # small-file explosion at high task counts.
            out = out.repartition(target_partitions, *partition_by)
        else:
            out = out.repartition(target_partitions)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    if partition_by:
        # Dynamic partition overwrite (session.py) commits via a staging
        # dir and skips the _SUCCESS marker; re-emit it so downstream
        # loads keep their commit gate (plans/runner.py is_load_ready).
        # The write HAS committed once writer.parquet() returns.
        import os

        if os.path.isdir(path) and not os.path.exists(
            os.path.join(path, "_SUCCESS")
        ):
            open(os.path.join(path, "_SUCCESS"), "w").close()


def export_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = "gzip",
    target_partitions: int | None = None,
) -> None:
    """JSONL export — the interchange format training/eval tooling
    consumes (one JSON object per line, optionally gzipped; Spark's JSON
    sink writes line-delimited JSON natively, one file per partition).

    Same layout posture as the parquet sink: never coalesce(1) by
    default; size output files via target_partitions. Binary columns
    are base64-encoded by Spark's JSON writer; timestamps serialize as
    ISO-8601 in the session timezone (UTC — pinned at load)."""
    out = df.repartition(target_partitions) if target_partitions else df
    w = out.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)
