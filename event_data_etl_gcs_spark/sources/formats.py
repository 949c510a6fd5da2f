"""Interchange-format connectors beyond JSON/Parquet: CSV, ORC, text.

The reference reads JSON-lines and writes Parquet (SURVEY.md §2.1); a
complete engine also speaks the boring interchange formats. Same posture
as the JSON source (`json_source.py`): **explicit schemas, never
inference** — on a 100 TB lake, `inferSchema` means reading the data
twice and trusting sampled guesses; a declared `StructType` is one pass
and one contract (reference pins schemas at
`spark-jobs/sparkify_etl.py:24-41` for the same reason).

All readers return plain DataFrames — downstream operators don't know or
care which format a table arrived in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    delimiter: str = ",",
    mode: str = "FAILFAST",
) -> DataFrame:
    """CSV scan with a declared schema.

    FAILFAST by default: a malformed row is a data bug, not something to
    silently null out. Callers wanting quarantine semantics pass
    mode='PERMISSIVE' and a columnNameOfCorruptRecord column (the
    dead-letter pattern in `json_source.read_json_quarantine`).
    """
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("delimiter", delimiter)
        .option("mode", mode)
        # ISO-8601 with microseconds: round-trips the engine's UTC
        # session timestamps losslessly
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .csv(path)
    )


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    compression: str | None = "gzip",
    target_partitions: int | None = None,
) -> None:
    """CSV export. Same layout posture as every sink here: one file per
    partition, never coalesce(1) by default; size via target_partitions."""
    out = df.repartition(target_partitions) if target_partitions else df
    w = out.write.mode(mode).option("header", header)
    if compression:
        w = w.option("compression", compression)
    w.option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").csv(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan. ORC is self-describing (schema travels with the file),
    and Spark's reader supports the same predicate pushdown / column
    pruning as Parquet — a second columnar at-rest format for lakes that
    standardized on it."""
    return spark.read.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str = "zstd",
) -> None:
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """One row per line (`value` string) — the raw-corpus entry point
    before any parsing. Splittable for uncompressed/bzip2 inputs; a
    gzipped file is one task regardless of size (document the trap
    instead of hitting it at 100 TB: re-chunk gzip corpora at ingest)."""
    return spark.read.text(path)


def rechunk_gzip_jsonl(
    spark: SparkSession,
    src_glob: str,
    out_dir: str,
    schema: StructType,
    target_partitions: int = 64,
    mode: str = "overwrite",
) -> int:
    """One-time ingest fix for gzipped JSONL corpora: read the
    unsplittable .gz files (one task per FILE — the read itself cannot
    parallelize further; that is gzip, not Spark), immediately
    repartition, and land splittable parquet. Every downstream pass then
    scans with full parallelism instead of re-paying one-task-per-file
    on every query — at 100 TB this single pass is the difference
    between a cluster and a queue of single-threaded gunzips.

    Explicit schema (never inferSchema — that would read the gzip
    twice). Returns the row count landed."""
    df = (
        spark.read.schema(schema)
        .option("mode", "FAILFAST")
        .json(src_glob)
        .repartition(target_partitions)
    )
    df.write.mode(mode).parquet(out_dir)
    return spark.read.parquet(out_dir).count()


def read_binary_files(
    spark: SparkSession,
    path_glob: str,
    recursive: bool = False,
    max_bytes: int | None = None,
) -> DataFrame:
    """Whole-file binary ingestion via Spark's binaryFile source:
    (path, modificationTime, length, content) — the entry point for
    image/audio/video corpora that arrive as FILES, feeding the media
    contract (operators/multimodal.py). pathGlobFilter/recursive ride
    the option surface; `max_bytes` pushes a length predicate into the
    file index so oversized blobs are skipped without being read (at
    100 TB the skip happens at listing time, not scan time)."""
    reader = spark.read.format("binaryFile")
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.load(path_glob)
    if max_bytes is not None:
        df = df.filter(f"length <= {int(max_bytes)}")
    return df


def media_from_binary_files(
    spark: SparkSession,
    path_glob: str,
    mime: str = "application/octet-stream",
    max_bytes: int | None = None,
) -> DataFrame:
    """Adapt a directory of binary files to the media contract
    (media_id, payload, mime, meta): id = a stable hash of the file
    path, meta carries path + mtime for lineage. Plugs directly into
    decode_stub / decode_ppm / dhash_images — file-backed corpora and
    column-backed corpora share one decode surface."""
    from pyspark.sql import functions as F

    files = read_binary_files(spark, path_glob, max_bytes=max_bytes)
    return files.select(
        F.xxhash64("path").alias("media_id"),
        F.col("content").alias("payload"),
        F.lit(mime).alias("mime"),
        F.create_map(
            F.lit("path"), F.col("path"),
            F.lit("mtime"), F.col("modificationTime").cast("string"),
        ).alias("meta"),
    )
