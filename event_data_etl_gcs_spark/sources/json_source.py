"""JSON-lines event source with an explicit schema contract.

Reference: ``spark.read.json(path, schema=...)`` at
``spark-jobs/sparkify_etl.py:44,115`` (globs at ``:30,92``; single-file
incremental variant ``sparkify_etl_2.py:30,54``).

Improvements over the reference (SURVEY.md §1.4):
  * PERMISSIVE mode with a corrupt-record column instead of silently
    dropping malformed rows — the engine-level replacement for the
    orchestration-level quarantine (``dags/sparkify_dag.py:137-143``).
  * Works identically for a glob, a directory, or one named file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_json_events(
    spark: SparkSession,
    path: str,
    schema: StructType,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read JSON-lines with a declared schema (no inference pass).

    With ``keep_corrupt=True`` the returned frame carries a
    ``_corrupt_record`` column holding the raw text of unparseable rows;
    callers route those to a dead-letter sink instead of failing the job.
    """
    read_schema = schema
    if keep_corrupt and CORRUPT_COL not in schema.fieldNames():
        read_schema = StructType(
            list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
        )
    return (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .schema(read_schema)
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good_rows_without_corrupt_col, corrupt_rows) — dead-letter split.

    Spark disallows queries that reference *only* the internal corrupt
    column of a JSON scan; caching materializes the parsed rows first
    (the documented workaround), and both halves reuse the same scan.
    """
    df = df.cache()
    good = df.filter(df[CORRUPT_COL].isNull()).drop(CORRUPT_COL)
    bad = df.filter(df[CORRUPT_COL].isNotNull())
    return good, bad
