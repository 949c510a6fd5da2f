"""Bucketed tables: shuffle-free co-located joins.

At 100 TB the dominant repeated cost is shuffling the fact table for
every join on its key. Writing fact and frequently-joined tables
bucketed by that key (`bucketBy(n, key).sortBy(key)`) makes subsequent
equi-joins and aggregations on the key shuffle-free: Catalyst recognizes
matching bucket specs on both sides and plans a SortMergeJoin with NO
Exchange. Trade-off: a one-time clustered write + a fixed bucket count
(pick ~2-4x expected executor count; resize means rewrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Persist as a bucketed table (parquet). Joins between tables
    bucketed on the same column with the same bucket count skip the
    exchange on both sides. With `path` the table is external (data at
    the given location); otherwise managed in the warehouse dir."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        num_buckets, bucket_col
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
