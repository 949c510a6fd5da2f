"""Explicit schema contracts.

The reference deliberately bypasses JSON schema inference with declared
``StructType`` schemas (song data ``spark-jobs/sparkify_etl.py:33-43``,
log data ``:95-114``); we keep that as the ingest contract. Nullability
flags are advisory on JSON read (SURVEY.md Q6) — a validation operator in
``operators.relational`` can enforce them.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# Song catalog corpus (reference: sparkify_etl.py:33-43).
SONG_DATA_SCHEMA = StructType(
    [
        StructField("artist_id", StringType(), False),
        StructField("artist_latitude", StringType(), True),
        StructField("artist_longitude", StringType(), True),
        StructField("artist_location", StringType(), True),
        StructField("artist_name", StringType(), False),
        StructField("song_id", StringType(), False),
        StructField("title", StringType(), False),
        StructField("duration", DoubleType(), False),
        StructField("year", IntegerType(), False),
    ]
)

# Listen-event log corpus (reference: sparkify_etl.py:95-114; ts is epoch
# milliseconds carried as a double).
LOG_DATA_SCHEMA = StructType(
    [
        StructField("artist", StringType(), True),
        StructField("auth", StringType(), False),
        StructField("firstName", StringType(), True),
        StructField("gender", StringType(), True),
        StructField("itemInSession", IntegerType(), False),
        StructField("lastName", StringType(), True),
        StructField("length", DoubleType(), True),
        StructField("level", StringType(), False),
        StructField("location", StringType(), True),
        StructField("method", StringType(), False),
        StructField("page", StringType(), False),
        StructField("registration", DoubleType(), True),
        StructField("sessionId", IntegerType(), False),
        StructField("song", StringType(), True),
        StructField("status", IntegerType(), False),
        StructField("ts", DoubleType(), False),
        StructField("userAgent", StringType(), True),
        StructField("userId", StringType(), True),
    ]
)

# Driver testdata tables (TESTDATA.md) — names used throughout queries.
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
