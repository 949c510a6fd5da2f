"""Shared streaming helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ensure_tz_timestamp(df: DataFrame, *cols: str) -> DataFrame:
    """Cast TIMESTAMP_NTZ event-time columns to TIMESTAMP.

    ``withWatermark`` requires a TZ-aware TIMESTAMP column
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE otherwise), but parquet written
    without the isAdjustedToUTC flag reads back as NTZ. With the session
    TZ pinned UTC the cast relabels the type without changing values, so
    streaming results equal their batch counterparts. Works on both batch
    and streaming frames (pure projection).
    """
    dtypes = dict(df.dtypes)
    for col in cols:
        if dtypes.get(col) == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df
