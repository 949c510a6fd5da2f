"""Streaming joins.

  * stream-static: a streaming fact enriched by a batch dimension — the
    dimension is re-read per micro-batch (picks up slowly-changing dims);
    broadcast when small.
  * stream-stream: two watermarked streams joined within a time bound
    (attribution: purchase within 1 hour after a click, same user).
    State on both sides is evicted past the watermark + interval bound —
    the only way a stream-stream join stays bounded at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._util import ensure_tz_timestamp


def stream_static_enrich(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Enrich a streaming frame with a static (batch) dimension."""
    return stream.join(F.broadcast(dim), on, "left")


def click_purchase_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    watermark: str = "2 hours",
    attribution_window: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: each purchase attributed to a prior
    click by the same user within the attribution window.

    ``how="left_outer"`` preserves unattributed purchases with a null
    click: Spark holds each purchase in join state until the watermark
    passes its attribution bound (the state timeout), then emits it
    null-extended — so unmatched results trail the data by the watermark
    delay, and state on both sides stays bounded. Requires both streams
    watermarked and the time-bound condition (both enforced here)."""
    if how not in ("inner", "left_outer", "leftouter", "left"):
        raise ValueError(
            f"stream-stream attribution supports inner/left_outer, got {how!r}"
        )
    clicks = ensure_tz_timestamp(clicks, "ts")
    purchases = ensure_tz_timestamp(purchases, "ts")
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", watermark)
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {attribution_window}")
        ),
        how,
    ).select("purchase_id", "click_id", "p_user", "click_ts", "purchase_ts", "purchase_value")
