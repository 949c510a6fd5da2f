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


def stream_interval_overlap(
    left: DataFrame,
    right: DataFrame,
    l_key: str = "l_key",
    r_key: str = "r_key",
    watermark: str = "2 hours",
    max_len: str = "30 minutes",
) -> DataFrame:
    """Stream-stream INTERVAL overlap join: emit every (left, right) pair
    with equal keys whose closed time intervals [l_start, l_end] and
    [r_start, r_end] overlap.

    Column contract: left carries (l_key, l_start, l_end), right carries
    (r_key, r_start, r_end) — timestamp bounds, caller-staged (distinct
    names keep the stream-stream condition unambiguous).

    Spark's stream-stream state eviction needs a closed time range
    BETWEEN THE TWO WATERMARKED COLUMNS; a raw overlap predicate
    (l_start <= r_end AND r_start <= l_end) relates each side's
    watermark to the *other side's end*, which is unbounded in general.
    Declaring a maximum interval length closes it: with
    end <= start + max_len on both sides, overlap implies
    |l_start - r_start| <= max_len, and that explicit start-to-start
    band is added to the join condition so the state bound is derivable
    and both sides' buffers stay O(watermark + max_len). Rows violating
    the length contract are dropped at entry (they would silently miss
    matches otherwise — a loud filter beats a wrong join).

    This is the streaming analogue of
    ``operators.temporal_joins.interval_overlap_join``: the batch slab
    explosion is replaced by the watermark time-band, which plays the
    same role — confining candidate pairs to near-in-time rows.
    """
    l = ensure_tz_timestamp(ensure_tz_timestamp(left, "l_start"), "l_end")
    r = ensure_tz_timestamp(ensure_tz_timestamp(right, "r_start"), "r_end")
    bound = F.expr(f"INTERVAL {max_len}")
    l = l.filter(F.col("l_end") <= F.col("l_start") + bound).withWatermark(
        "l_start", watermark
    )
    r = r.filter(F.col("r_end") <= F.col("r_start") + bound).withWatermark(
        "r_start", watermark
    )
    cond = (
        (F.col(l_key) == F.col(r_key))
        & (F.col("l_start") <= F.col("r_end"))
        & (F.col("r_start") <= F.col("l_end"))
        # explicit start-to-start band: the state-eviction bound Spark
        # derives eviction from (implied by overlap + bounded length).
        & (F.col("l_start") >= F.col("r_start") - bound)
        & (F.col("r_start") >= F.col("l_start") - bound)
    )
    return l.join(r, cond, "inner")
