"""Stream-static enrichment join.

The most common production streaming topology: an unbounded fact stream
joined against a bounded dimension. Spark supports stream-static joins
natively (the static side is re-read per micro-batch, so a dimension
refresh is picked up without restarting the query); broadcasting the
static side keeps the stream side shuffle-free — at cluster scale the
stream partitions flow straight through with a map-side hash join, which
is exactly the plan you want for a 100k events/sec enrichment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._util import ensure_tz_timestamp


def stream_static_enrich(
    stream: DataFrame,
    static_dim: DataFrame,
    on: list[str] | str,
    how: str = "left",
    broadcast_static: bool = True,
) -> DataFrame:
    """Enrich a streaming frame with a static dimension.

    Left join by default: an unknown key must not drop the fact row
    (stream rows are not retryable the way batch rows are). Inner and
    left_semi/left_anti are also stream-static-legal; right/full are not
    (Spark would need the unbounded side materialized) and raise here
    with a clear message instead of an analysis error at start().
    """
    if how in ("right", "rightouter", "full", "fullouter", "full_outer", "right_outer"):
        raise ValueError(
            f"stream-static {how} join is unsupported: the streaming side is "
            "unbounded; flip the join or stage the stream to a table first"
        )
    dim = F.broadcast(static_dim) if broadcast_static else static_dim
    return stream.join(dim, on, how)


def streaming_event_enrichment(
    stream: DataFrame,
    user_profile: DataFrame,
) -> DataFrame:
    """Events enriched with per-user profile columns (stream-static left
    broadcast join), event time normalized for downstream watermarking."""
    stream = ensure_tz_timestamp(stream, "ts")
    return stream_static_enrich(stream, user_profile, on="user_id", how="left")
