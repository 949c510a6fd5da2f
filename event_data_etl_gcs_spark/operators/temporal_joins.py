"""Temporal join operators Spark's API lacks: as-of join and range
(interval) join — expressed as compositions of native DataFrame ops
(SURVEY.md Phase 4 'custom operators' path (a): composition, not UDF).

As-of join (nearest previous match per key):
    Implemented with the union-sort-carry technique: tag both inputs,
    union on (key, ts), and per key in time order carry the last right
    row forward with a window `last(..., ignorenulls)`. ONE shuffle on
    the key — same cost class as a regular join, no point-in-time
    subqueries, no skew beyond the key distribution. This is the
    standard large-scale formulation (a sort-merge as-of).

Range join (value/interval containment):
    Naive form is a cross join with a BETWEEN filter — quadratic. The
    scale path buckets the range dimension: each interval is exploded to
    the fixed-width buckets it overlaps, probes join on their bucket,
    then an exact BETWEEN filter removes false positives. Join fan-out is
    bounded by interval_width/bucket_width + 1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach `right_values` from the right row with
    the greatest `right_ts` <= `left_ts` (strict: < ) within the same
    `on` key; nulls when no prior right row exists.

    Ties: a right row AT the left timestamp wins (non-strict), matching
    DuckDB's ASOF JOIN (>=) semantics. Multiple right rows at the same
    timestamp: the values of the last in (ts, natural input order) — pass
    pre-deduped right frames for full determinism.
    """
    lcols = left.columns
    # The implementation claims __ts/__is_left/__r_* internally and emits
    # right_values as top-level columns; colliding input names would
    # silently corrupt the union.
    reserved = {"__ts", "__is_left"} | {f"__r_{c}" for c in right_values}
    for side, cols in (("left", left.columns), ("right", right.columns)):
        clash = reserved.intersection(cols)
        if clash:
            raise ValueError(f"asof_join: {side} input uses reserved column names {sorted(clash)}")
    overlap = set(right_values).intersection(lcols)
    if overlap:
        raise ValueError(
            f"asof_join: right_values {sorted(overlap)} collide with left columns; "
            "rename one side first"
        )
    l_tagged = left.withColumn("__is_left", F.lit(1)).withColumn(
        "__ts", F.col(left_ts)
    )
    r_tagged = (
        right.select(
            F.col(on),
            F.col(right_ts).alias("__ts"),
            *[F.col(c).alias(f"__r_{c}") for c in right_values],
        )
        .withColumn("__is_left", F.lit(0))
    )
    for c in lcols:
        if c not in (on,):
            r_tagged = r_tagged.withColumn(c, F.lit(None))
    for c in right_values:
        l_tagged = l_tagged.withColumn(f"__r_{c}", F.lit(None))

    unioned = l_tagged.select(
        on, "__ts", "__is_left", *[c for c in lcols if c != on], *[f"__r_{c}" for c in right_values]
    ).unionByName(
        r_tagged.select(
            on, "__ts", "__is_left", *[c for c in lcols if c != on], *[f"__r_{c}" for c in right_values]
        )
    )

    # Right rows sort before left rows at equal ts (non-strict: a quote AT
    # the event time is visible to it); after left rows when strict.
    order_within_ts = F.col("__is_left").asc() if not strict else F.col("__is_left").desc()
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), order_within_ts)
        .rowsBetween(Window.unboundedPreceding, 0 if not strict else -1)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__carried_{c}")
            for c in right_values
        ],
    )
    out = carried.filter(F.col("__is_left") == 1).select(
        *lcols,
        *[F.col(f"__carried_{c}").alias(c) for c in right_values],
    )
    return out


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    start <= point < end, via fixed-width bucket co-partitioning.

    Each interval explodes to ceil(width/bucket_width)+1 bucket rows;
    points map to one bucket; the equi-join on bucket replaces the cross
    join, and the exact BETWEEN filter runs on candidates only.
    """
    p = points.withColumn(
        "__bucket", F.floor(F.col(point_col) / bucket_width).cast("long")
    )
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket_width).cast("long"),
                F.floor(F.col(end_col) / bucket_width).cast("long"),
            )
        ),
    )
    joined = p.join(iv, "__bucket", how).filter(
        (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) < F.col(end_col))
    )
    return joined.drop("__bucket")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_start: str = "l_start",
    left_end: str = "l_end",
    right_start: str = "r_start",
    right_end: str = "r_end",
    bucket_width: int = 1,
) -> DataFrame:
    """Interval-interval overlap join (closed intervals, numeric bounds):
    all (left, right) pairs sharing `keys` with
    left_start <= right_end AND right_start <= left_end.

    Spark has no native interval join; the naive spelling is a per-key
    cross join. Here both sides explode to the fixed-width slabs each
    interval covers, the join runs as an EQUI-join on (keys..., slab) —
    shuffle-partitioned, skew bounded by slab width — and the exact
    overlap predicate filters candidates only. A pair sharing k slabs
    would match k times; the CANONICAL-SLAB filter (emit only in slab
    max(left_start_slab, right_start_slab) — the first slab any
    overlapping pair shares) makes each pair match exactly once, with
    no distinct shuffle and no row collapsing if the inputs contain
    genuinely duplicate rows. Pick bucket_width ~ the typical interval
    length: each interval then explodes to ~2 slab rows, and a
    candidate bucket holds only near-in-time rows — at 100 TB this is
    the difference between a bounded equi-join and a hot-key cross join.
    """
    ls = F.floor(F.col(left_start) / bucket_width).cast("long")
    le = F.floor(F.col(left_end) / bucket_width).cast("long")
    rs = F.floor(F.col(right_start) / bucket_width).cast("long")
    re = F.floor(F.col(right_end) / bucket_width).cast("long")
    lx = left.withColumn("__start_slab", ls).withColumn(
        "__slab", F.explode(F.sequence(ls, le))
    )
    rx = right.withColumn("__r_start_slab", rs).withColumn(
        "__slab", F.explode(F.sequence(rs, re))
    )
    joined = (
        lx.join(rx, keys + ["__slab"])
        # canonical slab: the later of the two start slabs is shared by
        # every slab-overlapping pair, so this keeps exactly one match
        .filter(
            F.col("__slab") == F.greatest("__start_slab", "__r_start_slab")
        )
        .drop("__slab", "__start_slab", "__r_start_slab")
        .filter(
            (F.col(left_start) <= F.col(right_end))
            & (F.col(right_start) <= F.col(left_end))
        )
    )
    return joined
