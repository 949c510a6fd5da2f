"""Skew mitigation: salted joins and two-phase aggregation.

AQE's skew-join handling (enabled in session.py) splits oversized
partitions at runtime — that's the first line of defense. These manual
operators cover what AQE can't:

  * ``salted_join`` — a hot key on the probe side explodes one build row
    into SALT copies so the probe rows hash to SALT different partitions.
    Use when one side is dimension-ish but a handful of fact keys carry
    a disproportionate share of rows (the classic power-law user).
  * ``two_phase_agg_count`` — pre-aggregate on (key, salt) then merge:
    bounds any single task's group size for high-skew group-bys whose
    aggregate is reassociable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join where `fact[key]` may be heavily skewed: fact rows get a
    random salt in [0, salt), dim rows are replicated across all salts,
    and the join key becomes (key, salt) — a hot key's rows now spread
    over `salt` partitions. Dim grows by `salt`x, so keep it small or
    broadcast instead when it fits.

    Only inner/left (fact-preserving) joins are supported: under
    right/full, a dim row with no fact match would surface once per salt
    replica."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r}: "
            "right/full would emit unmatched dim rows once per salt replica"
        )
    salted_fact = fact.withColumn(
        "__salt", (F.rand(seed=42) * salt).cast("int")
    )
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_fact.join(salted_dim, [key, "__salt"], how)
    return out.drop("__salt")


def salted_topn_per_key(
    df: DataFrame,
    key: str,
    order_col: str,
    n: int,
    tiebreak: str,
    salt: int = 16,
) -> DataFrame:
    """Top-n rows per key when some keys are hot enough that a plain
    window serializes (SCALE_100x.md skew table): phase 1 takes the local
    top-n within (key, salt) — bounding every task's sort to its salt
    share — phase 2 re-ranks only the surviving salt*n rows per key.
    Exact: the global top-n is contained in the union of salt-local
    top-ns. Descending order; ties broken by `tiebreak` ascending."""
    w1 = Window.partitionBy(key, "__salt").orderBy(
        F.col(order_col).desc(), F.col(tiebreak).asc()
    )
    phase1 = (
        df.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
        .withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= n)
        .drop("__rn", "__salt")
    )
    w2 = Window.partitionBy(key).orderBy(
        F.col(order_col).desc(), F.col(tiebreak).asc()
    )
    return (
        phase1.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= n)
        .withColumnRenamed("__rn", "rank")
    )


def two_phase_agg_count(
    df: DataFrame,
    key: str,
    salt: int = 16,
) -> DataFrame:
    """COUNT(*) per key with bounded task-level group sizes: phase 1
    counts per (key, salt), phase 2 merges per key. Same pattern extends
    to any commutative-associative aggregate."""
    phase1 = (
        df.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
        .groupBy(key, "__salt")
        .agg(F.count("*").alias("__partial"))
    )
    return phase1.groupBy(key).agg(F.sum("__partial").alias("n"))


def bucketed_running_sum(
    df: DataFrame,
    key: str,
    order_col: str,
    value_col: str,
    bucket_width_micros: int = 86_400_000_000,  # 1 day of event time
    out_col: str = "running_sum",
    tiebreak: str | None = None,
) -> DataFrame:
    """Exact per-key running sum (ROWS UNBOUNDED PRECEDING .. CURRENT)
    without serializing hot keys.

    A plain running-sum window funnels each key's whole history through
    one task — top-n windows get WindowGroupLimit pushdown (map-side
    group limits, measured skew-proof in SCALE.md), but full-output
    prefix aggregations have no such rescue. This is the distributed
    prefix-sum: range-bucket the order column (event-time buckets), do
    the running sum WITHIN (key, bucket) — task size bounded by a
    bucket's share of the key — then add the cumulative totals of the
    key's earlier buckets (one row per (key, bucket): that frame is
    smaller than the data by the average bucket population, and its
    window cost is bounded by #buckets per key, not rows).

    Exact when (order_col, tiebreak within equal values) matches the
    plain window's order: rows in different buckets never tie (bucket
    boundaries respect order), rows within a bucket are summed by the
    same within-bucket window. ``value_col`` sums in DECIMAL to stay
    order-insensitive (oracle-portable), cast back to double.
    """
    if dict(df.dtypes).get(order_col, "").startswith("timestamp"):
        order_key = F.unix_micros(F.col(order_col))
    else:  # already-numeric event time (e.g. raw epoch micros/nanos)
        order_key = F.col(order_col)
    b = F.floor(order_key / F.lit(bucket_width_micros))
    with_b = df.withColumn("__bucket", b)
    order_cols = [order_col] + ([tiebreak] if tiebreak else [])
    wb = (
        Window.partitionBy(key, "__bucket")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = with_b.withColumn(
        "__local",
        F.sum(F.col(value_col).cast("decimal(18,2)")).over(wb),
    )
    totals = with_b.groupBy(key, "__bucket").agg(
        F.sum(F.col(value_col).cast("decimal(18,2)")).alias("__btotal")
    )
    wo = (
        Window.partitionBy(key)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "__offset", F.coalesce(F.sum("__btotal").over(wo), F.lit(0).cast("decimal(18,2)"))
    ).select(key, "__bucket", "__offset")
    return (
        local.join(offsets, [key, "__bucket"])
        .withColumn(out_col, (F.col("__local") + F.col("__offset")).cast("double"))
        .drop("__bucket", "__local", "__offset")
    )
