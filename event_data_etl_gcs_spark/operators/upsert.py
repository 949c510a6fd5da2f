"""MERGE-style upsert as a DataFrame composition (no Delta/Iceberg in
this environment; same anti-join + union shape those formats execute).

``merge_upsert``: rows from `updates` replace target rows with matching
keys; unmatched update rows are inserted; untouched target rows pass
through. One shuffle on the key (the anti join); at table scale this is
exactly what `MERGE INTO ... WHEN MATCHED UPDATE WHEN NOT MATCHED
INSERT` compiles to, and combined with dynamic partition overwrite
(session.py) only touched partitions get rewritten.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """UPSERT semantics: updates win on key collision, everything else
    survives. Columns must match; `updates` must be key-unique."""
    survivors = target.join(updates.select(*keys), keys, "left_anti")
    return survivors.unionByName(updates)


def agg_state(
    df: DataFrame, keys: list[str], value_col: str, scale: int = 2
) -> DataFrame:
    """Mergeable per-key aggregate state: (keys..., n, sum_dec).

    The running sum is kept in DECIMAL — exact and associative — so
    states merge without float drift: maintaining the aggregate
    incrementally gives the BIT-SAME answer as recomputing from scratch,
    which is the whole contract of a maintained materialized view.
    """
    return df.groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.sum(F.col(value_col).cast(f"decimal(38,{scale})")).alias("sum_dec"),
    )


def incremental_agg_merge(
    state: DataFrame, delta: DataFrame, keys: list[str]
) -> DataFrame:
    """Merge a new batch's agg state into the maintained state.

    Full-outer on the keys + coalesced addition: new keys appear, old
    keys update, untouched keys survive. At 100 TB the delta side is a
    micro-batch — tiny against the state table — so this is a broadcast
    or shuffle-on-delta-size join plus column arithmetic; the raw history
    is never rescanned. (The reason sums stay DECIMAL: decimal addition
    is associative, so merge order and partitioning can't change the
    result.)
    """
    zero_n = F.lit(0).cast("long")
    a = state.select(
        *keys, F.col("n").alias("n_a"), F.col("sum_dec").alias("s_a")
    )
    b = delta.select(
        *keys, F.col("n").alias("n_b"), F.col("sum_dec").alias("s_b")
    )
    zero_dec = F.lit(0).cast(a.schema["s_a"].dataType.simpleString())
    return a.join(b, keys, "full_outer").select(
        *keys,
        (F.coalesce(F.col("n_a"), zero_n) + F.coalesce(F.col("n_b"), zero_n)).alias("n"),
        (
            F.coalesce(F.col("s_a"), zero_dec) + F.coalesce(F.col("s_b"), zero_dec)
        ).alias("sum_dec"),
    )
