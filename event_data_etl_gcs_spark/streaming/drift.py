"""Streaming distribution-drift monitor.

The streaming face of the ``value_drift_tvd`` batch query: a frozen
reference histogram (integer bin counts — tiny, broadcastable) is
compared against EACH micro-batch's histogram; per-batch TVD rows land
in an append-only alerts table. The arithmetic is the same
integer-exact form as the batch query (SUM|n_b*T_r - n_r*T_b| over one
final division), so a batch's drift row is bit-identical whether it was
scored in-stream or replayed in batch — the monitoring analogue of the
engine's streaming == batch equivalence contract.

At scale: the reference histogram is O(bins) regardless of history
size, each micro-batch does one map-side binning + one tiny aggregate,
and the alerts table grows by n_event_types rows per batch — this is
how you watch a 100k events/sec stream for upstream breakage without
ever rescanning history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DRIFT_BUCKET = "width_bucket(value, 0.0, 500.0, 10)"


def histogram(df: DataFrame, group_col: str = "event_type") -> DataFrame:
    """(group, bucket, n): the integer histogram the monitor compares."""
    return (
        df.select(group_col, F.expr(DRIFT_BUCKET).alias("bucket"))
        .groupBy(group_col, "bucket")
        .agg(F.count("*").alias("n"))
    )


def tvd_against_reference(
    batch_hist: DataFrame, ref_hist: DataFrame, group_col: str = "event_type"
) -> DataFrame:
    """(group, n_batch, n_ref, tvd) — integer-exact total-variation
    distance between a batch histogram and the frozen reference."""
    b = batch_hist.select(
        group_col, "bucket", F.col("n").alias("n_b")
    )
    r = ref_hist.select(group_col, "bucket", F.col("n").alias("n_r"))
    cells = b.join(F.broadcast(r), [group_col, "bucket"], "full_outer").select(
        group_col,
        "bucket",
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
        F.coalesce("n_r", F.lit(0)).alias("n_r"),
    )
    tot = cells.groupBy(group_col).agg(
        F.sum("n_b").alias("t_b"), F.sum("n_r").alias("t_r")
    )
    return (
        cells.join(tot, group_col)
        .filter((F.col("t_b") > 0) & (F.col("t_r") > 0))
        .groupBy(group_col, "t_b", "t_r")
        .agg(
            F.sum(
                F.abs(F.col("n_b") * F.col("t_r") - F.col("n_r") * F.col("t_b"))
            ).alias("num")
        )
        .select(
            group_col,
            F.col("t_b").cast("bigint").alias("n_batch"),
            F.col("t_r").cast("bigint").alias("n_ref"),
            (
                F.col("num").cast("double")
                / (F.lit(2.0) * F.col("t_b") * F.col("t_r"))
            ).alias("tvd"),
        )
    )


def run_streaming_drift_monitor(
    spark: SparkSession,
    stream: DataFrame,
    ref_hist: DataFrame,
    alerts_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain a stream (Available-Now), appending one TVD row per
    (micro-batch, event_type) to the alerts table with the batch id."""

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = tvd_against_reference(histogram(batch_df), ref_hist)
        out.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(alerts_dir)

    q = (
        stream.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(on_batch)
        .start()
    )
    q.awaitTermination()
