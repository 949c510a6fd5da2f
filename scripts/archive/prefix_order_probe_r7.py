#!/usr/bin/env python3
"""Round-7 probe: does the prefix ORDERING actually matter?

Prefix filtering is exact under ANY n-ceil(t*n)+1-sized probe subset;
the ordering is purely an efficiency lever. This measures the
candidate-pair volume (the quantity the downstream verify pays for)
under three orderings of each doc's shingles at sf0.1 (5k docs) and on
the 100x replica corpus collapsed to reps:

  * df ASC  (rarest first — what containment_pairs ships)
  * hash    (h only — a deterministic "random" subset)
  * df DESC (commonest first — the adversarial choice)

Verified pair output is identical for all three (asserted)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from event_data_etl_gcs_spark.operators.text import shingle_hash_set_sql
    from event_data_etl_gcs_spark.session import get_spark

    spark = get_spark(app_name="prefix_order_probe")
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    sets = docs.select(
        F.col("doc_id").alias("id"),
        F.expr(shingle_hash_set_sql("text")).alias("s"),
    ).filter(F.size("s") > 0).cache()
    post = sets.select("id", F.explode("s").alias("h")).cache()
    post.count()
    freq = post.groupBy("h").agg(F.count("*").alias("df"))

    NUM, DEN = 4, 5
    results = {}
    for name, order_cols in [
        ("df_asc", [F.col("df"), F.col("h")]),
        ("hash", [F.col("h")]),
        ("df_desc", [F.col("df").desc(), F.col("h")]),
    ]:
        w = Window.partitionBy("id").orderBy(*order_cols)
        prefix = (
            post.join(freq, "h")
            .withColumn("n_a", F.count("*").over(Window.partitionBy("id")))
            .withColumn("rn", F.row_number().over(w))
            .filter(
                F.col("rn")
                <= F.expr(f"n_a - (({NUM} * n_a + {DEN} - 1) DIV {DEN}) + 1")
            )
            .select("id", "h")
        )
        t0 = time.time()
        cand = (
            prefix.alias("a")
            .join(post.alias("b"), "h")
            .filter(F.col("a.id") != F.col("b.id"))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct()
        )
        n_cand = cand.count()
        dt = time.time() - t0
        va = sets.select(F.col("id").alias("id_a"), F.col("s").alias("sa"))
        vb = sets.select(F.col("id").alias("id_b"), F.col("s").alias("sb"))
        n_pairs = (
            cand.join(va, "id_a").join(vb, "id_b")
            .filter(
                F.expr("size(array_intersect(sa, sb))").cast("double")
                / F.expr("size(sa)")
                >= F.lit(NUM / DEN)
            )
            .count()
        )
        results[name] = (n_cand, n_pairs, dt)
        print(f"{name:8s} candidates={n_cand:>10,} verified={n_pairs} "
              f"({dt:.2f}s)", flush=True)

    verified = {v[1] for v in results.values()}
    assert len(verified) == 1, f"orderings disagree on output: {results}"
    print("\n| ordering | candidate pairs | verified pairs |")
    print("|---|---|---|")
    for name, (nc, np_, _) in results.items():
        print(f"| {name} | {nc:,} | {np_} |")
    spark.stop()


if __name__ == "__main__":
    main()
