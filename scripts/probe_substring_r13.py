#!/usr/bin/env python3
"""Round-13 probe: substring_dedup_rebuild (5.4 s extended row,
never touched). Stage profile + interleaved A/B of two levers:

  tkc   tokenize-once (localCheckpoint the token frame: grams, tpos and
        the spine each re-tokenize the single-partition scan today)
  cov   covered-positions equi anti-join: explode each hit into its K
        covered positions and LEFT ANTI on (doc_id, pos), replacing the
        equi+range anti join whose per-doc residual scan is
        O(tokens x hits) on duplicate-heavy docs

Checksums must be identical across all arms."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def checksum(df) -> tuple:
    from pyspark.sql import functions as F

    row = df.agg(
        F.count("*").alias("n"),
        *[
            F.max(F.xxhash64(df[c].cast("string"))).alias(f"h{i}")
            for i, c in enumerate(df.columns)
        ],
    ).collect()[0]
    return tuple(row)


def build(docs, k, tkc: bool, cov: bool):
    from pyspark.sql import functions as F

    from event_data_etl_gcs_spark.queries.decontam_span import _grams_sql
    from event_data_etl_gcs_spark.operators.text import tokens_sql

    tk = docs.select(
        F.col("doc_id"), "source", F.expr(tokens_sql("text")).alias("toks")
    )
    if tkc:
        tk = tk.localCheckpoint(eager=False)
    grams = tk.select(
        "doc_id",
        F.posexplode(F.expr(_grams_sql("toks", k))).alias("pos0", "gram"),
    ).select("doc_id", (F.col("pos0") + 1).cast("int").alias("pos"), "gram")
    dup = (
        grams.groupBy("gram")
        .agg(F.min("doc_id").alias("__lo"), F.max("doc_id").alias("__hi"))
        .filter(F.col("__lo") != F.col("__hi"))
        .select("gram")
    )
    hits = grams.join(dup, "gram").select("doc_id", "pos")
    tpos = tk.select(
        "doc_id",
        "source",
        F.expr("size(toks)").cast("bigint").alias("n_tokens"),
        F.posexplode("toks").alias("ti0", "tok"),
    ).select(
        "doc_id", "source", "n_tokens",
        (F.col("ti0") + 1).cast("int").alias("pos"), "tok",
    )
    if cov:
        covered = hits.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))
            ).alias("pos"),
        ).distinct()
        kept = tpos.join(covered, ["doc_id", "pos"], "left_anti")
    else:
        h = hits.select(F.col("doc_id").alias("h_doc"), F.col("pos").alias("h_pos"))
        kept = tpos.join(
            h,
            (F.col("doc_id") == F.col("h_doc"))
            & (F.col("pos") >= F.col("h_pos"))
            & (F.col("pos") <= F.col("h_pos") + k - 1),
            "left_anti",
        )
    per_doc = kept.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_keep"),
        F.array_join(
            F.expr(
                "transform(sort_array(collect_list(struct(pos, tok))), p -> p.tok)"
            ),
            " ",
        ).alias("text_clean"),
    )
    hit_counts = hits.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_hits")
    )
    spine = tk.select(
        "doc_id", "source", F.expr("size(toks)").cast("bigint").alias("n_tokens")
    )
    return (
        spine.join(hit_counts, "doc_id", "left")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.coalesce(F.col("n_hits"), F.lit(0).cast("bigint")).alias("n_hits"),
            (
                F.col("n_tokens")
                - F.coalesce(F.col("n_keep"), F.lit(0).cast("bigint"))
            ).alias("n_removed"),
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
        )
    )


def main() -> None:
    from event_data_etl_gcs_spark.session import get_spark
    from event_data_etl_gcs_spark.sources.catalog import load_table

    spark = get_spark(app_name="probe_substring_r13")
    sc = spark.sparkContext
    docs = load_table(spark, SF_DIR, "documents")
    docs.count()

    arms = ["base", "tkc", "cov", "both"]
    times: dict[str, list[float]] = {a: [] for a in arms}
    chks = set()
    for _round in range(3):
        for arm in arms:
            sc.setJobDescription(f"substring [{arm}]")
            t0 = time.perf_counter()
            chk = checksum(
                build(docs, 8, tkc=arm in ("tkc", "both"), cov=arm in ("cov", "both"))
            )
            times[arm].append(round(time.perf_counter() - t0, 3))
            chks.add(chk)
    sc.setJobDescription(None)
    for a in arms:
        print(f"{a}: {times[a]}")
    print(f"identical={len(chks) == 1}")
    spark.stop()


if __name__ == "__main__":
    main()
