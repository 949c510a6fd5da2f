#!/usr/bin/env python3
"""Scale probe: measured evidence for the engine's scale posture.

1. Synthesizes a ~10x testdata (lineitem ~6M rows, events ~100k, docs
   50k) plus a deliberately skewed events table (one user owns ~40% of
   rows) under /tmp/spark_graft_scale/.
2. Runs the headline queries at 1x and 10x, recording wall time — the
   scaling exponent is the evidence that plans are shuffle- and
   partition-sane (near-linear => no quadratic step or collapsed
   parallelism hiding in a plan).
3. Runs the skew scenarios: plain window/groupBy on the hot key with AQE,
   and the salted alternatives, recording times.

Output: SCALE.md at the repo root.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

BASE = os.environ.get("SCALE_PROBE_BASE", "/tmp/spark_graft_scale")
SRC = "/root/testdata/sf0.1"
FACTOR = int(os.environ.get("SCALE_PROBE_FACTOR", "10"))

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_nation_revenue",
    "sessionize",
    "dedup_minhash_lsh",
    "ann_lsh",
    "training_corpus_select",
    "ngram_docfreq_filter",
    "ann_quantized",
    "incremental_agg_maintenance",
]


def synthesize(spark) -> None:
    os.makedirs(BASE, exist_ok=True)
    if os.path.exists(f"{BASE}/_done_{FACTOR}"):
        return
    # 10x replication with key-space offsets so cardinalities scale too.
    for name, key_cols in [
        ("lineitem", {"l_orderkey": 1_000_000}),
        ("orders", {"o_orderkey": 1_000_000, "o_custkey": 10_000}),
        ("customer", {"c_custkey": 10_000}),
        ("events", {"event_id": 10_000_000, "user_id": 1_000}),
        ("documents", {"doc_id": 1_000_000}),
        ("embeddings", {"vec_id": 1_000_000}),
    ]:
        src = spark.read.parquet(f"{SRC}/{name}.parquet")
        copies = []
        for i in range(FACTOR):
            c = src
            for col, stride in key_cols.items():
                c = c.withColumn(col, F.col(col) + F.lit(i * stride))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(f"{BASE}/x{FACTOR}/{name}.parquet")
    for name in ["region", "nation", "supplier", "part"]:
        spark.read.parquet(f"{SRC}/{name}.parquet").write.mode("overwrite").parquet(
            f"{BASE}/x{FACTOR}/{name}.parquet"
        )
    # skewed events: hot user 0 owns ~40% of a 1M-row table
    ev = spark.read.parquet(f"{BASE}/x{FACTOR}/events.parquet")
    skewed = ev.withColumn(
        "user_id",
        F.when(F.rand(seed=7) < 0.4, F.lit(0)).otherwise(F.col("user_id")),
    )
    skewed.write.mode("overwrite").parquet(f"{BASE}/skewed_events_{FACTOR}x.parquet")
    open(f"{BASE}/_done_{FACTOR}", "w").write("ok")


def run_headline(spark, sf_dir: str) -> dict[str, float]:
    from event_data_etl_gcs_spark.queries import all_queries

    specs = all_queries()
    out = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 2)
    return out


def run_skew(spark) -> dict[str, float]:
    from event_data_etl_gcs_spark.operators.skew import two_phase_agg_count

    # factor-suffixed: re-synthesize if this factor's table is absent
    # (the _done marker only covers the x{FACTOR} tables)
    skew_path = f"{BASE}/skewed_events_{FACTOR}x.parquet"
    if not os.path.exists(skew_path):
        base_ev = spark.read.parquet(f"{BASE}/x{FACTOR}/events.parquet")
        base_ev.withColumn(
            "user_id",
            F.when(F.rand(seed=7) < 0.4, F.lit(0)).otherwise(F.col("user_id")),
        ).write.parquet(skew_path)
    ev = spark.read.parquet(skew_path)
    dim = ev.select("user_id").distinct().withColumn("tag", F.lit(1))
    res = {}

    t0 = time.perf_counter()
    ev.groupBy("user_id").agg(
        F.count("*"), F.sum("value"), F.max("ts")
    ).count()
    res["groupby_hot_key_aqe"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    two_phase_agg_count(ev, "user_id").count()
    res["groupby_hot_key_salted"] = round(time.perf_counter() - t0, 2)

    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    t0 = time.perf_counter()
    ev.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3).count()
    res["window_hot_key"] = round(time.perf_counter() - t0, 2)

    from event_data_etl_gcs_spark.operators.skew import salted_topn_per_key

    t0 = time.perf_counter()
    salted_topn_per_key(ev, key="user_id", order_col="ts", n=3, tiebreak="event_id").count()
    res["window_hot_key_salted"] = round(time.perf_counter() - t0, 2)

    # Full-output prefix sum: no WindowGroupLimit rescue possible — the
    # hot key's whole history serializes through one task unless bucketed.
    # Run it on a 5x-replicated skewed table (~5M rows, hot key ~2M) so
    # the one-task sort is big enough to expose the serialization; at the
    # 1M scale the plain window's single 400k-row task still wins on
    # constants (two windows + a join vs one window).
    big_path = f"{BASE}/skewed_events_{FACTOR}x_5rep.parquet"
    if not os.path.exists(big_path):
        copies = [
            ev.withColumn("event_id", F.col("event_id") + F.lit(i * 100_000_000))
            for i in range(5)
        ]
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.parquet(big_path)
    big = spark.read.parquet(big_path)

    from event_data_etl_gcs_spark.operators.skew import bucketed_running_sum

    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    t0 = time.perf_counter()
    big.withColumn(
        "rs", F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double")
    ).agg(F.sum("rs")).collect()
    res["running_sum_hot_key"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    bucketed_running_sum(
        big, key="user_id", order_col="ts", value_col="value",
        bucket_width_micros=3_600_000_000, tiebreak="event_id", out_col="rs",
    ).agg(F.sum("rs")).collect()
    res["running_sum_bucketed"] = round(time.perf_counter() - t0, 2)
    return res


def run_incremental_dedup(spark) -> dict[str, float]:
    """Incremental index check vs full rebuild at 10x corpus: the
    increment's cost must track the NEW batch, not the corpus."""
    import shutil

    from event_data_etl_gcs_spark.operators.dedup import (
        minhash_incremental_pairs,
        minhash_lsh_pairs,
        minhash_signatures,
    )

    # Distinct-text corpus: the x10 replication reuses each text 10x,
    # which lets the full rebuild collapse identical docs and hash only
    # 1/10th — artificially cheap. Suffix each replica's text so all
    # docs are distinct and both sides pay real signature costs.
    stride = 1_000_000
    docs_path = f"{BASE}/docs_distinct_{FACTOR}x.parquet"
    if not os.path.exists(docs_path):
        src = spark.read.parquet(f"{SRC}/documents.parquet")
        copies = [
            src.withColumn("doc_id", F.col("doc_id") + F.lit(i * stride))
            .withColumn("text", F.concat(F.col("text"), F.lit(f" uniq{i}")))
            for i in range(FACTOR)
        ]
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.parquet(docs_path)
    docs = spark.read.parquet(docs_path)
    res = {}
    t0 = time.perf_counter()
    minhash_lsh_pairs(docs, threshold=0.5).count()
    res["full_rebuild_pairs"] = round(time.perf_counter() - t0, 2)

    # Persist the index for the first (FACTOR-1) replicas, then time ONLY
    # the check of the last replica (the "new batch") against it.
    existing = docs.filter(F.col("doc_id") < (FACTOR - 1) * stride)
    new = docs.filter(F.col("doc_id") >= (FACTOR - 1) * stride)
    sig_path = f"{BASE}/sig_index"
    shutil.rmtree(sig_path, ignore_errors=True)
    sig = minhash_signatures(existing).filter(F.expr("size(sh_hashes) > 0"))
    sig.write.parquet(sig_path)
    sig.unpersist()
    t0 = time.perf_counter()
    pairs, new_sig = minhash_incremental_pairs(
        new, spark.read.parquet(sig_path), threshold=0.5
    )
    pairs.count()
    res["incremental_batch_pairs"] = round(time.perf_counter() - t0, 2)
    new_sig.unpersist()
    return res


def run_layout(spark) -> dict[str, float]:
    """Z-order vs lexicographic layout: wall time of a selective range
    predicate on the SECOND clustering column (row-group stats skipping
    is the only difference — same data, same file count)."""
    from event_data_etl_gcs_spark.sources.parquet_sink import (
        write_parquet_table,
        write_zordered,
    )

    li = spark.read.parquet(f"{BASE}/x{FACTOR}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    zpath, lpath = f"{BASE}/li_zorder.parquet", f"{BASE}/li_lex.parquet"
    if not os.path.exists(zpath):
        write_zordered(li, zpath, zorder_by=["l_orderkey", "l_partkey"],
                       target_partitions=32)
        write_parquet_table(li, lpath, target_partitions=32,
                            range_by=["l_orderkey"],
                            sort_within_by=["l_orderkey", "l_partkey"])
    res = {}
    pred = (F.col("l_partkey") >= 1000) & (F.col("l_partkey") < 1400)
    import glob

    import pyarrow.parquet as pq

    for name, path in [("lex_sorted", lpath), ("zordered", zpath)]:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            spark.read.parquet(path).filter(pred).agg(
                F.sum("l_quantity")
            ).collect()
            best = min(best, time.perf_counter() - t0)
        res[name] = round(best, 3)
        # deterministic skipping metric: row groups whose l_partkey stats
        # overlap the predicate (what a stats-pruning scan must read)
        total, hit = 0, 0
        for f in glob.glob(path + "/*.parquet"):
            meta = pq.ParquetFile(f).metadata
            idx = next(
                i for i in range(meta.num_columns)
                if meta.row_group(0).column(i).path_in_schema == "l_partkey"
            )
            for g in range(meta.num_row_groups):
                st_ = meta.row_group(g).column(idx).statistics
                total += 1
                if st_.max >= 1000 and st_.min < 1400:
                    hit += 1
        res[f"{name}_rowgroups"] = f"{hit}/{total}"
    return res


def main() -> None:
    from event_data_etl_gcs_spark.session import get_spark

    spark = get_spark(
        app_name="scale-probe",
        extra_conf={"spark.sql.files.maxPartitionBytes": "16m"},
    )
    synthesize(spark)

    t1 = run_headline(spark, SRC)
    tN = run_headline(spark, f"{BASE}/x{FACTOR}")
    skew = run_skew(spark)
    inc = run_incremental_dedup(spark)
    layout = run_layout(spark)

    lines = [
        f"# SCALE — measured scaling evidence (local[32], factor {FACTOR}x)",
        "",
        f"{FACTOR}x data replication (lineitem 600k -> {FACTOR*600000} rows, key spaces scaled),",
        "min of 2 runs per query. A near-linear (or sublinear, where a",
        "selective filter or broadcast dominates) ratio is the evidence that",
        "no plan hides a quadratic step or a parallelism collapse.",
        "",
        f"| query | 1x (s) | {FACTOR}x (s) | ratio |",
        "|---|---|---|---|",
    ]
    for name in HEADLINE:
        r = tN[name] / t1[name] if t1[name] else float("nan")
        lines.append(f"| {name} | {t1[name]} | {tN[name]} | {r:.1f}x |")
    lines += [
        "",
        f"## Skew ({FACTOR*100_000} events, hot key = 40% of rows)",
        "",
        "| scenario | time (s) |",
        "|---|---|",
        f"| groupBy on hot key (AQE, map-side partials) | {skew['groupby_hot_key_aqe']} |",
        f"| two-phase salted count | {skew['groupby_hot_key_salted']} |",
        f"| window row_number on hot key (one task gets 40%) | {skew['window_hot_key']} |",
        f"| salted two-phase top-n window (same result, bounded tasks) | {skew['window_hot_key_salted']} |",
        f"| full-output running sum on hot key, {FACTOR // 2}M rows / hot ~{FACTOR // 5}M (no WindowGroupLimit rescue) | {skew['running_sum_hot_key']} |",
        f"| bucketed distributed prefix-sum (same result, bounded tasks) | {skew['running_sum_bucketed']} |",
        "",
        f"## Incremental near-dedup at {FACTOR}x corpus (all texts distinct)",
        "",
        "| scenario | time (s) |",
        "|---|---|",
        f"| full-corpus pair rebuild ({FACTOR}x docs) | {inc['full_rebuild_pairs']} |",
        f"| one new 1x batch vs persisted {FACTOR-1}x signature index | {inc['incremental_batch_pairs']} |",
        "",
        "The increment's cost tracks the NEW batch, not the corpus: the",
        "band join streams new-side bands against the stored index and",
        "nothing re-hashes already-indexed documents.",
        "",
        f"## Layout: Z-order vs lexicographic ({FACTOR * 600_000} lineitem rows)",
        "",
        "Selective range predicate on the SECOND clustering column",
        "(l_partkey), same data and file count — the delta is row-group",
        "stats skipping that only the Z-order layout provides:",
        "",
        "| layout | time (s) | row groups overlapping predicate |",
        "|---|---|---|",
        f"| range-partitioned + sorted by (l_orderkey, l_partkey) | {layout['lex_sorted']} | {layout['lex_sorted_rowgroups']} |",
        f"| Z-ordered by (l_orderkey, l_partkey) | {layout['zordered']} | {layout['zordered_rowgroups']} |",
        "",
        "Wall-time delta is modest at this size (scan overheads dominate",
        "a 6M-row local read); the row-group overlap count is the",
        "deterministic form of the benefit — it is the fraction of the",
        "table a stats-pruning scan must read, and it scales with data",
        "while the overheads do not.",
        "",
        "Aggregations shrug off key skew (map-side partial aggregation",
        "bounds the hot partition); windows genuinely serialize the hot",
        "key's partition — the mitigation is the salted two-phase top-n",
        "window (operators/skew.py salted_topn_per_key, oracle-checked as",
        "the topn_per_key_salted query) or restructuring to aggregation.",
        "",
        "The prefix-sum pair crosses over around ~2M hot-key rows: the",
        "bucketed form pays constants (two windows + a broadcast join vs",
        "one window) but its task size is bounded by a bucket's share of",
        "the key, while the plain window's one task grows linearly with",
        "the hot key's entire history — at 100x it is the difference",
        "between a bounded stage and a straggler that never finishes.",
        "",
        "Regenerate: `python scripts/scale_probe.py` (writes this file).",
    ]
    suffix = "" if FACTOR == 10 else f"_{FACTOR}x"
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), f"SCALE{suffix}.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    spark.stop()


if __name__ == "__main__":
    main()
