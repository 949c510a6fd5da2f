#!/usr/bin/env python3
"""Generate PLANS.md: the physical-plan evidence that headline queries
carry their scale properties (pushdown, pruning, broadcast vs shuffle,
whole-stage codegen, partial aggregation)."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHOW = [
    (
        "q1_pricing_summary",
        "Scan-heavy group-by: the filter reaches the parquet scan "
        "(DataFilters + PushedFilters), only 6 of 11 columns are read "
        "(ReadSchema), and aggregation is two-phase (partial_sum before "
        "the exchange, final after).",
    ),
    (
        "q3_top_orders",
        "Selective dim join + top-k: the dimension filter is pushed into "
        "its scan, the dim side broadcasts, and the ORDER BY+LIMIT plans "
        "as TakeOrderedAndProject — no global sort.",
    ),
    (
        "sessionize",
        "One hash exchange on user_id serves the lag window, the running "
        "sum AND the final group-by (window + aggregation reuse the same "
        "partitioning; no repeated shuffles).",
    ),
    (
        "dedup_minhash_lsh",
        "Signature computation is map-only over cached signatures; "
        "candidate generation is an equi-join on band keys (shuffle "
        "bounded by band-key cardinality), and the Jaccard verify joins "
        "arrays back by id for candidates only.",
    ),
    (
        "asof_join_last_purchase",
        "As-of join as union-sort-carry: a single hash exchange on "
        "user_id, then one window sort — the sort-merge-as-of shape, no "
        "per-row subqueries.",
    ),
    (
        "surrogate_key_stable",
        "Distributed stable row id: the data path is a RANGE repartition "
        "+ local sort + BroadcastHashJoin of per-partition offsets; the "
        "only SinglePartition exchange carries the <= #partitions-row "
        "stats frame, never the data.",
    ),
    (
        "decontaminate_against_benchmark",
        "Eval-set shingles exploded and BROADCAST; the training corpus "
        "hash-equi-joins them map-side — no cross join, no corpus "
        "shuffle; only matched rows reach the counting aggregate.",
    ),
    (
        "running_sum_bucketed",
        "Distributed prefix-sum: running sums within (key, time-bucket) "
        "plus a cumulative per-bucket offset — the full-history window "
        "runs over one row per (key, bucket), never a hot key's rows.",
    ),
    (
        "topn_per_key_salted",
        "Salted two-phase top-n window: phase 1 ranks within (key, salt) "
        "so no task sorts a whole hot key; phase 2 re-ranks only the "
        "surviving salt*n rows per key (WindowGroupLimit bounds both).",
    ),
    (
        "ngram_docfreq_filter",
        "Linear contamination stats: shingle sets are map-side lambdas, "
        "document frequency is ONE explode + hash aggregate (partial "
        "count before the exchange), and the join back to documents "
        "moves pre-aggregated counts — no pairwise step anywhere.",
    ),
    (
        "ann_quantized",
        "Quantized ANN: int8 quantization is map-only (no exchange "
        "before the join), the query side broadcasts, and ranking is a "
        "per-query window bounded by WindowGroupLimit — the corpus is "
        "scanned once at int8 width.",
    ),
    (
        "incremental_agg_maintenance",
        "Materialized-view merge: both agg states partial-aggregate "
        "before their exchanges; the full-outer merge joins two "
        "already-aggregated key sets (state-sized, not history-sized).",
    ),
    (
        "bloom_filter_members",
        "User-facing Bloom filter: the build side collapses to an "
        "m/30-word bit table then a one-row array; the probe side gets it "
        "by BroadcastNestedLoopJoin and the membership test is a pure "
        "projection — no Exchange on the probe branch.",
    ),
    (
        "bm25_topk",
        "BM25 retrieval: one hashpartitioning exchange on doc_id serves "
        "tf, dl, and the pivot; df and corpus stats are broadcast; top-20 "
        "is TakeOrderedAndProject, never a global sort.",
    ),
    (
        "kmeans_assign",
        "K-means assignment: the k-row centroid frame broadcasts "
        "(BroadcastNestedLoopJoin); squared distances are map-side "
        "Catalyst lambdas and the argmin window partitions on vec_id — "
        "the corpus is scanned once and never shuffled for assignment.",
    ),
    (
        "srp_hamming_groups",
        "SRP near-dup, scale path: one hash aggregate collapses "
        "signature-identical vectors, banding is a map-side explode of "
        "the DISTINCT signatures, candidates come from an equi-join on "
        "(band, key) — output linear in distinct content, quadratic "
        "only within an 8-bit bucket.",
    ),
    (
        "ann_pq_adc",
        "PQ/ADC search: the M*K codebook and query subvectors both "
        "broadcast; per-(query, vector) ADC totals are the only "
        "exchange; ranking is a per-query window over code-width data — "
        "the float corpus is read once, at encode time.",
    ),
    (
        "interval_overlap_pairs",
        "Interval overlap join: both interval sets explode to ~2 slab "
        "rows each and equi-join on (user_id, slab) — a bounded shuffle "
        "join with the exact overlap predicate on slab-mates only; no "
        "per-user cross product anywhere in the plan.",
    ),
    (
        "graph_triangle_counts",
        "Triangle listing on the kNN graph: the edge list is built once "
        "(broadcast query side, per-query WindowGroupLimit top-k), then "
        "two equi-joins on oriented edges enumerate each triangle once "
        "— join fan-out bounded by kNN degree <= 2k; corner counting is "
        "a two-phase hash aggregate.",
    ),
    (
        "duplicated_ngram_spans",
        "Exact-substring duplication: shingle hashing is a map-side "
        "lambda chain, doc-frequency is ONE explode + two-phase count, "
        "and the islands windows partition by doc_id — bounded by "
        "document length, never corpus-wide; no pairwise doc join "
        "anywhere.",
    ),
    (
        "kmv_set_relations",
        "KMV set relations: sketch build = distinct + per-group top-k "
        "window (k rows survive per group); everything after — pair "
        "tagging, merge, estimates — runs on k-row sketches, so the "
        "pairwise stage is O(groups^2 * k) and the data is read once.",
    ),
    (
        "orders_partition_checksums",
        "Orderless digest: the canonical rendering + polynomial row "
        "hash are one map-side projection; digests partial-aggregate "
        "before the single exchange on the partition key — the table "
        "is scanned once, nothing else moves.",
    ),
    (
        "vocab_coverage_topk",
        "Vocabulary coverage: corpus token counts two-phase aggregate; "
        "top-V is TakeOrderedAndProject; the cumulative window runs "
        "over the V surviving rows only and the scalar total arrives "
        "by broadcast — no global sort, no single-partition window "
        "over data.",
    ),
    (
        "cusum_changepoint",
        "CUSUM without the serial window: rank and cumsum run within "
        "(type, day-bucket) partitions, bucket offsets add back via a "
        "one-row-per-bucket window, and the changepoint argmax is a "
        "two-phase max-of-struct HashAggregate — no full-history sort "
        "task anywhere (22.3s -> 2.9s at the 100x probe).",
    ),
    (
        "winsorized_stats",
        "Winsorization in value-distribution form: rank arithmetic runs "
        "on the (type, value, count) table — sized by the value domain, "
        "not rows — so the only row-scale operators are two hash "
        "aggregates; no row-level window (13.5s -> 2.2s at 100x).",
    ),
    (
        "hll_distinct_rollup",
        "Sketch rollup: day-level HLL sketches partial-aggregate before "
        "the exchange, week merges move one sketch blob per day, and "
        "the exact-count branch shares the same two-phase shape — at "
        "scale the merge input is days, not events.",
    ),
    (
        "distinctive_terms_per_doc",
        "Round-5 fix: document frequency derives from the (doc, term) "
        "aggregate -- the count-distinct shuffle of raw token pairs is "
        "gone (8.3x -> 5.0x at 100x). Honest residual: Catalyst's "
        "RemoveRedundantAggregates prunes the df branch to a bare "
        "distinct, so the explode re-runs there instead of reusing the "
        "tf exchange. df broadcasts back; WindowGroupLimit prunes the "
        "per-doc rank before the doc_id exchange.",
    ),
    (
        "bpe_encode_stats",
        "Trained-tokenizer application: the corpus side is a map-side "
        "explode joined against the vocab-sized word->symbolization "
        "table (broadcast at this SF; bucketed dim at 100 TB), then one "
        "two-phase per-doc aggregate.",
    ),
    (
        "zorder_layout_stats",
        "Morton-key math is pure projection (generated shift/mask "
        "literals, no UDF): scan -> project -> one two-phase hash "
        "aggregate; the only exchange is the final group-by.",
    ),
    (
        "knn_graph_edges_ann",
        "ANN graph build (fold strategy — what every conformance-scale "
        "corpus runs): banded signatures explode map-side, candidates "
        "come from an EQUI-join on (band, bucket) -- no corpus broadcast, "
        "no cross join -- embeddings join back by id, and the per-node "
        "top-k is a WindowGroupLimit-pruned rank. Skew controls "
        "(max_bucket + ring_cap hybrid, auto band_bits) are DEFAULT-ON "
        "since round 6; above SCORING_FOLD_MAX_N corpus rows the default "
        "call switches to the bucket-local scorer (_bucket_local_topk): "
        "one grouped shuffle on (band, bucket), per-bucket vectorized "
        "top-k inside Arrow batches (candidate pairs never materialize; "
        "selection is partition-based set extraction, no per-entry "
        "sorts), then a small merge rank — measured 146.6 s -> 7.4 s at "
        "the 100x Gaussian probe with bit-identical edges, 49 s at "
        "500x/1M vectors (SCALE_r6.md).",
    ),
    (
        "dedup_containment",
        "Asymmetric containment dedup via EXACT prefix filtering "
        "(round 7): identical shingle sets collapse to a rep first "
        "(one window keyed by the sorted set), each rep probes only "
        "its rarest n-ceil(t*n)+1 shingles (doc-freq aggregate + one "
        "per-doc window), candidates are a hash EQUI-join on the "
        "shingle hash — no cross product anywhere — and the verify "
        "joins the sets back by id for candidate pairs only. "
        "Output-bound at 100x replication: 54.62M pairs in 21.4 s "
        "with candidate work distinct-sized (SCALE_r7.md).",
    ),
    (
        "segment_dedup_reconstruct",
        "CCNet-style segment dedup (round 7): segmenting is one fused "
        "tokenize+slice projection; first-occurrence selection is a "
        "PARTIAL-AGGREGATING groupBy(segment) min-struct — hot "
        "boilerplate segments collapse map-side, where a "
        "row_number-over-segment window would sort every occurrence in "
        "one task; reconstruction is one groupBy(doc_id) plus a left "
        "join back to the doc spine.",
    ),
    (
        "span_decontaminate",
        "Surgical span decontamination (round 7): the benchmark gram "
        "set BROADCASTS (eval sets are small by definition) so the "
        "train-side gram probe is map-side; hit-to-token marking is an "
        "equi-join on doc_id with a range residual (per-doc hits x "
        "tokens, never corpus-wide); one groupBy(doc_id) rebuilds the "
        "cleaned text.",
    ),
    (
        "shard_assignment_token_balanced",
        "Token-balanced sharding (round 7): the global running token "
        "total is the DISTRIBUTED prefix-sum — local windows inside 64 "
        "hash-range buckets plus one offsets window over the 64 bucket "
        "totals (broadcast back) — never a single-partition global "
        "window; all-integer arithmetic keeps it exact at any "
        "parallelism.",
    ),
    (
        "pca_project_whiten",
        "PCA projection (round 8): after the one-pass Gram fit, the "
        "projection is a single map-only Project+Generate over the "
        "corpus scan (quantized eigenvectors are inline literals — no "
        "broadcast, no join, no exchange); at scale the same integers "
        "come from a mapInPandas matmul kernel. The corpus is read "
        "once and never shuffled.",
    ),
    (
        "pca_ivf_topk",
        "Reduced-space ANN search (round 8): cell build and query "
        "routing both run in the 8-dim projection (map-only + k-row "
        "broadcast centroid cross join); the candidate join is "
        "cell-pruned equi-join, and the exact re-rank reads original "
        "vectors by id for candidates only — the IVF-Flat recipe with "
        "an orthogonal transform in front. Round 9: the query-routing "
        "side is broadcast (BuildLeft on the cell join), so the corpus "
        "cell assignment is never hash-repartitioned to meet "
        "n_query x n_probe routing rows (VERDICT r8 #1).",
    ),
    (
        "ivf_persisted_topk",
        "Build-once/search-many ANN (round 9): the search-side FileScan "
        "of the persisted inverted file carries a STATIC cell IN (...) "
        "PartitionFilter (probed cells are known driver-side), so "
        "unprobed cells cost zero I/O; the routing side broadcasts "
        "into the candidate join and the exact re-rank reads vectors "
        "straight from the probed partitions.",
    ),
    (
        "substring_dedup_rebuild",
        "Exact substring dedup (round 9): token-linear gram explode, "
        "ONE partial-aggregated groupBy(gram) (min/max doc_id, not "
        "count-distinct — no second shuffle), a shuffle equi-join on "
        "gram for hits (occurrence-bound, never pair-bound), a "
        "per-doc anti-join with bounded range residual, and one "
        "groupBy(doc_id) rebuild.",
    ),
    (
        "bigram_surprisal_scores",
        "Bigram-LM score (round 9): bigrams built array-side (Generate "
        "over transform(sequence(...)) — no window shuffle), the bigram "
        "count model partial-aggregated then BROADCAST back onto the "
        "corpus rows (AQE's size call; an SMJ with skew split at "
        "larger vocab), context counts DERIVED from the bigram table "
        "(groupBy prev over distinct bigrams — never a second corpus "
        "pass), one scalar totals broadcast, one groupBy(doc_id) fold.",
    ),
    (
        "training_corpus_v6_select",
        "v6 pipeline (round 9): the v3 head's shuffles are SHARED "
        "across the LM stage's four branches via ReusedExchange (an "
        "explicit cache was measured NOT a win — see corpus_v3.py); "
        "the CCNet stage adds the bigram model aggregates + one "
        "per-language rank window; the DSIR tail is unchanged "
        "(explode -> 4096-row broadcast join -> doc aggregate).",
    ),
    (
        "extract_text",
        "HTML extraction (round 10; r11 added entity decoding): one "
        "regex/lambda Project over the scan — NO Exchange at any corpus "
        "size, one WholeStageCodegen span, 3-column pruned ReadSchema. "
        "The entity decode is more expression tree inside the SAME "
        "map-only span, not a new stage.",
    ),
    (
        "extract_links",
        "Anchor harvest (round 10; r11 added quote-style normalization): "
        "href normalization is two more regexp_replace calls inside the "
        "same map-only Project; one regex pass + posexplode, no "
        "Exchange.",
    ),
    (
        "canonical_links",
        "URL canonicalization (round 11): resolution, lowering, fragment "
        "strip and tracking-param filter are pure string expressions "
        "fused into the harvest's map-only Project — still zero "
        "Exchange.",
    ),
    (
        "crawl_frontier",
        "Frontier dedup (round 11): ONE partial-aggregated "
        "groupBy(canonical_url) after the map-only canonicalization — "
        "shuffle bounded by distinct-URL cardinality, never page bytes.",
    ),
    (
        "graph_pagerank_ann",
        "ANN-substrate PageRank (round 11): candidates from the banded-"
        "SRP equi-join on (band, bucket) — no corpus broadcast, no "
        "all-pairs — then the cached-adjacency integer power iteration "
        "(one shuffle join + one groupBy-sum per iteration). The "
        "registered 100 TB form; the exact variant stays as the "
        "yardstick.",
    ),
    (
        "doc_outlink_authority",
        "Authority join-back (round 11): the domain-cardinality "
        "authority table BROADCASTS onto the per-doc link table; one "
        "groupBy(doc_id) of exact int64 mass — document-sized work only "
        "at the very last step.",
    ),
]

KEY = re.compile(
    r"(FileScan|Filter|HashAggregate|Exchange|BroadcastHashJoin|SortMergeJoin|"
    r"TakeOrderedAndProject|Window|WindowGroupLimit|Sort |InMemoryTableScan|Generate|Project \[)"
)


def compact(plan: str, max_lines: int = 28) -> str:
    lines = []
    for line in plan.splitlines():
        if KEY.search(line):
            line = line.replace("                  ", "  ")
            lines.append(line[:160])
        if len(lines) >= max_lines:
            lines.append("   ... (truncated)")
            break
    return "\n".join(lines)


def main() -> None:
    from event_data_etl_gcs_spark.queries import all_queries
    from event_data_etl_gcs_spark.session import get_spark

    spark = get_spark(app_name="plans")
    specs = all_queries()
    out = [
        "# PLANS — physical-plan evidence for the headline queries",
        "",
        "Extracted key operators from `.explain` (executed plan, AQE final), "
        "regenerate with `python scripts/gen_plans.py`. What to look for: "
        "`PushedFilters`/`DataFilters` at the scan, pruned `ReadSchema`, "
        "`partial_` aggregate functions before exchanges, `BroadcastHashJoin` "
        "on dimension sides, `TakeOrderedAndProject` for top-k, a single "
        "`Exchange hashpartitioning` feeding both windows and aggregations.",
        "",
    ]
    for name, note in SHOW:
        df = specs[name].fn(spark, "/root/testdata/sf0.1")
        df.count()  # let AQE finalize
        plan = df._jdf.queryExecution().executedPlan().toString()
        out += [f"## {name}", "", note, "", "```", compact(plan), "```", ""]

    # Forced-strategy branch (r9 directive #3): the bigram scoring join
    # with broadcast disabled — the plan the model takes when it outgrows
    # the broadcast threshold at scale. Bit-identity between the two
    # branches is pinned in tests/test_lm_plans.py.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    df = specs["bigram_surprisal_scores"].fn(spark, "/root/testdata/sf0.1")
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    out += [
        "## bigram_surprisal_scores — forced SMJ branch "
        "(autoBroadcastJoinThreshold=-1)",
        "",
        "The at-scale shape once the model outgrows broadcast: the "
        "corpus bigram stream sort-merge-joins the (prev, cur)-keyed "
        "model tables; hot stopword contexts are AQE skew-split at "
        "runtime. Scores are bit-identical to the broadcast branch "
        "(order-pinned fold; pinned in tests/test_lm_plans.py).",
        "",
        "```",
        compact(plan),
        "```",
        "",
    ]
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    open(path, "w").write("\n".join(out) + "\n")
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
