"""Operator exercise suite — the driver-facing correctness surface.

Every operator from SURVEY.md §2 (and each beyond-reference operator)
is registered here as a named query over the driver's testdata tables,
paired with an ANSI-SQL oracle that DuckDB executes on the same
parquet. ``__spark_entry__.py`` re-exports this registry.

Cross-engine determinism rules used throughout (so Spark's unordered
distributed aggregation and DuckDB's sequential one agree bit-for-bit):

- Reductions over DOUBLE columns cast per-row to DECIMAL first
  (exact arithmetic in both engines); averages divide the exact sum
  once, as DOUBLE, after aggregation.
- Per-row double arithmetic is fine (IEEE ops are deterministic);
  so are min/max.
- Every computed column is aliased identically in Spark and SQL.
- Order-dependent ops (windows, as-of, top-k) always carry a unique
  tie-break column.
"""

from nhl_data_warehouse_spark.suite.registry import REGISTRY, QuerySpec, register

# importing the modules populates the registry. ORDER MATTERS to the
# external driver: it checks the first ~50 registered queries per
# round, so the families with no round-1 driver verdict (TPC-H, the
# training-data suite) register first this round; the r1-checked
# core/relational/analytics families re-verify in later rounds.
from nhl_data_warehouse_spark.suite import tpch  # noqa: E402,F401
from nhl_data_warehouse_spark.suite import training  # noqa: E402,F401
from nhl_data_warehouse_spark.suite import ingest  # noqa: E402,F401
from nhl_data_warehouse_spark.suite import analytics  # noqa: E402,F401
from nhl_data_warehouse_spark.suite import core  # noqa: E402,F401
from nhl_data_warehouse_spark.suite import relational  # noqa: E402,F401

# Round-4 rotation (VERDICT r3 item 1): cumulative driver-green is
# 125/191 after rounds 1-3; this list is ALL 66 queries without a
# green CORRECTNESS row yet, so the driver's ~50-query window covers
# the first 50 and whatever spills over leads round 5's window
# automatically. Order: the 13 round-1 hash-fails (fixed suite-wide
# in round 2, never driver re-verified) first, then the four
# §2-completing queries, the reshaped approx sketch, the streaming
# executions, the index-eval harness, then the remaining
# never-checked training/analytics queries. In-place reorder:
# REGISTRY is imported by reference elsewhere, so the dict object
# keeps its id.
_PRIORITY = [
    # -- 13 fixed round-1 hash-fails, driver re-verification --
    "clean_cast_project",
    "case_nullout_filter",
    "json_extract",
    "null_count_quality",
    "unpivot_monthly_metrics",
    "rolling_7d_revenue",
    "incremental_agg_merge",
    "window_running_sum",
    "monthly_order_stats",
    "sql_api_top_nations",
    "outer_join_null_fill",
    "variant_json_path",
    "value_histogram",
    # -- §2-completing queries (judge-verified r3, never driver-run) --
    "glob_pruned_csv_load",
    "runner_retry_pipeline",
    "merge_upsert_roundtrip",
    "data_quality_report",
    # -- reshaped this round: scalar p50/p95 (was array<double>) --
    "approx_value_percentiles",
    # -- streaming executions --
    "streaming_static_enrichment",
    "streaming_foreachbatch_upsert",
    "streaming_sessionize",
    "streaming_interval_join",
    # -- index/sketch evaluation harness --
    "ann_recall_eval",
    "ivf_recall_eval",
    "pq_distortion_report",
    "minhash_jaccard_error",
    "lang_id_confusion",
    # -- remaining never-driver-checked (round-3 additions) --
    "near_dup_clusters_kiveris",
    "near_dup_clusters_starcap",
    "knn_join_bucketed",
    "hard_negative_pairs",
    "embedding_group_centroids",
    "semantic_dedup_semdedup",
    "model_quality_classifier",
    "chi2_term_label_selection",
    "cdc_apply_roundtrip",
    "packed_block_segments",
    "corpus_shuffle_order",
    "dup_chunk_fraction",
    "oov_rate_scores",
    "embedding_gram_matrix",
    "bigram_logprob_scores",
    "embedding_standardize",
    "curriculum_quality_order",
    "cross_source_overlap",
    "dedup_rate_by_source",
    "zipf_corpus_fit",
    "gram_power_iteration",
    "tokenizer_fertility_by_lang",
    "training_manifest_assembly",
    # -- round-5 spillover (positions 51+; checked if the window is
    #    wider, otherwise they lead the next rotation) --
    "cross_split_contamination",
    "orc_roundtrip_agg",
    "time_weighted_avg_value",
    "psi_value_drift",
    "zorder_skipping_stats",
    "recursive_cte_reachability",
    "customer_price_trend",
    "rfm_customer_segments",
    "km_order_gap_survival",
    "association_rules_lift",
    "trimmed_mean_revenue",
    "window_funnel_levels",
    "bucketed_join_roundtrip",
    "event_transition_matrix",
    "scd2_segment_versions",
    "pit_scd2_enrichment",
]
# round-4 additions join the back of the priority queue (never
# driver-checked yet, so they rotate in after the existing backlog)
_PRIORITY += [
    "stratified_kfold_assign",
    "token_budget_selection",
    "leakage_safe_split",
    "duplicate_span_removal",
    "dsir_importance_weights",
    "ewma_monthly_spend",
    "lsh_candidate_quality",
    "media_byte_class_stats",
    "value_mad_by_type",
    "cluster_best_representative",
    "observed_quality_metrics",
    "streaming_left_outer_join",
    "partition_pruned_read",
    "dynamic_partition_pruned_join",
    "sql_api_parameterized",
    "paginated_orders",
    "mixture_epoch_plan",
    "classifier_calibration_bins",
    "compaction_roundtrip",
    "text_nfc_normalization",
    "null_safe_join",
    "order_value_moments",
    "weighted_median_price",
    "monthly_revenue_growth",
    "cumulative_new_users",
    "prefix_jaccard_near_dups",
]
# round-4 additions that register conditionally (environment-gated:
# streaming_user_totals_tws needs the google.protobuf runtime for
# Spark's transformWithState Python runner) join the back of the
# priority queue only when present
_PRIORITY += [
    n
    for n in (
        "hll_sketch_merge_rollup",
        "dedup_against_history",
        "pythonsink_commit_roundtrip",
        "xml_roundtrip_extract",
        "listagg_region_nations",
        "streaming_user_totals_tws",
    )
    if n in REGISTRY
]
_ordered = {
    n: REGISTRY[n]
    for n in (*_PRIORITY, *[q for q in REGISTRY if q not in _PRIORITY])
}
REGISTRY.clear()
REGISTRY.update(_ordered)

__all__ = ["REGISTRY", "QuerySpec", "register"]
