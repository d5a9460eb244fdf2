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

# Round-5 rotation (VERDICT r4 item 1): cumulative driver-green is
# 173/222 after rounds 1-4. This list is ALL 47 registered queries
# without a driver CORRECTNESS row yet (the round-4 spillover from
# positions 51+ plus the 26 round-4 additions and the unconditional
# late registrations), so one ~50-query window closes the backlog
# and every registry query has a driver-green row. Queries added in
# round 5 itself append right after, filling the remaining window
# slots; previously-green families follow for re-verification.
# In-place reorder: REGISTRY is imported by reference elsewhere, so
# the dict object keeps its id.
_PRIORITY = [
    # -- round-4 spillover (never driver-checked) --
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
    # -- round-4 additions (never driver-checked) --
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
    # -- late unconditional registrations (never driver-checked) --
    "hll_sketch_merge_rollup",
    "dedup_against_history",
    "pythonsink_commit_roundtrip",
    "xml_roundtrip_extract",
    "listagg_region_nations",
]
# round-5 additions fill the remaining window slots (and any
# spillover leads round 6 automatically)
_PRIORITY += [
    "hybrid_exact_quantiles",
    "price_band_lookup_join",
    "ab_value_ztest",
    # positions 51+: spill over to lead round 6's window
    "fim_split_documents",
    "length_bucket_padding",
    "cusum_revenue_drift",
    "grouped_hybrid_quantiles",
    "sql_udf_price_tiers",
    "collated_segment_counts",
    "schema_evolution_read",
    "lateral_topk_orders",
]
_PRIORITY += [
    n
    for n in (
        # environment-gated: streaming_user_totals_tws registers only
        # when the google.protobuf runtime is present
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
