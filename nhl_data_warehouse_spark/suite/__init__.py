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
from nhl_data_warehouse_spark.suite import surface  # noqa: E402,F401

# Round-7 rotation (VERDICT r6 item 1): all 253 queries have been
# driver-green at least once, so this round's window re-verifies the
# STALEST — the 26 queries whose latest green is round 1 and the 31
# whose latest green is round 2. Five rounds of suite/session/operator
# refactors have shipped since those verdicts; re-verification under
# the current code is the only open correctness risk. Any slots past
# the driver's ~50-query window spill into round 8 automatically.
# New round-7 queries append to the BACK of the registry (the
# rotation queue), never into this window.
# In-place reorder: REGISTRY is imported by reference elsewhere, so
# the dict object keeps its id.
_PRIORITY = [
    # -- latest green round 1 (26) --
    "anti_join_incremental",
    "asof_join_orders",
    "bfs_trade_hops",
    "cohort_retention",
    "copurchase_pairs",
    "countmin_token_freq",
    "distinct_agg",
    "equi_depth_bins",
    "exact_percentiles",
    "except_custkeys",
    "explode_tokens",
    "funnel_conversion",
    "intersect_custkeys",
    "join_broadcast_dim",
    "md5_lineage_key",
    "pivot_status_by_year",
    "salted_skew_join",
    "scalar_subquery_filter",
    "semi_join_exists",
    "triangle_cosupply",
    "union_distinct_branches",
    "window_lag_gap",
    "window_rank_family",
    "window_rank_topn",
    "zorder_file_assignment",
    "zscore_outliers",
    # -- latest green round 2 (31) --
    "ann_bucketed_topk",
    "ann_ivf_cells",
    "ann_ivf_topk",
    "ann_lsh_buckets",
    "ann_multiprobe_topk",
    "binary_media_meta",
    "catalog_context_read",
    "corpus_curation_pipeline",
    "cosine_topk_bruteforce",
    "dedup_exact",
    "dedup_exact_normalized",
    "doc_fingerprints",
    "embedding_near_dups",
    "jaccard_near_dups",
    "lang_id_predictions",
    "lsh_verified_near_dups",
    "minhash_lsh_candidates",
    "minhash_signatures",
    "near_dup_clusters",
    "quality_scores",
    "range_join_pairs",
    "rest_json_ingest_roundtrip",
    "scrape_ingest_roundtrip",
    "sessionize_events",
    "simhash_sketch",
    "streaming_hourly_stats",
    "streaming_user_totals",
    "token_stats",
    "tpch_q16_supplier_part_counts",
    "tpch_q20_excess_inventory_suppliers",
    "view_materialization_sql",
]
_PRIORITY = [n for n in _PRIORITY if n in REGISTRY]
_ordered = {
    n: REGISTRY[n]
    for n in (*_PRIORITY, *[q for q in REGISTRY if q not in _PRIORITY])
}
REGISTRY.clear()
REGISTRY.update(_ordered)

__all__ = ["REGISTRY", "QuerySpec", "register"]
