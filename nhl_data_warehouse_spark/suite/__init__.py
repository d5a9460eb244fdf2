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

# Round-6 rotation (VERDICT r5 items 1-2): cumulative driver-green is
# 222/233 after rounds 1-5. Slots 1-8 are the round-5 additions that
# spilled past round 5's window (locally 8/8 oracle-green, never
# driver-checked); slots 9-11 are the three sketch queries, reshaped
# this round to emit engine-independent error-bound booleans so they
# can hash-match for the first time; round-6 additions follow, then
# previously-green families for re-verification.
# In-place reorder: REGISTRY is imported by reference elsewhere, so
# the dict object keeps its id.
_PRIORITY = [
    # -- round-5 spillover (never driver-checked; locally 8/8 green) --
    "fim_split_documents",
    "length_bucket_padding",
    "cusum_revenue_drift",
    "grouped_hybrid_quantiles",
    "sql_udf_price_tiers",
    "collated_segment_counts",
    "schema_evolution_read",
    "lateral_topk_orders",
    # -- sketches, reshaped to tolerance-band oracles (VERDICT r5 #2) --
    "approx_distinct_users",
    "approx_value_percentiles",
    "hll_sketch_merge_rollup",
]
# round-6 additions fill the remaining window slots (and any
# spillover leads round 7 automatically)
_PRIORITY += [
    "qualify_top_parts",
    "group_by_all_revenue",
    "tablesample_hash_bucket",
    "session_window_stats",
    "mann_whitney_order_values",
    "ks_test_value_drift",
    "bitmap_retention_rollup",
    "linear_interp_gapfill",
    "regr_price_vs_quantity",
    "max_by_min_by_extremes",
    "bool_count_if_gates",
    "try_arithmetic_guards",
    "pareto_frontier_orders",
    "convert_timezone_hourly",
    "values_inline_enrich",
    "except_all_multiset",
    "arrow_grouped_median",
    "pipe_syntax_rollup",
    "transpose_wide_metrics",
    "identifier_clause_read",
]
_PRIORITY = [n for n in _PRIORITY if n in REGISTRY]
_ordered = {
    n: REGISTRY[n]
    for n in (*_PRIORITY, *[q for q in REGISTRY if q not in _PRIORITY])
}
REGISTRY.clear()
REGISTRY.update(_ordered)

__all__ = ["REGISTRY", "QuerySpec", "register"]
