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

# Round-3 rotation (VERDICT r2 item 1): the driver checks the first
# ~50 registered queries per round, so this round's window is the 41
# queries with no driver verdict in either prior round (the
# training-data back half, media, sampling, streaming-dedup, fuzzy,
# k-means, CDC/as-of) followed by the 9 highest-risk round-1
# hash-fails that were fixed suite-wide in round 2 but never driver
# re-verified (decimal/HUGEINT class: pricing, grouping-sets family,
# pagerank, map-stats, gap-fill). Never-checked first so a slightly
# narrower window still covers them. In-place reorder: REGISTRY is
# imported by reference elsewhere, so the dict object keeps its id.
_PRIORITY = [
    # -- 41 never driver-checked (r1, r2 windows both missed these) --
    "tfidf_top_terms",
    "bm25_doc_ranking",
    "pmi_collocations",
    "repetition_signals",
    "boilerplate_removal",
    "unigram_logprob_scores",
    "ngram_contamination",
    "inverted_index_postings",
    "token_entropy_scores",
    "bpe_merge_candidates",
    "doc_chunking_overlap",
    "pii_redaction",
    "udtf_positional_tokenize",
    "sequence_token_spans",
    "greedy_pack_bins",
    "sample_hash_bernoulli",
    "sample_train_val_test_split",
    "sample_group_cap",
    "sample_rebalance_langs",
    "sample_temperature_mix",
    "weighted_sample_docs",
    "embedding_vector_stats",
    "embedding_int8_quantize",
    "pq_codes",
    "ivfpq_topk",
    "ann_ivf_topk_nprobe2",
    "kmeans_lloyd_step",
    "containment_near_dups",
    "vocab_typo_pairs",
    "fuzzy_source_lookup",
    "media_feature_extract",
    "media_resize_meta",
    "media_frame_sample",
    "approx_distinct_users",
    "approx_value_percentiles",
    "event_hourly_stats",
    "event_sliding_stats",
    "cdc_latest_state",
    "snapshot_diff_orders",
    "asof_join_orders_forward",
    "streaming_dedup_exactly_once",
    # -- 9 riskiest fixed r1 hash-fails, driver re-verification --
    "pricing_summary",
    "regional_revenue",
    "pagerank_trade_graph",
    "props_map_stats",
    "gapfill_priority_revenue",
    "grouping_sets_status_priority",
    "rollup_region_nation",
    "cube_status_priority",
    "salted_hot_key_agg",
]
_ordered = {
    n: REGISTRY[n]
    for n in (*_PRIORITY, *[q for q in REGISTRY if q not in _PRIORITY])
}
REGISTRY.clear()
REGISTRY.update(_ordered)

__all__ = ["REGISTRY", "QuerySpec", "register"]
