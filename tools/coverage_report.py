"""Generate COVERAGE.md: SURVEY.md §2 operator inventory -> where each
operator lives in this engine (module, driver query, oracle, tests).

Usage: python tools/coverage_report.py   (rewrites COVERAGE.md)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# §2 operator id -> (implementation, tests / driver queries). Driver
# queries are named as registered in the suite; every named query has
# a DuckDB oracle unless marked rows-only.
SECTION2 = {
    "S1 HTML table scrape": (
        "sources/extract.py:scrape_season_tables (+stdlib first-table parser)",
        "tests/test_extract.py; query scrape_ingest_roundtrip",
    ),
    "S2 REST JSON extract": (
        "sources/extract.py:extract_api_endpoint ('games' guard); "
        "sources/restjson_source.py (Spark 4 Python DataSource: executor-side parallel fetch)",
        "tests/test_extract.py; query rest_json_ingest_roundtrip",
    ),
    "S3 CSV file sink": ("sources/extract.py (landing write); write.py", "tests/test_extract.py"),
    "S4 local->S3 transfer": (
        "path-config: landing root is any Hadoop-FS URI (s3a://...)",
        "design note — no separate op needed",
    ),
    "S5 file-arrival sensor": (
        "streaming/file_ingest.py (file source + availableNow); "
        "sources/jsonlog_stream.py (custom Python streaming DataSource: "
        "chunk offsets, parallel partitions, exactly-once)",
        "tests/test_streaming.py::TestStreamFileIngest/TestJsonlogStreamSource",
    ),
    "S6 COPY INTO (CSV)": (
        "sources/csv_source.py:load_games_csv/load_team_stats_csv",
        "tests/test_nhl_pipeline.py; queries clean_cast_project, case_nullout_filter",
    ),
    "S7 COPY INTO (JSON)": (
        "sources/json_source.py:load_json_raw (raw_json retained)",
        "tests/test_nhl_pipeline.py; query json_extract",
    ),
    "S8 file metadata columns": (
        "csv/json sources: _metadata.file_name + current_timestamp",
        "query md5_lineage_key",
    ),
    "S9 file-pattern pruning": (
        "pathGlobFilter('*.csv'/'*.json') in both sources",
        "tests/test_nhl_pipeline.py",
    ),
    "S10 parameterized table read": ("catalog.py:read_table", "tests/test_nhl_pipeline.py::TestCatalogContext; query catalog_context_read"),
    "S11 session context (USE db)": ("catalog.py:ensure_database/use_database", "tests/test_nhl_pipeline.py::TestCatalogContext; query catalog_context_read"),
    "P1 positional projection": ("schemas.py explicit StructTypes", "query clean_cast_project"),
    "P2 column skip ($7)": ("csv_source.py (ot_so_marker never selected)", "tests/test_nhl_pipeline.py"),
    "P3 permissive casts": ("functions/cleaning.py + try_cast", "queries clean_cast_project; tests (malformed rows)"),
    "P4 trim": ("functions/cleaning.py:clean_scraped", "query clean_cast_project"),
    "P5 strip quotes (replace)": ("functions/cleaning.py:clean_scraped", "query clean_cast_project"),
    "P6 string concat": ("staging.py:teams (market||' '||name)", "query md5_lineage_key"),
    "P7 MD5 lineage key": ("functions/cleaning.py:md5_key", "query md5_lineage_key"),
    "P8 UPPER": ("functions/cleaning.py:null_out_like", "query case_nullout_filter"),
    "P9 LIKE predicate": ("functions/cleaning.py:null_out_like", "query case_nullout_filter"),
    "P10 CASE WHEN null-out": ("functions/cleaning.py:null_out_like", "query case_nullout_filter"),
    "P11 JSON field extraction": ("struct access in staging.py:teams", "query json_extract"),
    "P12 JSON parse": ("json_source.py:from_json with schema", "query json_extract"),
    "P13 NOT NULL conjunctive filter": ("staging.py:team_statistics (na.drop)", "query case_nullout_filter"),
    "P14 payload guard": ("json_source.py:guard_has_games; extract.py", "tests/test_extract.py; query rest_json_ingest_roundtrip"),
    "J1 inner equi-join (visitor)": ("operators/mart.py:seasonal_metrics_agg", "queries join_broadcast_dim, regional_revenue"),
    "J2 inner equi-join (home)": ("operators/mart.py:seasonal_metrics_agg", "same"),
    "J3 anti-join incremental dedup": ("write.py:incremental_insert (left_anti)", "query anti_join_incremental; idempotency tests"),
    "J4 lateral flatten -> explode": ("staging.py:teams", "query explode_tokens"),
    "J5 implicit lateral comma-join": ("subsumed by explode (per-row lateral)", "—"),
    "U1 UNION distinct": ("mart.py + write.py:union_distinct", "query union_distinct_branches"),
    "A1 null-count quality gate": ("plans/quality.py:null_check", "query null_count_quality; drive tests"),
    "A2 seasonal aggregate (implied)": ("mart.py:seasonal_team_rollup", "queries pricing_summary, monthly_order_stats"),
    "M1 view materialization": ("write.py:as_view; runner materializations", "tests/test_nhl_pipeline.py; query view_materialization_sql"),
    "M2 incremental delete+insert": ("write.py:incremental_insert", "rerun-appends-0 tests"),
    "M3 table alias": ("write.py:saveAsTable names", "tests; queries catalog_context_read, view_materialization_sql"),
    "M4 append-only + load-once": ("sources/ledger.py + streaming checkpoint", "ledger replay + streaming restart tests"),
    "M5 retry/orchestration": ("plans/runner.py (topo order, retries)", "tests/test_nhl_pipeline.py"),
    "§2.6 windows/sort/limit": ("native (beyond-reference)", "queries window_rank_topn, window_running_sum, window_lag_gap"),
    "§2.7 streaming": ("streaming/ (windows, sessions, stateful)", "tests/test_streaming.py; query event_hourly_stats"),
}


def main() -> None:
    from nhl_data_warehouse_spark.suite import REGISTRY

    lines = [
        "# COVERAGE — SURVEY.md §2 inventory -> engine (generated by tools/coverage_report.py)",
        "",
        "## Reference operators (§2.1-§2.9)",
        "",
        "| Reference op | Implementation | Exercised by |",
        "|---|---|---|",
    ]
    for op, (impl, tests) in SECTION2.items():
        lines.append(f"| {op} | `{impl}` | {tests} |")

    lines += [
        "",
        f"## Driver query registry ({len(REGISTRY)} queries)",
        "",
        "Every query is a `(spark, sf_dir) -> DataFrame` over the driver's",
        "parquet tables; *oracle* means an exact DuckDB hash-match at sf0.01",
        "(`tools/check_oracle.py`); rows-only entries are engine-specific",
        "sketches/Python semantics the driver checks more weakly.",
        "",
        "| Query | §2 / capability | Oracle |",
        "|---|---|---|",
    ]
    for name, spec in REGISTRY.items():
        oracle = "exact" if spec.oracle else "rows-only"
        lines.append(f"| `{name}` | {spec.op_ids} | {oracle} |")
    lines.append("")

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}: {len(SECTION2)} reference ops, {len(REGISTRY)} queries")


if __name__ == "__main__":
    main()
