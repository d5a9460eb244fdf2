"""Ingestion sources (SURVEY.md §2.1 S1-S11).

The reference's ingest path is: scrape/API -> local file -> S3 ->
Snowflake ``COPY INTO`` with file-metadata + md5 lineage columns and
load-once-per-file history. Here that becomes: injectable extractors ->
landing directory (any Hadoop-FS URI: local path, ``s3a://``...) ->
``spark.read`` with explicit schemas + the same lineage columns ->
append, with exactly-once via an ingest ledger (batch) or the
Structured-Streaming file source (``streaming/file_ingest.py``).
"""

from nhl_data_warehouse_spark.sources.csv_source import load_games_csv, load_team_stats_csv
from nhl_data_warehouse_spark.sources.extract import (
    extract_api_endpoint,
    parse_first_html_table,
    scrape_season_tables,
)
from nhl_data_warehouse_spark.sources.json_source import load_json_raw
from nhl_data_warehouse_spark.sources.ledger import IngestLedger
from nhl_data_warehouse_spark.sources.restjson_source import RestJsonDataSource

__all__ = [
    "load_games_csv",
    "load_team_stats_csv",
    "load_json_raw",
    "IngestLedger",
    "RestJsonDataSource",
    "scrape_season_tables",
    "extract_api_endpoint",
    "parse_first_html_table",
]
