"""Catalog/session-context operations (SURVEY.md §2.1 S10-S11).

The reference sets Snowflake session context before every load
(``USE DATABASE NHL_STATS; USE SCHEMA RAW`` —
``hockeyreference_dag.py:100-111``, ``nhl_api_dag.py:231-243``) and
reads via a parameterized ``SELECT * FROM {{db}}.{{schema}}.{{table}}``
(``include/sql/query_nhl_stats_season.sql:1-2``). Spark's catalog is
two-level (database.table), so the db.schema pair collapses to one
namespace: ``nhl_stats_raw`` ~ NHL_STATS.RAW.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def ensure_database(spark: SparkSession, name: str) -> None:
    """CREATE DATABASE IF NOT EXISTS + set as current (S11)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")
    spark.catalog.setCurrentDatabase(name)


def use_database(spark: SparkSession, name: str) -> None:
    """``USE DATABASE`` twin; fails if the namespace doesn't exist."""
    spark.catalog.setCurrentDatabase(name)


def read_table(spark: SparkSession, table: str, database: str | None = None) -> DataFrame:
    """Parameterized full-table read (S10): the reference's
    ``SELECT * FROM {{db}}.{{schema}}.{{table}}``. Qualified when
    ``database`` is given, else resolved in the current namespace."""
    name = f"{database}.{table}" if database else table
    return spark.table(name)
