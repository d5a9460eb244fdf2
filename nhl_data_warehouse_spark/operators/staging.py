"""Staging models — the dbt staging layer as DataFrame transforms.

Each function is a pure ``DataFrame -> DataFrame`` (the Spark
restatement of a dbt model, SURVEY.md §3.3); incremental
materialization is handled separately by ``write.incremental_insert``
so the transform itself stays side-effect free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nhl_data_warehouse_spark.functions.cleaning import null_out_like
from nhl_data_warehouse_spark.schemas import TEAM_STATS_COLUMNS


def games(raw_reg_schedules: DataFrame) -> DataFrame:
    """``SELECT *`` passthrough of the regular-season schedule raw
    table (reference ``staging/games.sql:9-13``; the incremental
    anti-join predicate lives in the writer, M2)."""
    return raw_reg_schedules


def playoffs(raw_playoff_schedules: DataFrame) -> DataFrame:
    """Same passthrough for playoff schedules (``playoffs.sql:9-13``)."""
    return raw_playoff_schedules


def teams(raw_api_teams: DataFrame) -> DataFrame:
    """Flatten the ``teams`` JSON array one-row-per-element (J4/J5,
    reference ``staging/teams.sql:7-17``: ``lateral flatten(input =>
    teams)``), projecting league fields and building
    ``team_name = market || ' ' || name`` (P6, line 15).

    ``explode`` is Spark's per-row lateral unnest — no true cross join,
    no shuffle; it widens rows within the same partitions.
    """
    f = F.explode("teams")
    return raw_api_teams.select(
        "unique_key",
        "updated_at",
        "source_file",
        F.col("league.name").alias("league_name"),
        F.col("league.id").alias("league_id"),
        f.alias("value"),
    ).select(
        "unique_key",
        "updated_at",
        "source_file",
        "league_name",
        "league_id",
        F.col("value.alias").alias("team_state_code"),
        F.col("value.id").alias("team_id"),
        F.concat_ws(" ", F.col("value.market"), F.col("value.name")).alias("team_name"),
    )


def team_statistics(raw_team_stats: DataFrame) -> DataFrame:
    """Clean the scraped standings table (reference
    ``staging/team_statistics.sql:10-50``):

    1. null-out any cell whose upper-case value contains ``DIVISION``
       (the scrape's interleaved division-header rows, P8-P10,
       lines 12-25);
    2. drop rows where any of the 14 cleaned columns is NULL (P13,
       the conjunctive NOT NULL filter, lines 32-46);
    3. keep ``updated_at`` + ``unique_key`` lineage (lines 26-27).

    Beyond-reference fix (SURVEY.md §1.3): add the numeric casts the
    reference deferred forever, as ``*_n`` typed companions, so the
    mart can aggregate without re-parsing strings.
    """
    cleaned = raw_team_stats.select(
        *[null_out_like(c).alias(c) for c in TEAM_STATS_COLUMNS],
        "updated_at",
        "unique_key",
        "source_file",
    )
    no_headers = cleaned.na.drop(subset=TEAM_STATS_COLUMNS)
    long_cols = [
        "gp",
        "overall_wins",
        "overall_losses",
        "overtime_losses",
        "total_points",
        "goals_for",
        "goals_against",
        "wins_in_regulation",
    ]
    double_cols = [
        "points_percentage",
        "hockey_reference_srs",
        "strength_of_schedule",
        "points_percentage_in_regulation",
    ]
    typed = no_headers.select(
        "*",
        *[F.col(c).try_cast("long").alias(f"{c}_n") for c in long_cols],
        *[F.col(c).try_cast("double").alias(f"{c}_n") for c in double_cols],
    )
    return typed
