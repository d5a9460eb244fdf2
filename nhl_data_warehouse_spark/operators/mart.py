"""Mart layer — ``seasonal_metrics_agg`` and real seasonal rollups.

The reference mart (``marts/seasonal_metrics_agg.sql:20-74``) is a
view: regular-season games joined to per-team season statistics by
visitor team, UNION (distinct) the same join by home team — one output
row per (game, participating team), 21 columns. Its literal SQL
references models that don't carry those columns (SURVEY.md §1.5 ⚠);
this implements the unambiguous *intended* semantics:

    regular_season ⋈ team_statistics ON visitor = team
    UNION
    regular_season ⋈ team_statistics ON home = team

Scale notes (100TB stance): team_statistics is a bounded dimension
(~32 rows/season) — both joins broadcast, so the only shuffle in the
whole mart is the UNION's distinct. For reference parity the distinct
is over the full 21-column tuple; `dropDuplicates` on the natural key
is exposed as an option for wide-row scale (SURVEY.md §7.4.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GAME_COLS = [
    "game_date",
    "game_time",
    "visitor",
    "visitor_goals",
    "home",
    "home_goals",
    "guests_in_attendance",
    "length_of_game",
]

STAT_COLS = [
    "gp",
    "overall_wins",
    "overall_losses",
    "overtime_losses",
    "total_points",
    "points_percentage",
    "goals_for",
    "goals_against",
    "hockey_reference_srs",
    "strength_of_schedule",
    "points_percentage_in_regulation",
    "wins_in_regulation",
    "regulation_record",
]


def seasonal_metrics_agg(
    regular_season: DataFrame,
    team_statistics: DataFrame,
    dedup_on_key: bool = False,
) -> DataFrame:
    """visitor-join ∪ home-join denormalized mart (J1, J2, U1).

    ``dedup_on_key=False`` reproduces SQL ``UNION`` exactly
    (distinct over the full tuple, reference
    ``seasonal_metrics_agg.sql:47``); ``True`` switches to
    ``dropDuplicates`` on (game, team) — same result on clean data,
    far cheaper at scale (hashes keys, not 21-col rows).
    """
    stats = F.broadcast(team_statistics.select("team", *STAT_COLS))
    games = regular_season.select(*GAME_COLS)

    visitor_branch = games.join(
        stats, on=games["visitor"] == stats["team"], how="inner"
    ).select(*GAME_COLS, *STAT_COLS)
    home_branch = games.join(
        stats, on=games["home"] == stats["team"], how="inner"
    ).select(*GAME_COLS, *STAT_COLS)

    unioned = visitor_branch.unionByName(home_branch)
    if dedup_on_key:
        return unioned.dropDuplicates(
            ["game_date", "game_time", "visitor", "home", "gp", "total_points"]
        )
    return unioned.distinct()


def seasonal_team_rollup(regular_season: DataFrame) -> DataFrame:
    """The aggregate the mart's *name* promises but never computes
    (A2, SURVEY.md §2.5): per-team per-season metrics from game
    results — goals for/against, wins, home/away splits.

    Built as a map-side-light two-branch union then one hash
    aggregation; partial aggregation (map-side combine) keeps the
    shuffle tiny at any scale.
    """
    season = F.year("game_date").alias("season_year")
    as_home = regular_season.select(
        season,
        F.col("home").alias("team"),
        F.col("home_goals").alias("goals_for"),
        F.col("visitor_goals").alias("goals_against"),
        (F.col("home_goals") > F.col("visitor_goals")).cast("long").alias("win"),
        F.lit(1).alias("is_home"),
    )
    as_visitor = regular_season.select(
        season,
        F.col("visitor").alias("team"),
        F.col("visitor_goals").alias("goals_for"),
        F.col("home_goals").alias("goals_against"),
        (F.col("visitor_goals") > F.col("home_goals")).cast("long").alias("win"),
        F.lit(0).alias("is_home"),
    )
    return (
        as_home.unionByName(as_visitor)
        .groupBy("season_year", "team")
        .agg(
            F.count(F.lit(1)).alias("games_played"),
            F.sum("goals_for").alias("goals_for"),
            F.sum("goals_against").alias("goals_against"),
            F.sum("win").alias("wins"),
            F.sum(F.when(F.col("is_home") == 1, F.col("win"))).alias("home_wins"),
        )
    )
