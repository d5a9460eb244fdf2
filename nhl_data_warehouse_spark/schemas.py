"""Schema registry — every table schema the engine reads or writes.

Mirrors the reference's data model (SURVEY.md §1.5):

- raw CSV tables are read with *explicit positional* schemas, all-text,
  because the reference loads CSV untyped-or-permissively and cleans in
  staging (reference: ``include/sql/copy_into_nhl_stats_teams.sql:4-17``
  loads ``$1..$14`` as text; ``copy_into_nhl_stats_seasons.sql:7-14``
  casts at load).
- raw JSON tables use explicit nested StructTypes (schema-on-read
  replacement for Snowflake VARIANT, reference:
  ``include/sql/copy_into_nhl_api_*.sql``) while also retaining the raw
  document text in a ``raw_json`` column for reparse parity
  (reference: ``copy_into_nhl_api_seasons.sql:5``).
- TIME-typed columns (``game_time``, ``length_of_game``) have no Spark
  equivalent; convention is the raw ``'H:MM'`` string plus a derived
  ``*_minutes`` integer (SURVEY.md §1.3 / §7.4).

Lineage/audit columns on every raw row: ``updated_at`` (load time),
``source_file`` (input file), ``unique_key`` (md5(filename || payload))
— reference: ``copy_into_nhl_stats_seasons.sql:4-6``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# raw CSV (positional, header row present in scrape output)
# ---------------------------------------------------------------------------

# hockey-reference games page scrape (FIXTURES.md F1). Column $7 (the
# OT/SO marker) is present in the file but *skipped* by the load
# projection (reference: copy_into_nhl_stats_seasons.sql:12-13 jumps
# $6 -> $8).
RAW_GAMES_CSV = T.StructType(
    [
        T.StructField("game_date", T.StringType()),
        T.StructField("game_time", T.StringType()),
        T.StructField("visitor", T.StringType()),
        T.StructField("visitor_goals", T.StringType()),
        T.StructField("home", T.StringType()),
        T.StructField("home_goals", T.StringType()),
        T.StructField("ot_so_marker", T.StringType()),  # skipped downstream
        T.StructField("attendance", T.StringType()),
        T.StructField("length_of_game", T.StringType()),
    ]
)

# hockey-reference standings scrape (FIXTURES.md F2); loaded fully
# untyped per copy_into_nhl_stats_teams.sql:4-17.
TEAM_STATS_COLUMNS = [
    "team",
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
RAW_TEAM_STATS_CSV = T.StructType(
    [T.StructField(c, T.StringType()) for c in TEAM_STATS_COLUMNS]
)

# ---------------------------------------------------------------------------
# raw JSON (nested struct schemas replacing Snowflake VARIANT)
# ---------------------------------------------------------------------------

LEAGUE_STRUCT = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("alias", T.StringType()),
        T.StructField("name", T.StringType()),
    ]
)

# teams.json (FIXTURES.md F3; consumed at reference teams.sql:11-17)
API_TEAMS_SCHEMA = T.StructType(
    [
        T.StructField("league", LEAGUE_STRUCT),
        T.StructField(
            "teams",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.StringType()),
                        T.StructField("name", T.StringType()),
                        T.StructField("market", T.StringType()),
                        T.StructField("alias", T.StringType()),
                        T.StructField("sr_id", T.StringType()),
                        T.StructField("reference", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)

TEAM_VENUE_STRUCT = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("alias", T.StringType()),
    ]
)

# schedule.json for REG and PST season types (FIXTURES.md F4;
# consumed at reference copy_into_nhl_api_schedules.sql:8-10)
API_SCHEDULE_SCHEMA = T.StructType(
    [
        T.StructField("league", LEAGUE_STRUCT),
        T.StructField(
            "season",
            T.StructType(
                [
                    T.StructField("id", T.StringType()),
                    T.StructField("year", T.IntegerType()),
                    T.StructField("type", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "games",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.StringType()),
                        T.StructField("status", T.StringType()),
                        T.StructField("scheduled", T.StringType()),
                        T.StructField("home", TEAM_VENUE_STRUCT),
                        T.StructField("away", TEAM_VENUE_STRUCT),
                        T.StructField("home_points", T.IntegerType()),
                        T.StructField("away_points", T.IntegerType()),
                        T.StructField(
                            "venue",
                            T.StructType(
                                [
                                    T.StructField("name", T.StringType()),
                                    T.StructField("city", T.StringType()),
                                ]
                            ),
                        ),
                    ]
                )
            ),
        ),
    ]
)

# seasons.json (FIXTURES.md F5; consumed at reference
# copy_into_nhl_api_seasons.sql:8-9 — note plural key aliased singular)
API_SEASONS_SCHEMA = T.StructType(
    [
        T.StructField("league", LEAGUE_STRUCT),
        T.StructField(
            "seasons",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.StringType()),
                        T.StructField("year", T.IntegerType()),
                        T.StructField(
                            "type",
                            T.StructType([T.StructField("code", T.StringType())]),
                        ),
                        T.StructField("status", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)

# ---------------------------------------------------------------------------
# typed raw-table target schemas (what lands in the warehouse)
# ---------------------------------------------------------------------------

AUDIT_FIELDS = [
    T.StructField("updated_at", T.TimestampType()),
    T.StructField("source_file", T.StringType()),
    T.StructField("unique_key", T.StringType()),
]

# RAW.REGULAR_SEASON (reference copy_into_nhl_stats_seasons.sql:3-14)
RAW_REGULAR_SEASON = T.StructType(
    AUDIT_FIELDS
    + [
        T.StructField("game_date", T.DateType()),
        T.StructField("game_time", T.StringType()),  # TIME -> 'HH:MM' string
        T.StructField("game_time_minutes", T.IntegerType()),  # derived
        T.StructField("visitor", T.StringType()),
        T.StructField("visitor_goals", T.LongType()),
        T.StructField("home", T.StringType()),
        T.StructField("home_goals", T.LongType()),
        T.StructField("guests_in_attendance", T.LongType()),
        T.StructField("length_of_game", T.StringType()),  # TIME -> 'H:MM' string
        T.StructField("length_of_game_minutes", T.IntegerType()),  # derived
    ]
)

# RAW.TEAM_STATS (reference copy_into_nhl_stats_teams.sql:3-20): the 14
# scrape columns stay text at raw; staging adds the casts the reference
# deferred (SURVEY.md §1.3).
RAW_TEAM_STATS = T.StructType(
    [T.StructField(c, T.StringType()) for c in TEAM_STATS_COLUMNS] + AUDIT_FIELDS
)
