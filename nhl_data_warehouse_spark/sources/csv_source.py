"""CSV stage loads — the ``COPY INTO`` CSV path (S6, S8, S9).

Reference behavior being re-expressed (not ported):
``include/sql/copy_into_nhl_stats_seasons.sql`` /
``copy_into_nhl_stats_teams.sql`` scan staged CSV files matching a
pattern, project columns positionally, add ``METADATA$START_SCAN_TIME``
/ ``METADATA$FILENAME`` / ``MD5(filename || payload)`` audit columns,
and append. Spark-first: explicit positional StructType (never
inferSchema), ``_metadata.file_path`` for the filename, glob for the
pattern — all of which Catalyst resolves at scan planning, so file
pruning and column pruning are free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nhl_data_warehouse_spark import schemas
from nhl_data_warehouse_spark.functions.cleaning import (
    clean_scraped,
    md5_key,
    time_to_minutes,
)


def _source_file() -> F.Column:
    """Base filename of the input file for each row.

    ``_metadata.file_name`` (Spark 3.5+) matches the reference's
    ``METADATA$FILENAME`` (S8, ``copy_into_nhl_stats_seasons.sql:5``)
    and — unlike ``input_file_name()`` — is a proper metadata column
    that survives joins and works on all file sources.
    """
    return F.col("_metadata.file_name")


def load_games_csv(spark: SparkSession, path_glob: str) -> DataFrame:
    """Typed load of games-scrape CSVs -> RAW_REGULAR_SEASON shape.

    Per-column cleaning is ``trim(replace(x,'"',''))`` then a
    permissive cast (NULL on parse failure, matching Snowflake's
    permissive COPY): reference ``copy_into_nhl_stats_seasons.sql:7-14``.
    The OT/SO marker column ($7) is deliberately not selected (P2,
    reference :12-13 jumps $6 -> $8).
    """
    raw = (
        spark.read.schema(schemas.RAW_GAMES_CSV)
        .option("header", "true")
        .option("pathGlobFilter", "*.csv")
        .csv(path_glob)
        .select("*", "_metadata")
    )
    payload = F.concat_ws(
        "|", *[F.coalesce(F.col(f.name).cast("string"), F.lit("")) for f in schemas.RAW_GAMES_CSV.fields]
    )
    return raw.select(
        F.current_timestamp().alias("updated_at"),
        _source_file().alias("source_file"),
        md5_key(_source_file(), payload).alias("unique_key"),
        clean_scraped("game_date").try_cast("date").alias("game_date"),
        clean_scraped("game_time").alias("game_time"),
        time_to_minutes(clean_scraped("game_time")).alias("game_time_minutes"),
        clean_scraped("visitor").alias("visitor"),
        clean_scraped("visitor_goals").try_cast("long").alias("visitor_goals"),
        clean_scraped("home").alias("home"),
        clean_scraped("home_goals").try_cast("long").alias("home_goals"),
        clean_scraped("attendance").try_cast("long").alias("guests_in_attendance"),
        clean_scraped("length_of_game").alias("length_of_game"),
        time_to_minutes(clean_scraped("length_of_game")).alias("length_of_game_minutes"),
    )


def load_team_stats_csv(spark: SparkSession, path_glob: str) -> DataFrame:
    """Untyped load of standings-scrape CSVs -> RAW_TEAM_STATS shape.

    All 14 columns stay text (reference loads them untyped,
    ``copy_into_nhl_stats_teams.sql:4-17``); dirty division-header rows
    flow through to be cleaned in staging, exactly like the reference.
    ``unique_key = md5(filename || team)`` per reference line 20.
    """
    raw = (
        spark.read.schema(schemas.RAW_TEAM_STATS_CSV)
        .option("header", "true")
        .option("pathGlobFilter", "*.csv")
        .csv(path_glob)
        .select("*", "_metadata")
    )
    return raw.select(
        *[F.col(c) for c in schemas.TEAM_STATS_COLUMNS],
        F.current_timestamp().alias("updated_at"),
        _source_file().alias("source_file"),
        md5_key(_source_file(), F.col("team")).alias("unique_key"),
    )
