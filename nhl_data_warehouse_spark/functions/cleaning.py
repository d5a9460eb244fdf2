"""Scalar cleaning expressions (SURVEY.md §2.2 P1-P13).

Each helper mirrors one scalar pattern in the reference and returns a
Catalyst ``Column`` (JVM-side, codegen'd — never a Python UDF).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def clean_scraped(col: Column | str) -> Column:
    """``trim(replace(x, '"', ''))`` — strip stray quotes then
    whitespace, exactly the permissive-scrape cleanup the reference
    applies to every games column (P4+P5, reference:
    ``copy_into_nhl_stats_seasons.sql:7-14``).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, '"', ""))


def md5_key(*cols: Column | str) -> Column:
    """``MD5(a || b || ...)`` lineage key (P6+P7, reference:
    ``copy_into_nhl_stats_seasons.sql:6`` and every other COPY).

    Concatenation is null-propagating (``||`` semantics): any NULL
    input yields a NULL key, matching Snowflake ``||``.
    """
    exprs = [
        (F.col(c) if isinstance(c, str) else c).cast("string") for c in cols
    ]
    return F.md5(F.concat(*exprs))


def null_out_like(col: Column | str, pattern: str = "%DIVISION%") -> Column:
    """``CASE WHEN UPPER(c) LIKE pattern THEN NULL ELSE c END`` — the
    division-header row killer (P8-P10, reference:
    ``team_statistics.sql:12-25``).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.upper(c).like(pattern), F.lit(None)).otherwise(c)


def time_to_minutes(col: Column | str) -> Column:
    """Derive integer minutes from an ``'H:MM'`` / ``'HH:MM'`` string.

    Spark has no TIME type (SURVEY.md §1.3); the convention is to keep
    the raw string and carry this derived minutes column for
    arithmetic. Malformed values yield NULL (permissive-load parity).
    """
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, ":")
    # F.get (not getItem): under ANSI mode an out-of-bounds index throws,
    # so a value with no ':' would kill the job instead of yielding NULL
    hours = F.get(parts, 0).try_cast("int")
    minutes = F.get(parts, 1).try_cast("int")
    return (hours * F.lit(60) + minutes).cast("int")
