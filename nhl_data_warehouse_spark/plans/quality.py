"""Runtime data-quality gates (SURVEY.md §2.5 A1).

The reference's single runtime check is a null-count on
``RAW.TEAM_STATS.TEAM`` that fails the pipeline when non-zero
(``hockeyreference_dag.py:141-149``). Generalized here to arbitrary
column checks computed in ONE aggregation pass (one job, no per-check
scans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class QualityCheckError(AssertionError):
    """A data-quality gate failed; carries the offending counts."""


def null_check(df: DataFrame, columns: list[str], equal_to: int = 0) -> dict[str, int]:
    """Count NULLs per column in a single pass; raise if any count
    differs from ``equal_to`` (reference semantics: the
    SQLColumnCheckOperator null_check with equal_to=0).
    """
    aggs = [
        F.sum(F.col(c).isNull().cast("long")).alias(c) for c in columns
    ]
    row = df.agg(*aggs).collect()[0]
    counts = {c: (row[c] or 0) for c in columns}
    bad = {c: n for c, n in counts.items() if n != equal_to}
    if bad:
        raise QualityCheckError(
            f"null_check failed (expected {equal_to}): {bad}"
        )
    return counts


def row_count_check(df: DataFrame, at_least: int = 1) -> int:
    """Fail if the frame has fewer than ``at_least`` rows."""
    n = df.count()
    if n < at_least:
        raise QualityCheckError(f"row_count_check failed: {n} < {at_least}")
    return n


def unique_check(df: DataFrame, columns: list[str]) -> int:
    """Fail if any (columns) combination appears more than once — the
    dbt ``unique`` test the reference declared dbt_utils for but never
    wrote (SURVEY.md §5.4). One aggregation; returns duplicate-group
    count (0 on success). NULL keys group together, matching dbt."""
    dupes = (
        df.groupBy(*columns)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    # limit(5): enough to report, never collects a huge violation set
    sample = dupes.limit(5).collect()
    if sample:
        n_groups = dupes.count()
        raise QualityCheckError(
            f"unique_check failed on {columns}: {n_groups} duplicated keys, "
            f"e.g. {[tuple(r[c] for c in columns) for r in sample]}"
        )
    return 0


def accepted_values_check(
    df: DataFrame, column: str, values: list
) -> int:
    """Fail if ``column`` holds anything outside ``values`` (NULL is a
    violation — pair with null_check when NULLs are expected)."""
    bad = df.filter(~F.col(column).isin(values) | F.col(column).isNull())
    sample = [r[column] for r in bad.select(column).distinct().limit(5).collect()]
    if sample:
        raise QualityCheckError(
            f"accepted_values_check failed on {column}: unexpected {sample}"
        )
    return 0


def freshness_check(
    df: DataFrame, ts_col: str, max_age: str, now=None
) -> None:
    """Fail when the newest ``ts_col`` is older than ``max_age``
    (an INTERVAL string like '2 days') — the load-recency gate a
    scheduled warehouse needs. ``now`` defaults to current_timestamp;
    pass a literal for deterministic tests."""
    now_expr = F.lit(now).cast("timestamp") if now is not None else F.current_timestamp()
    row = df.agg(
        F.max(ts_col).alias("newest"),
        F.max(now_expr - F.expr(f"INTERVAL {max_age}")).alias("threshold"),
    ).collect()[0]
    if row.newest is None or row.newest < row.threshold:
        raise QualityCheckError(
            f"freshness_check failed: newest {ts_col}={row.newest} is older "
            f"than {max_age} before {row.threshold}"
        )
