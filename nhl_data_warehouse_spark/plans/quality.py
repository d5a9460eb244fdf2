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
