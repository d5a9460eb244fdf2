"""The operator-level cache-release contract.

Several operators ``persist()`` an intermediate whose plan is read
more than once (both sides of a self-join, a frequency build plus a
probe). The operators return LAZY DataFrames, so they cannot
unpersist before the caller has run its action. Two release paths
exist (VERDICT r12 item 7):

- **Session sweep** — a long-lived session serving many queries calls
  ``session.release_cached(spark)`` between them (the bench harness
  and oracle checker do). Correct, but session-wide: a library caller
  embedding ONE operator inside a larger cached pipeline cannot use
  it without dropping its own cache entries.
- **Per-call registry** — every persisting public operator accepts
  ``cache_registry: list | None``; when a list is passed, each
  DataFrame the call persists is appended, and the caller unpersists
  exactly those after its action:

    >>> reg: list = []
    >>> out = some_operator(df, cache_registry=reg)
    >>> out.write.parquet(...)
    >>> for cached in reg:
    ...     cached.unpersist()

``pin`` is the one-line implementation both paths share.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def pin(df: DataFrame, cache_registry: list | None) -> DataFrame:
    """``persist()`` a multiply-read intermediate and, when the caller
    passed a ``cache_registry`` list, record it there for per-call
    release (the ``_canonical_deg_tri`` convention, ADVICE r11/r12).
    """
    df = df.persist()
    if cache_registry is not None:
        cache_registry.append(df)
    return df
