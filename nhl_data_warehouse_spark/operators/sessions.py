"""Batch sessionization — gap-based sessions without streaming state.

Streaming sessionization lives in ``streaming/windows.py``
(``session_window``); this is the batch twin expressed with plain
window functions so it is SQL-oracle-checkable and runs anywhere:
a session breaks when the gap to the previous event (per key) exceeds
the threshold; session ids are running counts of breaks.

One shuffle (partition by key) + one sort — the minimal cost for any
order-dependent per-key computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize_batch(
    events: DataFrame,
    *,
    key: str = "user_id",
    time_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """One row per session: key, session_id (1-based per key), event
    count, start/end timestamps. Ordering ties broken by ``id_col``
    so results are deterministic."""
    gap_us = gap_minutes * 60 * 1_000_000
    w_order = Window.partitionBy(key).orderBy(F.col(time_col), F.col(id_col))
    with_break = events.select(
        key,
        time_col,
        id_col,
        F.when(
            F.unix_micros(time_col)
            - F.unix_micros(F.lag(time_col).over(w_order))
            > F.lit(gap_us),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("is_break"),
    )
    w_run = w_order.rowsBetween(Window.unboundedPreceding, 0)
    with_session = with_break.select(
        key,
        time_col,
        (F.sum("is_break").over(w_run) + 1).alias("session_id"),
    )
    return with_session.groupBy(key, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(time_col).alias("session_start"),
        F.max(time_col).alias("session_end"),
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: for each (from_type, to_type) pair, the observed count
    and the conditional probability P(to | from) — the
    path-analysis / next-action model product analytics builds on
    top of sessionization.

    Scale design: one keyed window per user (lead over the user's
    time-ordered stream — partitioned, never global), then a
    dimension-squared aggregation (event types are a small vocab);
    the per-from totals come from a second tiny agg joined back.
    Probability is one double division of exact counts — engine-
    stable without rounding. The last event per user has no
    successor and drops out (standard convention).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(tiebreak_col))
    pairs = (
        events.select(
            F.col(user_col),
            F.col(type_col).alias("from_type"),
            F.col(ts_col),
            F.col(tiebreak_col),
        )
        .withColumn("to_type", F.lead("from_type").over(w))
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").cast("long").alias("n_from"))
    return (
        pairs.join(F.broadcast(totals), on="from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            (F.col("n") / F.col("n_from").cast("double")).alias("p"),
        )
    )


def window_funnel(
    events: DataFrame,
    steps: list[str],
    window_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Windowed ordered funnel (the ClickHouse ``windowFunnel`` shape):
    per user, the deepest step sequence completed strictly in order
    within ``window_seconds`` of the ANCHOR (step-1) event — unlike
    the unbounded ordered funnel, a user who converts a week later
    does not count. Returns (user, funnel_level).

    Correctness: per (user, anchor) the chain keeps only the EARLIEST
    next-step event — greedy-earliest maximizes the remaining window,
    so it reaches level L iff any event choice does. Scale: each hop
    is a per-user equi-join whose time predicate bounds fan-out, then
    a (user, anchor) min — partial-agg keyed shuffles; anchors bound
    intermediate cardinality by the step-1 event count.
    """
    w = F.expr(f"INTERVAL {int(window_seconds)} SECONDS")
    anchors = events.filter(F.col(type_col) == steps[0]).select(
        F.col(user_col),
        F.col(ts_col).alias("_t1"),
        F.col(ts_col).alias("_tprev"),
    )
    levels = anchors.select(user_col).distinct().select(
        F.col(user_col), F.lit(1).alias("funnel_level")
    )
    cur = anchors
    for depth, step in enumerate(steps[1:], start=2):
        nxt = events.filter(F.col(type_col) == step).select(
            F.col(user_col), F.col(ts_col).alias("_tn")
        )
        cur = (
            cur.join(nxt, on=user_col)
            .filter(
                (F.col("_tn") > F.col("_tprev"))
                & (F.col("_tn") <= F.col("_t1") + w)
            )
            .groupBy(user_col, "_t1")
            .agg(F.min("_tn").alias("_tprev"))
        )
        levels = levels.unionByName(
            cur.select(user_col)
            .distinct()
            .select(F.col(user_col), F.lit(depth).alias("funnel_level"))
        )
    return levels.groupBy(user_col).agg(
        F.max("funnel_level").alias("funnel_level")
    )
