"""Event-time streaming operators (beyond-reference, SURVEY.md §2.6/§2.7).

Tumbling-window aggregation with watermarked late-data handling, and
gap-based sessionization via ``session_window`` — the two stateful
shapes a telemetry/training-data stream needs. Each has a batch twin
(same logical result on a static frame) used by the correctness
oracle, since the streaming and batch plans share Catalyst semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    streaming: bool = False,
) -> DataFrame:
    """Tumbling event-time window: count + value sum per
    (window, event_type). On a stream, the watermark bounds state and
    admits late data up to the threshold; on a batch frame the same
    expression is a plain group-by (watermark is a no-op)."""
    src = events.withWatermark("ts", watermark) if streaming else events
    return (
        src.groupBy(F.window("ts", window_duration).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
    streaming: bool = False,
) -> DataFrame:
    """Sliding (hopping) event-time window: each event lands in
    window_duration/slide overlapping windows — the moving-average /
    rate-monitor shape. Same watermark semantics as the tumbling form;
    state scales with the number of open windows per key, i.e.
    duration/slide times the tumbling state."""
    src = events.withWatermark("ts", watermark) if streaming else events
    return (
        src.groupBy(F.window("ts", window_duration, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def dedup_events_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "1 hour",
    time_col: str = "ts",
) -> DataFrame:
    """Streaming exactly-once event dedup: drop rows whose ``keys``
    were already seen, keeping state only within the watermark —
    ``dropDuplicatesWithinWatermark`` bounds the seen-keys state (the
    unbounded-state problem plain dropDuplicates has on a stream).
    The at-least-once -> exactly-once repair every event pipeline
    needs in front of its sinks."""
    keys = keys or ["event_id"]
    return events.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(keys)


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    streaming: bool = False,
) -> DataFrame:
    """Gap-based sessions per user via ``session_window`` — state
    merges windows closer than ``gap``; the canonical stateful
    streaming op (replaces a hand-rolled applyInPandasWithState for
    this shape, which Spark already expresses natively)."""
    src = events.withWatermark("ts", gap) if streaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )
