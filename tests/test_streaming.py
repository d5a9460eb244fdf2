"""Structured Streaming: exactly-once file ingest and stream/batch
agreement for windowed aggregations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nhl_data_warehouse_spark import schemas
from nhl_data_warehouse_spark.streaming.file_ingest import stream_csv_ingest
from nhl_data_warehouse_spark.streaming.windows import sessionize, windowed_event_counts

GAMES_HEADER = (
    "game_date,game_time,visitor,visitor_goals,home,home_goals,ot_so,attendance,length_of_game\n"
)


class TestStreamFileIngest:
    def test_exactly_once_across_restarts(self, spark, tmp_path):
        src = tmp_path / "arrivals"
        src.mkdir()
        target = str(tmp_path / "table")
        ckpt = str(tmp_path / "ckpt")

        (src / "day1.csv").write_text(
            GAMES_HEADER + "2025-01-04,19:00,A,1,B,2,,100,2:30\n"
        )
        stream_csv_ingest(spark, str(src), schemas.RAW_GAMES_CSV, target, ckpt)
        assert spark.read.parquet(target).count() == 1

        # restart with one new file: only the new file is processed
        (src / "day2.csv").write_text(
            GAMES_HEADER
            + "2025-01-05,19:00,C,3,D,4,,200,2:40\n2025-01-06,19:00,E,5,F,6,,300,2:50\n"
        )
        stream_csv_ingest(spark, str(src), schemas.RAW_GAMES_CSV, target, ckpt)
        out = spark.read.parquet(target)
        assert out.count() == 3
        assert out.select("source_file").distinct().count() == 2

        # replay with nothing new: no duplicates (S5/M4 semantics)
        stream_csv_ingest(spark, str(src), schemas.RAW_GAMES_CSV, target, ckpt)
        assert spark.read.parquet(target).count() == 3


class TestWindowedAggs:
    @pytest.fixture(scope="class")
    def events(self, spark):
        rows = [
            (1, "2024-01-01 10:05:00", 7, "click", 1.0),
            (2, "2024-01-01 10:55:00", 7, "click", 2.0),
            (3, "2024-01-01 11:05:00", 7, "view", 4.0),
            (4, "2024-01-01 13:00:00", 8, "click", 8.0),
        ]
        return spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, event_type string, value double"
        ).withColumn("ts", F.to_timestamp("ts"))

    def test_tumbling_window_counts(self, events):
        out = {
            (r.window_start.isoformat(), r.event_type): (r.n_events, r.sum_value)
            for r in windowed_event_counts(events, "1 hour").collect()
        }
        assert out[("2024-01-01T10:00:00", "click")] == (2, 3.0)
        assert out[("2024-01-01T11:00:00", "view")] == (1, 4.0)
        assert out[("2024-01-01T13:00:00", "click")] == (1, 8.0)

    def test_stream_batch_agreement(self, spark, events, tmp_path):
        """The same windowed plan over a file stream (availableNow)
        must produce exactly the batch result — Catalyst semantics are
        shared; only the execution mode differs."""
        src = str(tmp_path / "events_parquet")
        events.write.parquet(src)
        stream = (
            spark.readStream.schema(events.schema).parquet(src)
        )
        # complete output mode emits every window including ones the
        # watermark hasn't closed yet — the right mode for a finite
        # availableNow run compared against batch
        (
            windowed_event_counts(stream, "1 hour", watermark="2 hours", streaming=True)
            .writeStream.format("memory")
            .queryName("win_counts")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        streamed = {
            (r.window_start.isoformat(), r.event_type): (r.n_events, r.sum_value)
            for r in spark.sql("SELECT * FROM win_counts").collect()
        }
        batch = {
            (r.window_start.isoformat(), r.event_type): (r.n_events, r.sum_value)
            for r in windowed_event_counts(events, "1 hour").collect()
        }
        assert streamed == batch

    def test_sessionize_gap_merging(self, events):
        out = sessionize(events, gap="30 minutes").collect()
        by_user = {}
        for r in out:
            by_user.setdefault(r.user_id, []).append(r)
        # user 7: events at 10:05 and 10:55 are 50min apart -> separate
        # sessions; 10:55 and 11:05 merge (10min gap)
        assert len(by_user[7]) == 2
        assert len(by_user[8]) == 1
        merged = max(by_user[7], key=lambda r: r.n_events)
        assert merged.n_events == 2
