"""Unit tests for the analytics operator family: gap fill, time-range
rolling windows, Z-order keys, count-min sketch."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from nhl_data_warehouse_spark.operators.layout import z_value, zorder_file_assignment
from nhl_data_warehouse_spark.operators.sketches import countmin_estimates
from nhl_data_warehouse_spark.operators.timeseries import gap_fill, rolling_days


def _d(s: str) -> datetime.date:
    return datetime.date.fromisoformat(s)


class TestGapFill:
    def test_fills_grid_zero_and_ffill(self, spark):
        daily = spark.createDataFrame(
            [
                ("a", _d("2024-01-02"), 3, 30.0),
                ("a", _d("2024-01-04"), 1, 10.0),
                ("b", _d("2024-01-01"), 2, 20.0),
            ],
            "k string, day date, n long, rev double",
        )
        out = gap_fill(
            daily, "k", "day", "2024-01-01", "2024-01-05",
            zero_fill=["n"], ffill=["rev"],
        )
        rows = {(r.k, str(r.day)): r for r in out.collect()}
        assert len(rows) == 10  # 2 keys x 5 days
        # before first observation: zero count, NULL ffill, gap
        r = rows[("a", "2024-01-01")]
        assert (r.n, r.rev_ffill, r.is_gap) == (0, None, 1)
        # observed day keeps its value
        r = rows[("a", "2024-01-02")]
        assert (r.n, r.rev_ffill, r.is_gap) == (3, 30.0, 0)
        # gap after: zero count but forward-filled value
        r = rows[("a", "2024-01-03")]
        assert (r.n, r.rev_ffill, r.is_gap) == (0, 30.0, 1)
        # new observation replaces the fill
        assert rows[("a", "2024-01-04")].rev_ffill == 10.0
        assert rows[("a", "2024-01-05")].rev_ffill == 10.0
        assert rows[("b", "2024-01-03")].rev_ffill == 20.0


class TestRollingDays:
    def test_calendar_gaps_shorten_frame(self, spark):
        daily = spark.createDataFrame(
            [
                ("k", _d("2024-01-01"), 1.0),
                ("k", _d("2024-01-05"), 2.0),
                # 20th is >7 days after both -> frame is just itself
                ("k", _d("2024-01-20"), 4.0),
            ],
            "k string, day date, v double",
        )
        out = {
            str(r.day): (float(r.rolling_7d_sum), r.rolling_7d_n)
            for r in rolling_days(daily, "k", "day", "v", days=7).collect()
        }
        assert out["2024-01-01"] == (1.0, 1)
        assert out["2024-01-05"] == (3.0, 2)  # 1st is within 6 days
        assert out["2024-01-20"] == (4.0, 1)


class TestZOrder:
    def test_z_value_matches_python_interleave(self, spark):
        pts = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535), (12345, 54321)]

        def morton(x, y):
            out = 0
            for i in range(16):
                out |= ((x >> i) & 1) << (2 * i)
                out |= ((y >> i) & 1) << (2 * i + 1)
            return out

        df = spark.createDataFrame(pts, "x long, y long")
        got = {
            (r.x, r.y): r.z
            for r in df.select(
                "x", "y", z_value(F.col("x"), F.col("y")).alias("z")
            ).collect()
        }
        assert got == {(x, y): morton(x, y) for x, y in pts}

    def test_file_assignment_is_total_and_balanced(self, spark):
        df = spark.createDataFrame(
            [(i, i * 7 % 100, i * 13 % 100) for i in range(64)],
            "id long, x long, y long",
        )
        out = zorder_file_assignment(df, "x", "y", "id", n_files=8).collect()
        assert len(out) == 64
        per_file = {}
        for r in out:
            per_file.setdefault(r.file_id, 0)
            per_file[r.file_id] += 1
        assert per_file == {i: 8 for i in range(1, 9)}  # ntile is 1-based


class TestCountMin:
    def test_estimate_at_least_truth_and_usually_exact(self, spark):
        rows = [("apple",)] * 5 + [("pear",)] * 3 + [("plum",)] * 1
        df = spark.createDataFrame(rows, "term string")
        got = {r.term: (r.true_count, r.cms_estimate) for r in
               countmin_estimates(df).collect()}
        assert got["apple"][0] == 5 and got["pear"][0] == 3
        for true, est in got.values():
            assert est >= true
        # depth-4 x 256 buckets over 3 terms: no collision survives all
        # four rows, so the min recovers the exact count
        assert all(est == true for true, est in got.values())
