"""Extraction layer tests (S1-S4): injectable fetchers, first-table
HTML parsing, the 'games' landing guard, and the scrape -> land ->
typed-load round trip. Never touches the network."""

from __future__ import annotations

import json
import os

import pytest

from nhl_data_warehouse_spark.sources import (
    extract_api_endpoint,
    load_games_csv,
    parse_first_html_table,
    scrape_season_tables,
)

GAMES_HTML = """
<html><body>
<p>noise before the table</p>
<table class="stats">
  <tr><th>game_date</th><th>game_time</th><th>visitor</th><th>visitor_goals</th>
      <th>home</th><th>home_goals</th><th>ot_so</th><th>attendance</th><th>length_of_game</th></tr>
  <tr><td>2025-01-04</td><td>19:00</td><td>Colorado Avalanche</td><td>3</td>
      <td>Dallas Stars</td><td>4</td><td>OT</td><td>18,532</td><td>2:32</td></tr>
  <tr><td>2025-01-05</td><td>19:30</td><td>Winnipeg Jets</td><td>5</td>
      <td>Colorado Avalanche</td><td>2</td><td></td><td>17800</td><td>2:28</td></tr>
</table>
<table><tr><td>second table must be ignored</td></tr></table>
</body></html>
"""

STANDINGS_HTML = """
<table>
  <tr><th>team</th><th>gp</th><th>overall_wins</th></tr>
  <tr><td>Winnipeg Jets</td><td>82</td><td>56</td></tr>
</table>
"""


def test_parse_first_table_only():
    rows = parse_first_html_table(GAMES_HTML)
    assert rows[0][0] == "game_date"
    assert len(rows) == 3  # header + 2 games; second table ignored
    assert rows[1][2] == "Colorado Avalanche"


def test_parse_no_table():
    assert parse_first_html_table("<html><p>nothing</p></html>") == []


def test_scrape_lands_reference_named_csvs(tmp_path, spark):
    pages = {
        "https://www.hockey-reference.com/leagues/NHL_2025_games.html": GAMES_HTML,
        "https://www.hockey-reference.com/leagues/NHL_2025.html": STANDINGS_HTML,
    }
    out = scrape_season_tables(2025, str(tmp_path), fetch=pages.__getitem__)
    assert out["seasons"].endswith("csv/seasons/nhl_2025_output_seasons.csv")
    assert out["teams"].endswith("csv/teams/nhl_2025_output_teams.csv")
    # quoted comma survives CSV round trip ("18,532"), typed load parses it
    games = load_games_csv(spark, os.path.dirname(out["seasons"]))
    rows = {r.visitor: r for r in games.collect()}
    assert rows["Colorado Avalanche"].guests_in_attendance == 18532
    assert rows["Winnipeg Jets"].home_goals == 2


def test_scrape_raises_without_table(tmp_path):
    with pytest.raises(ValueError, match="no <table>"):
        scrape_season_tables(2025, str(tmp_path), fetch=lambda url: "<html/>")


def test_api_guard_skips_empty_schedule(tmp_path):
    docs = {
        "regular_season": {"league": {"alias": "NHL"}},  # no 'games'
        "post_season": {"league": {"alias": "NHL"}, "games": [{"id": "g1"}]},
        "teams": {"league": {"alias": "NHL"}, "teams": []},
    }
    skipped = extract_api_endpoint(
        "regular_season", str(tmp_path), docs.__getitem__, date_tag="20250104"
    )
    assert skipped is None
    landed = extract_api_endpoint(
        "post_season", str(tmp_path), docs.__getitem__, date_tag="20250104"
    )
    assert landed is not None and landed.endswith("json/post_season/post_season_20250104.json")
    assert json.load(open(landed))["games"] == [{"id": "g1"}]
    # non-schedule endpoints have no games guard
    teams = extract_api_endpoint(
        "teams", str(tmp_path), docs.__getitem__, date_tag="20250104"
    )
    assert teams is not None


def test_api_unknown_endpoint(tmp_path):
    with pytest.raises(ValueError, match="unknown endpoint"):
        extract_api_endpoint("players", str(tmp_path), lambda e: {}, date_tag="x")


class TestRestJsonDataSource:
    """Spark 4 Python Data Source: executor-side parallel endpoint fetch."""

    def test_parallel_file_uri_fetch_and_guard(self, spark, tmp_path):
        import json

        from pyspark.sql import functions as F

        from nhl_data_warehouse_spark.sources import restjson_source
        from nhl_data_warehouse_spark.sources.json_source import guard_has_games

        good = tmp_path / "sched.json"
        good.write_text(json.dumps({"games": [{"id": "g1"}], "league": {"alias": "NHL"}}))
        empty = tmp_path / "empty.json"
        empty.write_text(json.dumps({"league": {"alias": "NHL"}}))

        restjson_source.register(spark)
        df = (
            spark.read.format("restjson")
            .option("urls", f"file://{good},file://{empty}")
            .load()
        )
        rows = {r.url.split("/")[-1]: r for r in df.collect()}
        assert rows["sched.json"].payload and rows["sched.json"].error is None
        assert df.rdd.getNumPartitions() == 2  # one fetch task per endpoint

        parsed = df.filter(F.col("error").isNull()).select(
            "url",
            F.from_json(
                "payload", "games array<struct<id:string>>, league struct<alias:string>"
            ).alias("doc"),
        ).select("url", "doc.games", "doc.league")
        kept = guard_has_games(parsed)
        assert [r.url.split("/")[-1] for r in kept.collect()] == ["sched.json"]

    def test_dead_endpoint_becomes_row_not_failure(self, spark, tmp_path):
        from nhl_data_warehouse_spark.sources import restjson_source

        restjson_source.register(spark)
        df = (
            spark.read.format("restjson")
            .option("urls", f"file://{tmp_path}/missing.json")
            .load()
        )
        (row,) = df.collect()
        assert row.payload is None and row.error is not None
