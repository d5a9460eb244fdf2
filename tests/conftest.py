"""Shared fixtures: one local SparkSession + NHL-shaped dirty inputs.

Fixture data reconstructs FIXTURES.md F1-F5: quoted/dirty games CSV,
standings CSV with interleaved division-header rows, nested JSON
documents for teams/seasons/schedules (REG + PST + an empty payload).
Tests never touch the network (SURVEY.md §7.4.6).
"""

from __future__ import annotations

import json
import os

import pytest

os.environ.setdefault("SPARK_DRIVER_MEMORY", "4g")


@pytest.fixture(scope="session")
def spark():
    from nhl_data_warehouse_spark.session import get_spark

    spark = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield spark
    spark.stop()


GAMES_CSV = """game_date,game_time,visitor,visitor_goals,home,home_goals,ot_so,attendance,length_of_game
2025-01-04,19:00,Colorado Avalanche,"3",Dallas Stars,4,OT,"18532",2:32
2025-01-05, 19:30 ,Winnipeg Jets,5,Colorado Avalanche,2,,17800,2:28
2025-01-06,20:00,Dallas Stars,1,Winnipeg Jets,2,SO,15321,2:47
2025-01-07,18:00,Chicago Blackhawks,,Dallas Stars,,,0,
"""

TEAM_STATS_CSV = """team,gp,overall_wins,overall_losses,overtime_losses,total_points,points_percentage,goals_for,goals_against,hockey_reference_srs,strength_of_schedule,points_percentage_in_regulation,wins_in_regulation,regulation_record
Central Division,Central Division,Central Division,Central Division,Central Division,Central Division,Central Division,Central Division,Central Division,Central Division,Central Division,Central Division,Central Division,Central Division
Winnipeg Jets,82,56,22,4,116,.707,273,191,0.95,-0.05,.628,46,46-22-14
Dallas Stars,82,50,26,6,106,.646,252,224,0.30,-0.02,.600,45,45-26-11
Colorado Avalanche,82,49,29,4,102,.622,261,226,0.25,-0.01,.580,43,43-29-10
atlantic division,atlantic division,atlantic division,atlantic division,atlantic division,atlantic division,atlantic division,atlantic division,atlantic division,atlantic division,atlantic division,atlantic division,atlantic division,atlantic division
"""

TEAMS_JSON = {
    "league": {"id": "fd560107", "alias": "NHL", "name": "National Hockey League"},
    "teams": [
        {"id": "t-col", "name": "Avalanche", "market": "Colorado", "alias": "COL", "sr_id": "sr:team:3683", "reference": "21"},
        {"id": "t-dal", "name": "Stars", "market": "Dallas", "alias": "DAL", "sr_id": "sr:team:3684", "reference": "25"},
        {"id": "t-wpg", "name": "Jets", "market": "Winnipeg", "alias": "WPG", "reference": "28"},
    ],
}

SEASONS_JSON = {
    "league": {"id": "fd560107", "alias": "NHL", "name": "National Hockey League"},
    "seasons": [
        {"id": "s-2024-REG", "year": 2024, "type": {"code": "REG"}, "status": "closed"},
        {"id": "s-2024-PST", "year": 2024, "type": {"code": "PST"}, "status": "closed"},
    ],
}


def _schedule_doc(season_type: str, with_games: bool = True) -> dict:
    doc = {
        "league": {"id": "fd560107", "alias": "NHL", "name": "National Hockey League"},
        "season": {"id": f"s-2024-{season_type}", "year": 2024, "type": season_type},
    }
    if with_games:
        doc["games"] = [
            {
                "id": f"g-{season_type}-001",
                "status": "closed",
                "scheduled": "2025-01-04T00:00:00Z",
                "home": {"id": "t-dal", "name": "Stars", "alias": "DAL"},
                "away": {"id": "t-col", "name": "Avalanche", "alias": "COL"},
                "home_points": 4,
                "away_points": 3,
                "venue": {"name": "American Airlines Center", "city": "Dallas"},
            },
            {
                "id": f"g-{season_type}-002",
                "status": "closed",
                "scheduled": "2025-01-05T00:30:00Z",
                "home": {"id": "t-col", "name": "Avalanche", "alias": "COL"},
                "away": {"id": "t-wpg", "name": "Jets", "alias": "WPG"},
                "home_points": 2,
                "away_points": 5,
                "venue": {"name": "Ball Arena", "city": "Denver"},
            },
        ]
    return doc


@pytest.fixture(scope="session")
def landing_dir(tmp_path_factory) -> str:
    """A landing zone laid out like the reference's S3 prefixes
    (csv/seasons, csv/teams, json/...; SURVEY.md §1.1)."""
    root = tmp_path_factory.mktemp("landing")
    (root / "csv" / "seasons").mkdir(parents=True)
    (root / "csv" / "teams").mkdir(parents=True)
    for sub in ("seasons", "teams", "regular_season", "post_season"):
        (root / "json" / sub).mkdir(parents=True)

    (root / "csv" / "seasons" / "nhl_2025_output_seasons.csv").write_text(GAMES_CSV)
    (root / "csv" / "teams" / "nhl_2025_output_teams.csv").write_text(TEAM_STATS_CSV)
    (root / "json" / "teams" / "teams_2024.json").write_text(json.dumps(TEAMS_JSON, indent=4))
    (root / "json" / "seasons" / "seasons_2024.json").write_text(json.dumps(SEASONS_JSON, indent=4))
    (root / "json" / "regular_season" / "reg_2024.json").write_text(
        json.dumps(_schedule_doc("REG"), indent=4)
    )
    # empty-payload doc exercises the 'games' guard (nhl_api_dag.py:97-98)
    (root / "json" / "regular_season" / "reg_2024_empty.json").write_text(
        json.dumps(_schedule_doc("REG", with_games=False), indent=4)
    )
    (root / "json" / "post_season" / "pst_2024.json").write_text(
        json.dumps(_schedule_doc("PST"), indent=4)
    )
    return str(root)
