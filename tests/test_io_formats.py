"""Source/sink format coverage: the engine reads and writes every
Spark-native batch format (parquet, ORC, JSON-lines, CSV) with
explicit schemas and value fidelity — the storage surface a drop-in
engine must expose beyond the reference's CSV/JSON landing files."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("when", T.TimestampType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
    ]
)

ROWS = [
    (1, "alpha, with comma", 1.5, datetime.datetime(2024, 1, 1, 10, 0), ["a", "b"]),
    (2, 'quote "inside"', -2.25, datetime.datetime(2024, 6, 1, 23, 59), []),
    (3, None, None, None, None),
]


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def _normalize(rows):
    return sorted(
        (r.id, r.name, r.score, r.when, tuple(r.tags) if r.tags is not None else None)
        for r in rows
    )


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json"])
def test_round_trip_nested_formats(spark, frame, fmt, tmp_path):
    path = str(tmp_path / fmt)
    frame.write.format(fmt).save(path)
    back = spark.read.schema(SCHEMA).format(fmt).load(path)
    assert _normalize(back.collect()) == _normalize(frame.collect())


def test_round_trip_csv_scalar_columns(spark, frame, tmp_path):
    # CSV has no array type; round-trip the scalar projection with
    # explicit schema, quoting, and timestamps
    path = str(tmp_path / "csv")
    scalar = frame.select("id", "name", "score", "when")
    scalar.write.option("header", "true").csv(path)
    back = spark.read.schema(
        "id long, name string, score double, `when` timestamp"
    ).option("header", "true").csv(path)
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in scalar.collect()
    )


def test_text_wholefile_source(spark, tmp_path):
    # the raw_json retention path: whole-document text reads
    p = tmp_path / "docs"
    p.mkdir()
    (p / "a.json").write_text('{"x": 1}\n{"y": 2}')
    df = spark.read.text(str(p), wholetext=True)
    assert df.count() == 1
    assert df.first().value == '{"x": 1}\n{"y": 2}'
