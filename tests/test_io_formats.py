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


class TestJsonlCommitSink:
    """Transactional Python DataSource writer: staged files are hidden
    until the driver's manifest commit; aborts leave the previous
    committed state untouched."""

    def test_commit_roundtrip_and_append(self, spark, tmp_path):
        from nhl_data_warehouse_spark.sources import jsonlcommit_sink

        jsonlcommit_sink.register(spark)
        out = str(tmp_path / "sink")
        schema = "k long, s string, cents long"
        df1 = spark.createDataFrame([(1, "a", 100), (2, "b", 250)], schema)
        df1.write.format("jsonlcommit").mode("append").save(out)
        back = jsonlcommit_sink.read_committed(spark, out, schema)
        assert {(r.k, r.s, r.cents) for r in back.collect()} == {
            (1, "a", 100),
            (2, "b", 250),
        }
        # append merges with the prior manifest
        spark.createDataFrame([(3, "c", 5)], schema).write.format(
            "jsonlcommit"
        ).mode("append").save(out)
        back2 = jsonlcommit_sink.read_committed(spark, out, schema)
        assert back2.count() == 3
        # overwrite replaces the committed state
        spark.createDataFrame([(9, "z", 1)], schema).write.format(
            "jsonlcommit"
        ).mode("overwrite").save(out)
        back3 = jsonlcommit_sink.read_committed(spark, out, schema)
        assert [(r.k, r.s, r.cents) for r in back3.collect()] == [(9, "z", 1)]

    def test_failed_job_leaves_no_commit(self, spark, tmp_path):
        import os

        from pyspark.sql import functions as F

        from nhl_data_warehouse_spark.sources import jsonlcommit_sink

        jsonlcommit_sink.register(spark)
        out = str(tmp_path / "sink")
        schema = "k long, s string, cents long"
        # a row whose computed column raises at write time (ANSI
        # division by zero) fails the job after other tasks staged
        bad = spark.createDataFrame(
            [(1, "a", 100), (2, "b", 0)], schema
        ).withColumn("cents", F.lit(100) / F.col("cents"))
        with pytest.raises(Exception, match="DIVIDE_BY_ZERO|failed|abort"):
            bad.write.format("jsonlcommit").mode("append").save(out)
        # no manifest -> no committed state, and nothing visible
        with pytest.raises(FileNotFoundError):
            jsonlcommit_sink.read_committed(spark, out, schema)
        if os.path.isdir(out):
            assert not [n for n in os.listdir(out) if n.startswith("part-")]

    def test_failed_job_preserves_previous_commit(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from nhl_data_warehouse_spark.sources import jsonlcommit_sink

        jsonlcommit_sink.register(spark)
        out = str(tmp_path / "sink")
        schema = "k long, s string, cents long"
        spark.createDataFrame([(1, "a", 100)], schema).write.format(
            "jsonlcommit"
        ).mode("append").save(out)
        bad = spark.createDataFrame([(2, "b", 0)], schema).withColumn(
            "cents", F.lit(1) / F.col("cents")
        )
        with pytest.raises(Exception):
            bad.write.format("jsonlcommit").mode("append").save(out)
        back = jsonlcommit_sink.read_committed(spark, out, schema)
        assert [(r.k, r.s, r.cents) for r in back.collect()] == [(1, "a", 100)]
