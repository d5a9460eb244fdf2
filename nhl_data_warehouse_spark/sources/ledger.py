"""Ingest ledger — batch exactly-once file loads (S5/M4).

The reference gets load-once-per-file from Snowflake COPY load history
plus an Airflow ``FileSensor`` (``nhl_api_dag.py:179-193``). The
streaming path (``streaming/file_ingest.py``) gets this from the file
source checkpoint; for plain batch loads this ledger records processed
``source_file`` names and anti-joins new reads against them.

At scale the ledger is tiny (one row per file ever loaded) and the
anti-join broadcasts — no shuffle of the data side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class IngestLedger:
    """Parquet-backed set of already-loaded file names."""

    SCHEMA = T.StructType(
        [
            T.StructField("source_file", T.StringType(), False),
            T.StructField("loaded_at", T.TimestampType()),
        ]
    )

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def seen(self) -> DataFrame:
        if not os.path.exists(self.path):
            return self.spark.createDataFrame([], self.SCHEMA)
        return self.spark.read.schema(self.SCHEMA).parquet(self.path)

    def filter_new(self, df: DataFrame) -> DataFrame:
        """Keep only rows from files not yet in the ledger.

        ``left_anti`` on the broadcast ledger — null-safe, scalable
        (SURVEY.md §2.3 J3 note on NOT IN vs anti-join).
        """
        return df.join(
            F.broadcast(self.seen().select("source_file")),
            on="source_file",
            how="left_anti",
        )

    def record(self, df: DataFrame) -> None:
        """Append this batch's distinct file names to the ledger."""
        (
            df.select("source_file")
            .distinct()
            .withColumn("loaded_at", F.current_timestamp())
            .write.mode("append")
            .parquet(self.path)
        )
