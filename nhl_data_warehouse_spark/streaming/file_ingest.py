"""Streaming file ingestion — sensor + exactly-once load (S5/S6/M4).

Reference: ``FileSensor`` polls for extract files
(``nhl_api_dag.py:179-193``) and Snowflake COPY load history prevents
re-loading a file. In Spark both collapse into the Structured
Streaming file source: new-file detection is the source's listing,
exactly-once is the checkpoint, and ``Trigger.AvailableNow`` gives
batch-style "process everything that has arrived, then stop" runs —
the same daily-batch cadence the reference schedules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def stream_csv_ingest(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    target_table_path: str,
    checkpoint_dir: str,
) -> None:
    """Incrementally load CSV files arriving in ``source_dir`` into a
    parquet table, each file exactly once across restarts.

    Audit columns mirror the batch path (S8): ``updated_at``,
    ``source_file``, ``unique_key = md5(file || payload)``.
    """
    payload = F.concat_ws(
        "|", *[F.coalesce(F.col(f.name).cast("string"), F.lit("")) for f in schema.fields]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("header", "true")
        .option("pathGlobFilter", "*.csv")
        .csv(source_dir)
        .select(
            "*",
            F.current_timestamp().alias("updated_at"),
            F.col("_metadata.file_name").alias("source_file"),
        )
        .withColumn("unique_key", F.md5(F.concat(F.col("source_file"), payload)))
    )
    (
        stream.writeStream.format("parquet")
        .option("path", target_table_path)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
