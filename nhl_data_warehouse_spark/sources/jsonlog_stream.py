"""Custom Python STREAMING DataSource: append-only JSON-lines replay.

The batch twin (``restjson_source.py``) showed the Spark 4 Python
DataSource API for reads; this is the streaming half
(``DataSourceStreamReader``): a directory of append-only chunk files
(``*.jsonl``, lexicographically ordered — the layout a log shipper or
CDC tailer produces) becomes a structured stream with REAL offset
semantics:

- offset = {"index": n} — how many chunk files (in sorted order) have
  been ingested. JSON-serializable, checkpointed by the engine.
- ``latestOffset`` lists the directory; new files extend the offset.
- ``partitions(start, end)`` -> one InputPartition per new chunk, so
  a micro-batch with 50 new chunks reads them on 50 executor slots in
  parallel (executors read the files, not the driver).
- exactly-once: on restart the checkpointed offset replays precisely
  the uncommitted chunks — tested in
  ``tests/test_streaming.py::TestJsonlogStreamSource``.

Scale stance: the driver only ever LISTS the directory (cheap against
an object store's sorted key listing); file bytes move straight from
storage to executors. Chunks-as-offsets assumes append-only sorted
naming (chunk-000001...), which is exactly the contract of log
rotation / CDC sinks this source models.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

SCHEMA = "chunk_file string, line_no int, value string"


class _ChunkPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _sorted_chunks(path: str) -> list[str]:
    try:
        names = [n for n in os.listdir(path) if n.endswith(".jsonl")]
    except FileNotFoundError:
        return []
    return sorted(names)


class JsonlogStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonlog source requires option 'path'")

    def initialOffset(self):
        return {"index": 0}

    def latestOffset(self):
        return {"index": len(_sorted_chunks(self.path))}

    def partitions(self, start, end):
        chunks = _sorted_chunks(self.path)
        return [
            _ChunkPartition(os.path.join(self.path, name))
            for name in chunks[start["index"] : end["index"]]
        ]

    def read(self, partition: _ChunkPartition):
        with open(partition.path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                line = line.rstrip("\n")
                if line:
                    yield (os.path.basename(partition.path), i, line)

    def commit(self, end):
        # chunks are immutable once written; nothing to clean up
        pass


class JsonlogDataSource(DataSource):
    """``spark.readStream.format("jsonlog").option("path", dir)``."""

    @classmethod
    def name(cls):
        return "jsonlog"

    def schema(self):
        return SCHEMA

    def streamReader(self, schema):
        return JsonlogStreamReader(self.options)


def parsed_stream(spark, path: str, value_schema: str):
    """Register + open the stream and parse ``value`` with an explicit
    schema — the P12 pattern applied to the streaming source."""
    from pyspark.sql import functions as F

    spark.dataSource.register(JsonlogDataSource)
    raw = spark.readStream.format("jsonlog").option("path", path).load()
    return raw.select(
        "chunk_file",
        "line_no",
        F.from_json("value", value_schema).alias("rec"),
    ).select("chunk_file", "line_no", "rec.*")


__all__ = ["JsonlogDataSource", "JsonlogStreamReader", "parsed_stream", "SCHEMA"]
