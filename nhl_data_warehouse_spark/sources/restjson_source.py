"""Custom Python DataSource: parallel REST/JSON document fetch.

The reference extracts API JSON on the Airflow worker — a single
Python process GETs each endpoint and writes a file
(``nhl_api_dag.py:76-106``). Re-expressed Spark-first with the Spark 4
Python Data Source API: each endpoint URL becomes an input partition,
so the *executors* fetch in parallel and the payloads enter the plan
as ordinary rows — no driver bottleneck, no intermediate landing file
needed for the hot path (landing stays available via ``extract.py``
when an audit copy is required).

Scale stance: fetch parallelism == number of URLs; a 10k-endpoint
crawl is 10k tasks scheduled like any other scan. Payload parsing
stays downstream (``F.from_json`` with an explicit schema +
``guard_has_games``), keeping this source schema-stable and the
reference's empty-payload guard (P14) in one place.

Usage::

    spark.dataSource.register(RestJsonDataSource)
    df = (spark.read.format("restjson")
          .option("urls", "file:///fixtures/seasons.json,file:///fixtures/teams.json")
          .load())

Offline by construction in tests: ``file://`` URIs go through the same
``urlopen`` path as ``http(s)://`` ones.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SCHEMA = "url string, payload string, status int, error string"


class _UrlPartition(InputPartition):
    def __init__(self, url: str):
        self.url = url


class RestJsonReader(DataSourceReader):
    def __init__(self, options):
        urls = options.get("urls", "")
        self.urls = [u.strip() for u in urls.split(",") if u.strip()]
        self.timeout = float(options.get("timeout", "10"))

    def partitions(self):
        # one partition per endpoint -> executors fetch in parallel
        return [_UrlPartition(u) for u in self.urls]

    def read(self, partition: _UrlPartition):
        import urllib.error
        import urllib.request

        url = partition.url
        try:
            with urllib.request.urlopen(url, timeout=self.timeout) as resp:
                payload = resp.read().decode("utf-8")
                status = getattr(resp, "status", 200) or 200
            yield (url, payload, status, None)
        except (urllib.error.URLError, OSError, ValueError) as e:
            # failed endpoints become rows, not task failures: one dead
            # URL must not kill a 10k-endpoint crawl; callers filter on
            # `error IS NULL` (and may retry the remainder)
            yield (url, None, None, str(e))


class RestJsonDataSource(DataSource):
    """``spark.read.format("restjson")`` — options: ``urls`` (comma
    separated), ``timeout`` (seconds per request, default 10)."""

    @classmethod
    def name(cls) -> str:
        return "restjson"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> RestJsonReader:
        return RestJsonReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(RestJsonDataSource)
