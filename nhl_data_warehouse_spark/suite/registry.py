"""Query registry backing the driver contract."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB-runnable ANSI SQL; None -> rows-only check
    op_ids: str  # SURVEY.md §2 operator ids exercised
    description: str


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, *, oracle: str | None, op_ids: str, description: str):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name, fn, oracle, op_ids, description)
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    """Read the named driver parquet tables.

    ``events.ts`` is TIMESTAMP(NANOS) in parquet, which Spark reads as
    a nanosecond long (``spark.sql.legacy.parquet.nanosAsLong``);
    normalize it to a microsecond timestamp — the same truncation
    DuckDB applies when casting ns to its µs TIMESTAMP, so oracle
    comparisons agree exactly.
    """
    from pyspark.sql import functions as F

    out = []
    for n in names:
        df = spark.read.parquet(f"{sf_dir}/{n}.parquet")
        if n == "events" and dict(df.dtypes).get("ts") == "bigint":
            # integer `div`, NOT `/`: float division of ns-since-epoch
            # longs exceeds double's 2^53 mantissa and loses microseconds
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        out.append(df)
    return out
