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
        if name in REGISTRY:
            # silent overwrite shrank the registry twice in round 12
            # (duplicate Benford / Count-Min implementations, caught
            # only by hand — VERDICT r12 item 2): a name collision
            # must fail the import, not drop a query
            raise ValueError(
                f"duplicate query registration: {name!r} is already "
                "registered — pick a distinct name (register() never "
                "overwrites; see duplicate-query-prevention notes)"
            )
        REGISTRY[name] = QuerySpec(name, fn, oracle, op_ids, description)
        return fn

    return deco


def normalize_timestamps(df: DataFrame, table: str | None = None) -> DataFrame:
    """Normalize driver-shaped timestamp encodings to plain TIMESTAMP.

    Two parquet shapes occur in the wild:

    - TIMESTAMP(NANOS), which Spark reads as a nanosecond long under
      ``spark.sql.legacy.parquet.nanosAsLong`` (``events.ts`` only);
      truncate ns→µs exactly like DuckDB's cast to its µs TIMESTAMP.
    - TIMESTAMP(MICROS) with isAdjustedToUTC=false, which Spark reads
      as TIMESTAMP_NTZ. The session timezone is pinned UTC, so casting
      to TIMESTAMP is a pure re-tagging — no instant shift — and it
      restores compatibility with ``unix_micros``/``window`` etc.
    """
    from pyspark.sql import functions as F

    if table == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer `div`, NOT `/`: float division of ns-since-epoch
        # longs exceeds double's 2^53 mantissa and loses microseconds
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    """Read the named driver parquet tables, timestamps normalized.

    The session timezone is pinned to UTC here because the external
    driver owns the SparkSession: every oracle (and the TIMESTAMP_NTZ
    -> TIMESTAMP re-tagging above) assumes UTC wall clocks, and a
    non-UTC caller session would shift `window()` / hour-truncation
    boundaries (half-hour offsets shift them by 30 minutes). Runtime
    conf — takes effect for all subsequent query planning.
    """
    pin_session_defaults(spark)
    return [
        normalize_timestamps(spark.read.parquet(f"{sf_dir}/{n}.parquet"), n)
        for n in names
    ]


def pin_session_defaults(spark: SparkSession) -> None:
    """Pin the caller session's semantics the suite depends on — also
    called by queries that read the testdata outside ``load`` (the
    streaming executions)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        # lets a caller session read TIMESTAMP(NANOS) parquet (the
        # round-1 testdata shape) as a long we then normalize; without
        # it the scan itself throws before normalization can run
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # noqa: BLE001 — static conf on some builds
        pass
