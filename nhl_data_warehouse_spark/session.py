"""SparkSession factory tuned for this engine.

Local-mode testing runs on ``local[N]``; the configs below are the ones
that also matter on a real multi-executor cluster (AQE, shuffle
partition sizing, Arrow for the pandas-UDF slow path). Session
timezone is pinned to UTC so timestamp semantics match the DuckDB
oracle and are cluster-location-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "nhl_data_warehouse_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    - AQE on: runtime partition coalescing, skew-join splitting, and
      broadcast conversion — the knobs that keep a fixed plan healthy
      when data grows 100x.
    - ``spark.sql.shuffle.partitions`` defaults to cores in local mode
      (not 200); on a real cluster callers pass ~2-3x total cores.
    - Arrow enabled for the few pandas-UDF operators (similarity /
      multimodal); everything else stays JVM-side.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # testdata events.parquet carries TIMESTAMP(NANOS); Spark has no
        # nanos timestamp — read as long, normalized in suite loading
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        # Long-running-driver hygiene: the app status store retains
        # up to 1000 SQL executions (full plan-description strings +
        # per-node metrics) even with the UI off. Wide plans here (LSH
        # explode chains, AQE re-plans) make those strings MB-sized, so
        # an unbounded store degrades a driver that serves hundreds of
        # queries per session. Keep only a short recent window.
        .config("spark.ui.retainedJobs", "50")
        .config("spark.ui.retainedStages", "50")
        .config("spark.ui.retainedTasks", "500")
        .config("spark.sql.ui.retainedExecutions", "8")
        .config("spark.worker.ui.retainedExecutors", "10")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def release_cached(spark: SparkSession) -> None:
    """Drop every cached block the last query pinned.

    Several operators ``persist()`` an intermediate their plan reads
    more than once (LSH bands, capped shingles, oriented edge lists,
    tokenized corpora). The operators return LAZY DataFrames, so they
    cannot unpersist before the caller has run its action — instead
    the caller contract is: a long-lived session serving many queries
    calls ``release_cached(spark)`` between them (as ``bench.py`` and
    ``tools/check_oracle.py`` do). Covers both catalog-cached plans
    and directly-persisted RDD blocks (``localCheckpoint`` output
    from connected components / packing is NOT in the catalog and
    leaks without the RDD sweep).
    """
    spark.catalog.clearCache()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist(False)


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None):
    """Read the driver's parquet tables and register temp views.

    Returns ``{name: DataFrame}``. Registering views lets operators be
    written in either DataFrame or SQL form against the same catalog
    names the DuckDB oracle uses.
    """
    names = names or (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    )
    from nhl_data_warehouse_spark.suite.registry import normalize_timestamps

    out = {}
    for name in names:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        df = normalize_timestamps(df, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
