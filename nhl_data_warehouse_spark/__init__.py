"""nhl_data_warehouse_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query / data-processing capabilities of
the ``RyanSchraeder/nhl_data_warehouse`` ELT warehouse (Airflow +
Snowflake + dbt), re-expressed Spark-first:

- ingestion (``sources/``): CSV/JSON landing-zone loads with file
  metadata + MD5 lineage keys (reference: ``include/sql/copy_into_*.sql``),
  exactly-once semantics via a Structured-Streaming file source or an
  ingest ledger (reference: Snowflake COPY load history + FileSensor).
- transformation (``operators/``): the dbt staging models and mart as
  pure ``DataFrame -> DataFrame`` functions (reference:
  ``dags/nhl_dbt/models/example/``), plus beyond-reference operators a
  large-scale training-data pipeline needs (dedup, similarity search,
  text analysis, multimodal columns).
- materialization (``write.py``): view / incremental keyed append
  (reference: dbt ``incremental`` delete+insert materialization).
- orchestration (``plans/``): a topological model runner with per-stage
  retry (reference: Airflow ``chain(...)`` DAGs + Cosmos DbtDag).

All relational execution is delegated to Spark Catalyst — mirroring how
the reference delegates everything relational to Snowflake.
"""

__version__ = "0.1.0"
