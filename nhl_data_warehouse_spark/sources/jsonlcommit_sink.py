"""Custom Python DataSource WRITER: a transactional JSONL sink with
two-phase commit on a plain filesystem.

The reference's load step hands Snowflake a COPY and gets transactional
all-or-nothing semantics for free; Spark's own file sink commits via
the Hadoop committer. This sink re-expresses the same guarantee on the
Spark 4 Python Data Source WRITE API (the writer-side sibling of
``restjson_source.py``'s reader), which is the right escape hatch when
the target is a system Spark has no connector for (an internal REST
ingest API, a bespoke ledger, a message bus):

- each task streams its rows to a STAGED file
  (``_staged-<uuid>.jsonl``) and returns a commit message naming it;
- ``commit`` runs on the driver only after every task succeeded and
  atomically publishes a ``_MANIFEST`` listing exactly the staged
  files of this job (write temp + ``os.replace``, atomic on POSIX);
- ``abort`` deletes this job's staged files and never touches the
  manifest, so readers (``read_committed``) see the previous
  committed state — a failed job is invisible.

Exactly-once stance: at-least-once task attempts are repaired at
commit time (only files named in commit messages are published;
orphaned staged files from failed attempts are swept), which is the
same speculative-attempt contract as Spark's V2 file committer.

Scale: one staged file per task — write parallelism is the input's
partitioning, the driver handles only O(tasks) filenames; the
manifest is the unit of atomicity exactly like a lake-table commit
log (Delta/Iceberg compress this same idea into versioned logs).

Usage::

    from nhl_data_warehouse_spark.sources import jsonlcommit_sink
    jsonlcommit_sink.register(spark)
    df.write.format("jsonlcommit").mode("append").save("/path/dir")
    back = jsonlcommit_sink.read_committed(spark, "/path/dir", schema)
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)

MANIFEST = "_MANIFEST"


class _Committed(WriterCommitMessage):
    def __init__(self, filename: str, n_rows: int):
        self.filename = filename
        self.n_rows = n_rows


class JsonlCommitWriter(DataSourceWriter):
    """Requires ``path`` on a filesystem all executors and the driver
    share (HDFS/NFS mount/fuse — the same assumption every Hadoop
    path carries). The job nonce is drawn on the driver and pickled
    to every task, so concurrent jobs to one directory stage and
    sweep only their own files (manifest publish is last-writer-wins,
    like any non-versioned table commit)."""

    def __init__(self, options, schema, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonlcommit: a save path is required")
        self.fields = [f.name for f in schema.fields]
        self.overwrite = overwrite
        self.job = uuid.uuid4().hex  # driver-side; shared by all tasks

    # -- executor side ---------------------------------------------------
    def write(self, iterator) -> _Committed:
        os.makedirs(self.path, exist_ok=True)
        name = f"_staged-{self.job}-{uuid.uuid4().hex}.jsonl"
        full = os.path.join(self.path, name)
        n = 0
        with open(full, "w", encoding="utf-8") as f:
            for row in iterator:
                rec = {k: row[i] for i, k in enumerate(self.fields)}
                f.write(json.dumps(rec, default=str, sort_keys=True) + "\n")
                n += 1
        return _Committed(name, n)

    # -- driver side -----------------------------------------------------
    def commit(self, messages) -> None:
        # promote staged files to visible part names (underscore
        # prefixes are HIDDEN to Spark/Hadoop readers — which is
        # exactly why staging uses one: an uncommitted file can never
        # leak into a directory-level read). Each rename is atomic;
        # readers go through the manifest, so a crash mid-promotion
        # leaves unreferenced part files (vacuum-able garbage), never
        # a partial result.
        published, total = [], 0
        for i, m in enumerate(sorted(messages, key=lambda m: m.filename)):
            final = f"part-{self.job}-{i:05d}.jsonl"
            os.replace(
                os.path.join(self.path, m.filename),
                os.path.join(self.path, final),
            )
            published.append(final)
            total += m.n_rows
        # append merges with the previously committed state; overwrite
        # replaces it (the replaced part files become vacuum-able
        # garbage, same as a lake table's unreferenced files)
        prior_files, prior_rows = [], 0
        manifest_path = os.path.join(self.path, MANIFEST)
        if not self.overwrite and os.path.exists(manifest_path):
            with open(manifest_path, encoding="utf-8") as f:
                prior = json.load(f)
            prior_files, prior_rows = prior["files"], prior["n_rows"]
        manifest = {
            "files": prior_files + published,
            "n_rows": prior_rows + total,
        }
        tmp = os.path.join(self.path, f"{MANIFEST}.tmp-{uuid.uuid4().hex}")
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(manifest, f, sort_keys=True)
        # atomic publish: readers see the old manifest or the new one,
        # never a partial file
        os.replace(tmp, manifest_path)
        # sweep THIS JOB's leftover staged files (failed/speculative
        # task attempts) — garbage once the manifest is out; other
        # jobs' staged files are theirs to publish or abort
        for name in os.listdir(self.path):
            if name.startswith(f"_staged-{self.job}-"):
                os.remove(os.path.join(self.path, name))

    def abort(self, messages) -> None:
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.filename))
            except OSError:
                pass


class JsonlCommitDataSource(DataSource):
    """``df.write.format("jsonlcommit").save(path)`` — transactional
    JSONL directory sink (see module docstring)."""

    @classmethod
    def name(cls) -> str:
        return "jsonlcommit"

    def writer(self, schema, overwrite: bool) -> JsonlCommitWriter:
        return JsonlCommitWriter(self.options, schema, overwrite)


def register(spark: SparkSession) -> None:
    spark.dataSource.register(JsonlCommitDataSource)


def read_committed(spark: SparkSession, path: str, schema) -> DataFrame:
    """Read back exactly the committed state: the files named in the
    manifest, nothing else (staged files from in-flight or failed
    jobs are invisible). Raises FileNotFoundError when no commit has
    ever succeeded."""
    with open(os.path.join(path, MANIFEST), encoding="utf-8") as f:
        manifest = json.load(f)
    files = [os.path.join(path, name) for name in manifest["files"]]
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)
