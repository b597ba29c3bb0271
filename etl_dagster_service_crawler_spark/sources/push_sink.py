"""Custom PySpark DataSource WRITER: an exactly-once 'push' sink.

The reference pushes crawl results into an external store (the jobs.db
table its users query, reference README.md:64-69; save_to_json,
test.py:93-128 — a read-merge-rewrite with no crash safety). The
Spark-first shape is a DataSource writer with the two-phase commit
protocol:

- each task writes its partition to a UNIQUE temp file and returns the
  path in its WriterCommitMessage — nothing is visible yet;
- commit() on the driver renames all temp files into the target
  directory in one pass — a failed/straggling task's output is never
  half-published, and task retries can't double-publish (the rename
  set comes only from the commit messages of the SUCCEEDING attempt);
- abort() removes the temp files.

This is the same protocol Spark's file sinks use, here exposed so the
transport can be swapped for an API/queue push (send batches in
write(), make them visible in commit()) — the production shape of the
reference's push, with the crash-safety its save_to_json lacks.
JSON-lines on disk keeps CI hermetic and the sink oracle-checkable.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage


@dataclass
class _PushCommit(WriterCommitMessage):
    tmp_path: str
    n_rows: int


class PushDataSourceWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("crawlpush sink requires option('path', ...)")
        self.staging = os.path.join(self.path, "_staging")

    def write(self, rows: Iterator) -> _PushCommit:
        os.makedirs(self.staging, exist_ok=True)
        tmp = os.path.join(self.staging, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w", encoding="utf-8") as f:
            for row in rows:
                f.write(json.dumps(row.asDict(), ensure_ascii=False) + "\n")
                n += 1
        return _PushCommit(tmp_path=tmp, n_rows=n)

    def commit(self, messages) -> None:
        os.makedirs(self.path, exist_ok=True)
        for i, m in enumerate(messages):
            if m is None:
                continue
            final = os.path.join(self.path, f"part-{i:05d}.jsonl")
            os.replace(m.tmp_path, final)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class PushDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "crawlpush"

    def writer(self, schema, overwrite: bool) -> PushDataSourceWriter:
        return PushDataSourceWriter(self.options)


def register(spark) -> None:
    spark.dataSource.register(PushDataSource)
