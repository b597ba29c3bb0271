"""Custom PySpark DataSource WRITER: an exactly-once 'push' sink.

The reference pushes crawl results into an external store (the jobs.db
table its users query, reference README.md:64-69; save_to_json,
test.py:93-128 — a read-merge-rewrite with no crash safety). The
Spark-first shape is a DataSource writer with the two-phase commit
protocol:

- each task writes its partition to a UNIQUE temp file under a
  per-commit staging directory and returns the path in its
  WriterCommitMessage — nothing is visible yet;
- commit() on the driver renames the temp files of SUCCEEDING attempts
  into the target directory (task retries can't double-publish), then
  writes a `_manifest-<commit>.json` listing them as the LAST step.
  The manifest write is a single atomic rename, so batch visibility is
  all-or-nothing: a reader that keys on manifests (read_committed)
  never observes a half-renamed batch. Finally the commit's staging
  directory is swept, so failed-attempt temp files don't leak;
- abort() removes the whole staging directory — no published output.

Concurrent/append safety: every commit namespaces its data files with
its own commit id (part-<commit>-NNNNN.jsonl), so a second append job
adds files instead of silently overwriting the first commit's
deterministic names. mode('overwrite') is honored explicitly: the
commit first deletes every file recorded in prior manifests (and the
manifests themselves), then publishes — readers switch from the old
commit set to the new one at the manifest rename.

This is the same protocol Spark's file sinks use (manifest ≙ the
_SUCCESS/_spark_metadata marker), here exposed so the transport can be
swapped for an API/queue push (send batches in write(), make them
visible in commit()). JSON-lines on disk keeps CI hermetic and the
sink oracle-checkable.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage

MANIFEST_PREFIX = "_manifest-"


@dataclass
class _PushCommit(WriterCommitMessage):
    tmp_path: str
    n_rows: int


def manifest_files(path: str) -> list[str]:
    """Data files recorded by committed manifests, relative to path."""
    if not os.path.isdir(path):
        return []
    files: list[str] = []
    for name in sorted(os.listdir(path)):
        if name.startswith(MANIFEST_PREFIX) and name.endswith(".json"):
            with open(os.path.join(path, name), encoding="utf-8") as f:
                files.extend(json.load(f)["files"])
    return files


def read_committed(spark, path: str, schema: str):
    """Read ONLY manifest-committed files — the reader side of the
    atomic-visibility contract (a plain spark.read.json(path) also
    works, but can observe a commit mid-rename)."""
    names = manifest_files(path)
    if not names:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json([os.path.join(path, n) for n in names])


class PushDataSourceWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool = False):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("crawlpush sink requires option('path', ...)")
        self.overwrite = overwrite
        # one id per write job: tasks inherit it through pickling, so
        # every attempt stages under this commit's own directory and
        # every published file carries the commit's namespace
        self.commit_id = uuid.uuid4().hex[:12]
        self.staging = os.path.join(self.path, "_staging", self.commit_id)

    def write(self, rows: Iterator) -> _PushCommit:
        os.makedirs(self.staging, exist_ok=True)
        tmp = os.path.join(self.staging, f"attempt-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w", encoding="utf-8") as f:
            for row in rows:
                f.write(json.dumps(row.asDict(), ensure_ascii=False) + "\n")
                n += 1
        return _PushCommit(tmp_path=tmp, n_rows=n)

    def commit(self, messages) -> None:
        os.makedirs(self.path, exist_ok=True)
        if self.overwrite:
            # retract prior commits first: drop their data files and
            # manifests so the new manifest is the only committed state
            for name in manifest_files(self.path):
                p = os.path.join(self.path, name)
                if os.path.exists(p):
                    os.remove(p)
            for name in os.listdir(self.path):
                if name.startswith(MANIFEST_PREFIX):
                    os.remove(os.path.join(self.path, name))
        published: list[str] = []
        n_rows = 0
        for i, m in enumerate(messages):
            if m is None:
                continue
            final = f"part-{self.commit_id}-{i:05d}.jsonl"
            os.replace(m.tmp_path, os.path.join(self.path, final))
            published.append(final)
            n_rows += m.n_rows
        # manifest LAST, via atomic rename: visibility of the whole
        # batch flips in one filesystem operation
        manifest = {"commit": self.commit_id, "files": published, "rows": n_rows}
        tmp_manifest = os.path.join(self.staging, "manifest.json")
        os.makedirs(self.staging, exist_ok=True)
        with open(tmp_manifest, "w", encoding="utf-8") as f:
            json.dump(manifest, f)
        os.replace(
            tmp_manifest,
            os.path.join(self.path, f"{MANIFEST_PREFIX}{self.commit_id}.json"),
        )
        # sweep THIS commit's staging (leftover failed-attempt files);
        # other commits' staging dirs are untouched
        shutil.rmtree(self.staging, ignore_errors=True)

    def abort(self, messages) -> None:
        shutil.rmtree(self.staging, ignore_errors=True)


class PushDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "crawlpush"

    def writer(self, schema, overwrite: bool) -> PushDataSourceWriter:
        return PushDataSourceWriter(self.options, overwrite=overwrite)


def register(spark) -> None:
    spark.dataSource.register(PushDataSource)
