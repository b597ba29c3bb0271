"""Two-phase commit protocol of the custom push sink
(sources/push_sink.py): staged writes are invisible until commit;
abort leaves no published output."""

from __future__ import annotations

import json
import os

from etl_dagster_service_crawler_spark.sources.push_sink import (
    PushDataSourceWriter,
    _PushCommit,
)


class _Row:
    def __init__(self, **kw):
        self._kw = kw

    def asDict(self):  # noqa: N802 - mirrors pyspark Row
        return dict(self._kw)


def _writer(tmp_path):
    return PushDataSourceWriter({"path": str(tmp_path / "out")})


def _published(tmp_path):
    out = tmp_path / "out"
    if not out.exists():
        return []
    return sorted(p.name for p in out.iterdir() if p.name.endswith(".jsonl"))


def test_write_stages_but_publishes_nothing(tmp_path):
    w = _writer(tmp_path)
    msg = w.write(iter([_Row(a=1), _Row(a=2)]))
    assert msg.n_rows == 2
    assert os.path.exists(msg.tmp_path)
    assert _published(tmp_path) == []  # nothing visible pre-commit


def test_commit_publishes_all_partitions_atomically(tmp_path):
    w = _writer(tmp_path)
    msgs = [w.write(iter([_Row(a=i)])) for i in range(3)]
    w.commit(msgs)
    files = _published(tmp_path)
    assert len(files) == 3
    rows = []
    for f in files:
        with open(tmp_path / "out" / f, encoding="utf-8") as fh:
            rows += [json.loads(line) for line in fh]
    assert sorted(r["a"] for r in rows) == [0, 1, 2]
    assert not any(os.path.exists(m.tmp_path) for m in msgs)  # staged gone


def test_abort_cleans_staging_and_publishes_nothing(tmp_path):
    w = _writer(tmp_path)
    msgs = [w.write(iter([_Row(a=i)])) for i in range(2)]
    w.abort(msgs)
    assert _published(tmp_path) == []
    assert not any(os.path.exists(m.tmp_path) for m in msgs)


def test_retry_does_not_double_publish(tmp_path):
    """A task retry writes a SECOND temp file, but only the attempt
    whose message reaches commit() is published — the other stays
    staged (and would be removed by abort/cleanup)."""
    w = _writer(tmp_path)
    first = w.write(iter([_Row(a=1)]))
    retry = w.write(iter([_Row(a=1)]))  # same logical partition, new file
    w.commit([retry])
    files = _published(tmp_path)
    assert len(files) == 1
    assert os.path.exists(first.tmp_path)  # superseded attempt never published
    w.abort([first])
    assert _published(tmp_path) == [files[0]]


def test_missing_path_option_raises():
    import pytest

    with pytest.raises(ValueError, match="path"):
        PushDataSourceWriter({})


def test_commit_messages_are_picklable():
    import pickle

    m = _PushCommit(tmp_path="/tmp/x", n_rows=3)
    assert pickle.loads(pickle.dumps(m)) == m
