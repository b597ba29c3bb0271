"""Two-phase commit protocol of the custom push sink
(sources/push_sink.py): staged writes are invisible until the manifest
lands; visibility is all-or-nothing; appends namespace their files;
overwrite retracts prior commits; abort leaves no published output."""

from __future__ import annotations

import json
import os

from etl_dagster_service_crawler_spark.sources.push_sink import (
    MANIFEST_PREFIX,
    PushDataSourceWriter,
    _PushCommit,
    manifest_files,
)


class _Row:
    def __init__(self, **kw):
        self._kw = kw

    def asDict(self):  # noqa: N802 - mirrors pyspark Row
        return dict(self._kw)


def _writer(tmp_path, overwrite=False):
    return PushDataSourceWriter({"path": str(tmp_path / "out")}, overwrite=overwrite)


def _committed_rows(tmp_path):
    out = str(tmp_path / "out")
    rows = []
    for name in manifest_files(out):
        with open(os.path.join(out, name), encoding="utf-8") as fh:
            rows += [json.loads(line) for line in fh]
    return rows


def test_write_stages_but_publishes_nothing(tmp_path):
    w = _writer(tmp_path)
    msg = w.write(iter([_Row(a=1), _Row(a=2)]))
    assert msg.n_rows == 2
    assert os.path.exists(msg.tmp_path)
    assert _committed_rows(tmp_path) == []  # nothing visible pre-commit


def test_mid_commit_reader_sees_nothing_post_commit_sees_all(tmp_path):
    """Visibility keys on the manifest: even with every data file
    already renamed into place, a manifest-keyed reader sees NOTHING
    until the manifest lands — then the whole batch at once."""
    w = _writer(tmp_path)
    msgs = [w.write(iter([_Row(a=i)])) for i in range(3)]
    out = str(tmp_path / "out")

    # simulate the mid-commit window: data files renamed, no manifest
    os.makedirs(out, exist_ok=True)
    for i, m in enumerate(msgs):
        os.replace(m.tmp_path, os.path.join(out, f"part-{w.commit_id}-{i:05d}.jsonl"))
    assert manifest_files(out) == []  # reader: nothing committed yet

    # re-stage and run the real commit
    for i in range(3):
        msgs[i] = w.write(iter([_Row(a=i)]))
    w.commit(msgs)
    assert sorted(r["a"] for r in _committed_rows(tmp_path)) == [0, 1, 2]


def test_commit_publishes_all_partitions_and_sweeps_staging(tmp_path):
    w = _writer(tmp_path)
    msgs = [w.write(iter([_Row(a=i)])) for i in range(3)]
    w.commit(msgs)
    assert sorted(r["a"] for r in _committed_rows(tmp_path)) == [0, 1, 2]
    assert not os.path.exists(w.staging)  # this commit's staging swept
    manifests = [
        n for n in os.listdir(tmp_path / "out") if n.startswith(MANIFEST_PREFIX)
    ]
    assert len(manifests) == 1


def test_two_appends_coexist_without_overwriting(tmp_path):
    """Deterministic names used to collide across jobs; per-commit
    namespacing makes a second append ADD files, not replace them."""
    w1, w2 = _writer(tmp_path), _writer(tmp_path)
    w1.commit([w1.write(iter([_Row(a=1)]))])
    w2.commit([w2.write(iter([_Row(a=2)]))])
    assert sorted(r["a"] for r in _committed_rows(tmp_path)) == [1, 2]
    assert len(manifest_files(str(tmp_path / "out"))) == 2


def test_overwrite_retracts_prior_commits(tmp_path):
    w1 = _writer(tmp_path)
    w1.commit([w1.write(iter([_Row(a=1)]))])
    w2 = _writer(tmp_path, overwrite=True)
    w2.commit([w2.write(iter([_Row(a=2)]))])
    assert [r["a"] for r in _committed_rows(tmp_path)] == [2]
    out = str(tmp_path / "out")
    # old data files and manifests are gone, not orphaned
    leftovers = [
        n
        for n in os.listdir(out)
        if w1.commit_id in n and not n.startswith("_staging")
    ]
    assert leftovers == []


def test_abort_cleans_staging_and_publishes_nothing(tmp_path):
    w = _writer(tmp_path)
    [w.write(iter([_Row(a=i)])) for i in range(2)]
    w.abort([])
    assert _committed_rows(tmp_path) == []
    assert not os.path.exists(w.staging)


def test_retry_does_not_double_publish_and_attempts_never_leak(tmp_path):
    """A task retry writes a SECOND temp file, but only the attempt
    whose message reaches commit() is published; the superseded
    attempt's file is swept with the commit's staging directory."""
    w = _writer(tmp_path)
    first = w.write(iter([_Row(a=1)]))
    retry = w.write(iter([_Row(a=1)]))  # same logical partition, new file
    w.commit([retry])
    rows = _committed_rows(tmp_path)
    assert [r["a"] for r in rows] == [1]
    assert not os.path.exists(first.tmp_path)  # failed attempt swept
    assert not os.path.exists(w.staging)


def test_missing_path_option_raises():
    import pytest

    with pytest.raises(ValueError, match="path"):
        PushDataSourceWriter({})


def test_commit_messages_are_picklable():
    import pickle

    m = _PushCommit(tmp_path="/tmp/x", n_rows=3)
    assert pickle.loads(pickle.dumps(m)) == m
