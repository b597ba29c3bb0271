"""Rotation policy: the driver checks the first 50 registry entries, so
ordering IS coverage.  These tests pin the derived-verified-set policy
(VERDICT.md r2 items 1/9, r7 item 2): never-checked first, then verified
stalest-verdict-first with git-touched tie-breaks — with no hand-frozen
sets anywhere."""

from __future__ import annotations

import subprocess

from etl_dagster_service_crawler_spark.core import QuerySpec
from etl_dagster_service_crawler_spark.workloads import (
    _driver_verdicts,
    _REPO_ROOT,
    _touched_since,
    order_specs,
    registry,
)


def _spec(name, module="etl_dagster_service_crawler_spark.workloads.relational",
          oracle="SELECT 1"):
    def fn(spark, sf_dir):  # pragma: no cover - never executed
        raise AssertionError
    fn.__module__ = module
    return QuerySpec(name, fn, oracle)


def test_never_checked_precede_verified():
    specs = [_spec("verified"), _spec("fresh"), _spec("fresh_rows_only", oracle=None)]
    out = order_specs(specs, {"verified": 2}, {"verified": 2}, {2: set()})
    # oracle-backed fresh first, rows-only fresh second, verified last
    assert [s.name for s in out] == ["fresh", "fresh_rows_only", "verified"]


def test_rows_only_verdict_does_not_satisfy_oracle_spec():
    # a query promoted from rows-only to oracle-backed must be re-checked:
    # its old 'no_oracle' row-count record is not a hash verdict
    specs = [_spec("promoted"), _spec("other")]
    out = order_specs(specs, {"other": 1}, {"promoted": 1, "other": 1}, {1: set()})
    assert [s.name for s in out] == ["promoted", "other"]


def test_touched_module_invalidates_its_specs_only():
    rel = "etl_dagster_service_crawler_spark.workloads.relational"
    io = "etl_dagster_service_crawler_spark.workloads.io_wl"
    specs = [_spec("a", module=rel), _spec("b", module=io)]
    touched = {1: {"etl_dagster_service_crawler_spark/workloads/relational.py"}}
    out = order_specs(specs, {"a": 1, "b": 1}, {}, touched)
    # a's file changed since its verdict -> tier 1; b untouched -> tier 2
    assert [s.name for s in out] == ["a", "b"]


def test_shared_code_change_invalidates_everything():
    specs = [_spec("a"), _spec("b", module="etl_dagster_service_crawler_spark.workloads.io_wl")]
    touched = {1: {"etl_dagster_service_crawler_spark/functions/compat.py"}}
    out = order_specs(specs, {"a": 1, "b": 1}, {}, touched)
    assert all(
        s.name in ("a", "b") for s in out
    )
    # both drop to tier 1 (re-check); relative declaration order kept
    assert [s.name for s in out] == ["a", "b"]
    # ...but a registry-ordering-only change is exempt
    touched = {1: {"etl_dagster_service_crawler_spark/workloads/__init__.py"}}
    out2 = order_specs(specs, {"a": 1, "b": 1}, {}, touched)
    assert [s.name for s in out2] == ["a", "b"]


def test_verified_sorted_stalest_first():
    specs = [_spec("new"), _spec("old")]
    out = order_specs(specs, {"new": 3, "old": 1}, {}, {1: set(), 3: set()})
    assert [s.name for s in out] == ["old", "new"]


def test_staleness_dominates_touch_class():
    """r7 verdict item 2: an OLD untouched verdict outranks a NEWER
    verdict whose module was edited — otherwise a wide edit crowds the
    stalest stamps out of the 50-window forever (r7: four r3-stamped
    joins_wl queries stuck at positions 127-130 behind ~109 fresher
    touched entries)."""
    rel = "etl_dagster_service_crawler_spark.workloads.relational"
    io = "etl_dagster_service_crawler_spark.workloads.io_wl"
    specs = [_spec("new_touched", module=rel), _spec("old_clean", module=io)]
    touched = {
        1: set(),  # nothing changed since old_clean's verdict... (unused: rnd-keyed)
        5: {"etl_dagster_service_crawler_spark/workloads/relational.py"},
    }
    out = order_specs(specs, {"new_touched": 5, "old_clean": 1}, {}, touched)
    assert [s.name for s in out] == ["old_clean", "new_touched"]
    # within the SAME verdict round, the touched spec goes first
    out2 = order_specs(
        specs,
        {"new_touched": 5, "old_clean": 5},
        {},
        {5: {"etl_dagster_service_crawler_spark/workloads/relational.py"}},
    )
    # old_clean declared second but untouched; new_touched own-module hit
    assert [s.name for s in out2] == ["new_touched", "old_clean"]


def test_untracked_artifact_falls_back_to_head_anchor(tmp_path):
    """r7 verdict item 3: when the driver's CORRECTNESS file is dropped
    UNCOMMITTED, the filter must anchor at HEAD — uncommitted package
    edits still invalidate — instead of silently disarming to 'nothing
    touched'."""
    repo = tmp_path / "repo"
    pkg = repo / "etl_dagster_service_crawler_spark"
    pkg.mkdir(parents=True)
    (pkg / "mod.py").write_text("x = 1\n")

    def git(*args):
        subprocess.run(
            ["git", *args], cwd=repo, check=True, capture_output=True,
            env={"GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@t",
                 "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL": "t@t",
                 "HOME": str(tmp_path), "PATH": "/usr/bin:/bin:/usr/local/bin"},
        )

    git("init", "-q")
    git("add", "-A")
    git("commit", "-qm", "base")
    # driver drops the artifact untracked; builder edits package code after
    (repo / "CORRECTNESS_r09.json").write_text("{}")
    (pkg / "mod.py").write_text("x = 2\n")
    touched = _touched_since(repo, {9: "CORRECTNESS_r09.json"})
    assert touched[9] == {"etl_dagster_service_crawler_spark/mod.py"}


def test_driver_verdict_parsing_against_frozen_fixture():
    """Exact per-round facts are asserted against a FROZEN copy of the
    r01/r02 records (tests/fixtures/correctness_rounds), never against
    the live repo artifacts: the driver rewrites those every round by
    design, so a hardcoded 'agg_pivot last green r2' broke the moment
    the rotation re-verified it (r6 verdict, What's wrong #1)."""
    from pathlib import Path

    fixture = Path(__file__).parent / "fixtures" / "correctness_rounds"
    hash_green, rows_checked, round_files = _driver_verdicts(fixture)
    # the two r01 hash-fails were re-verified green in r02
    assert hash_green == {"agg_pivot": 2, "flagship_revenue_by_nation": 2}
    # rows-only records count as checked but never as hash-green
    assert rows_checked == {
        "agg_pivot": 2,
        "flagship_revenue_by_nation": 2,
        "agg_approx_distinct": 1,
    }
    assert sorted(round_files) == [1, 2]


def test_real_repo_derivation_is_rotation_stable():
    """Live-artifact assertions must stay true for ANY future round the
    driver appends: monotone / membership facts only, no absolute round
    numbers."""
    hash_green, rows_checked, round_files = _driver_verdicts(_REPO_ROOT)
    assert round_files  # at least one CORRECTNESS file parsed
    latest = max(round_files)
    # a verdict round can never postdate the newest artifact
    assert all(1 <= r <= latest for r in hash_green.values())
    assert all(1 <= r <= latest for r in rows_checked.values())
    # re-verification only moves stamps FORWARD: the r01 hash-fails were
    # re-verified green in r02, so their stamp is >= 2 forever after
    assert hash_green.get("agg_pivot", 0) >= 2
    assert hash_green.get("flagship_revenue_by_nation", 0) >= 2
    # every hash-green query also has at least a row-count record
    assert set(hash_green) <= set(rows_checked)
    # a spec the registry declares oracle-less can never be hash-green
    # (the driver has no SQL to compare against), only rows-checked
    reg = registry()
    for name, spec in reg.items():
        if spec.oracle is None and name in rows_checked:
            assert name not in hash_green, name


def test_registry_orders_never_checked_into_window():
    names = list(registry())
    window = set(names[:50])
    hash_green, rows_checked, _ = _driver_verdicts(_REPO_ROOT)
    reg = registry()
    never_checked = {
        n
        for n, s in reg.items()
        if (hash_green.get(n, 0) if s.oracle is not None else rows_checked.get(n, 0))
        == 0
    }
    if len(never_checked) <= 50:
        missing = never_checked - window
        assert not missing, f"never-checked queries outside the 50-window: {missing}"
    else:
        # more new queries than window slots (a widening round): the
        # rotation must at least fill EVERY slot with a never-checked
        # query — the overflow is next round's tier-0
        assert window <= never_checked, (
            f"window wastes slots on already-checked queries while "
            f"{len(never_checked)} are unchecked: {window - never_checked}"
        )
