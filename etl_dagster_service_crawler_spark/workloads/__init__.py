"""Declared engine capability surface: every SURVEY.md §2 operator as a
QuerySpec (PySpark query + DuckDB oracle). Assembled by registry().

The driver checks the FIRST 50 registry entries per round, so registry()
orders queries to rotate coverage: never-driver-checked first, then
verified queries stalest-verdict-first (git-touched-since-verdict breaks
ties within a round).  The verified set is DERIVED — from the
``CORRECTNESS_r*.json`` files the driver drops in the repo root, minus a
git-touched filter — so rotation cannot be forgotten by hand (the
round-2 failure mode: a hand-frozen ``_R01_VERIFIED`` set kept rewritten
queries out of the check window).
"""

from __future__ import annotations

import json
import logging
import re
import subprocess
from functools import lru_cache
from pathlib import Path

from etl_dagster_service_crawler_spark.core import QuerySpec

_log = logging.getLogger("spark_graft.registry")

_REPO_ROOT = Path(__file__).resolve().parents[2]
_PKG_DIR = "etl_dagster_service_crawler_spark"


def _driver_verdicts(
    root: Path,
) -> tuple[dict[str, int], dict[str, int], dict[int, str]]:
    """Parse CORRECTNESS_r*.json files into per-query verdict rounds.

    Returns ``(hash_green, rows_checked)``: for each query name, the
    latest round in which the driver (a) fully verified it — rows,
    schema, and value hash all matched with no error — and (b) at least
    recorded a row count (the weaker rows-only check used for queries
    without an oracle).
    """
    hash_green: dict[str, int] = {}
    rows_checked: dict[str, int] = {}
    round_files: dict[int, str] = {}
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", p.name)
        if not m:
            continue
        rnd = int(m.group(1))
        round_files[rnd] = p.name
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError) as e:
            _log.warning("unreadable %s: %s", p.name, e)
            continue
        for name, rec in data.items():
            if not isinstance(rec, dict):
                continue
            err = rec.get("err")
            if (
                not err
                and rec.get("rows_match") is True
                and rec.get("schema_match") is True
                and rec.get("hash_match") is True
            ):
                hash_green[name] = max(hash_green.get(name, 0), rnd)
            if rec.get("spark_rows") is not None and err in (None, "no_oracle"):
                rows_checked[name] = max(rows_checked.get(name, 0), rnd)
    return hash_green, rows_checked, round_files


def _git(root: Path, *args: str) -> str:
    return subprocess.run(
        ["git", *args],
        cwd=root,
        capture_output=True,
        text=True,
        timeout=30,
        check=True,
    ).stdout


def _touched_since(root: Path, round_files: dict[int, str]) -> dict[int, set[str]]:
    """For each verdict round, package files changed since that round ran.

    The anchor for round N is the commit that last touched
    ``CORRECTNESS_rN.json`` (the driver commits results against the code
    it just checked).  The diff is taken against the WORKING TREE so
    uncommitted edits also invalidate verdicts.  If the artifact is
    still UNTRACKED (the driver drops it uncommitted at round end), the
    anchor falls back to HEAD: the code the driver checked is at most
    HEAD plus the working tree, so diffing HEAD→worktree is a sound
    over-approximation of "changed since checked" — never "nothing
    touched", which silently disarmed the filter (r7 verdict, What's
    wrong #2).  Only a git FAILURE degrades to disabled, with a warning.
    """
    out: dict[int, set[str]] = {}
    for rnd, fname in round_files.items():
        try:
            anchor = _git(root, "log", "-n1", "--format=%H", "--", fname).strip()
            if not anchor:
                anchor = "HEAD"
                _log.info(
                    "round %s artifact %s untracked; anchoring git-touched "
                    "filter at HEAD (uncommitted edits still invalidate)",
                    rnd,
                    fname,
                )
            changed = _git(root, "diff", "--name-only", anchor, "--", _PKG_DIR)
            out[rnd] = {f for f in changed.splitlines() if f.strip()}
        except (OSError, ValueError, subprocess.SubprocessError) as e:
            _log.warning("git-touched filter disabled for round %s: %s", rnd, e)
            out[rnd] = set()
    return out


def _spec_file(spec: QuerySpec) -> str | None:
    """Repo-relative source file declaring this spec's query fn."""
    mod = getattr(spec.fn, "__module__", None)
    if not mod or not mod.startswith(_PKG_DIR):
        return None
    return mod.replace(".", "/") + ".py"


def order_specs(
    specs: list[QuerySpec],
    hash_green: dict[str, int],
    rows_checked: dict[str, int],
    touched: dict[int, set[str]],
) -> list[QuerySpec]:
    """Rotation policy, pure so tests can drive it directly.

    Never-driver-checked specs come first (oracle-backed before
    rows-only).  Checked specs follow STALEST VERDICT FIRST: the age of
    a verdict dominates, because a verdict k rounds old has accumulated
    k rounds of shared-code drift regardless of which file each edit
    landed in (the r7 failure mode: touch-class-major ordering let ~109
    fresher-but-touched entries crowd four r3-stamped queries out to
    positions 127-130, so their verdicts could never refresh).  Within
    the same verdict round, the git-touched classes break ties:
      0. this spec's OWN module file changed since its verdict — the
         direct-edit class, likeliest to have broken
      1. shared non-workload package code changed since (conservatively
         invalidates every verdict older than the change)
      2. untouched

    A spec with an oracle needs a full hash-green verdict to leave the
    never-checked tier; a rows-only spec only needs a recorded row
    count.  Ties beyond that are stable, preserving declaration order.
    """
    spec_files = {_spec_file(s) for s in specs} - {None}

    def verdict_round(s: QuerySpec) -> int:
        if s.oracle is not None:
            return hash_green.get(s.name, 0)
        return rows_checked.get(s.name, 0)

    def touch_class(s: QuerySpec, rnd: int) -> int:
        """0 = own module changed, 1 = shared code changed, 2 = clean."""
        changed = touched.get(rnd, set())
        if not changed:
            return 2
        f = _spec_file(s)
        if f is None or f in changed:
            return 0
        # Changes to shared package code (operators/, functions/, io/,
        # streaming/, sources/, session, core — anything that is not
        # itself a spec-declaring module) can affect any query, so they
        # conservatively invalidate every verdict older than the change.
        # The registry module itself only ORDERS specs and is exempt.
        registry_file = f"{_PKG_DIR}/workloads/__init__.py"
        if any(c not in spec_files and c != registry_file for c in changed):
            return 1
        return 2

    def key(s: QuerySpec) -> tuple[int, int, int]:
        rnd = verdict_round(s)
        if rnd == 0:
            return (0, 0, 0 if s.oracle is not None else 1)
        return (1, rnd, touch_class(s, rnd))

    return sorted(specs, key=key)


@lru_cache(maxsize=1)
def _rotation_state() -> tuple[dict[str, int], dict[str, int], tuple]:
    hash_green, rows_checked, round_files = _driver_verdicts(_REPO_ROOT)
    touched = _touched_since(_REPO_ROOT, round_files)
    return hash_green, rows_checked, tuple(sorted(touched.items()))


def registry() -> dict[str, QuerySpec]:
    from etl_dagster_service_crawler_spark.workloads import (
        analytics_wl,
        io_wl,
        joins_wl,
        relational,
        udf_wl,
    )

    from etl_dagster_service_crawler_spark.plans.pipeline import (
        CRAWL_E2E_SQL,
        PIPELINE_DAILY_MART_SQL,
        PIPELINE_SUMMARY_SQL,
        crawl_e2e,
        pipeline_daily_mart,
        pipeline_summary,
    )

    specs: list[QuerySpec] = []
    specs += relational.SPECS
    specs += joins_wl.SPECS
    specs += analytics_wl.SPECS
    specs += io_wl.SPECS
    specs += udf_wl.SPECS
    specs.append(
        QuerySpec("pipeline_crawl_summary", pipeline_summary, PIPELINE_SUMMARY_SQL, bench=True)
    )
    specs.append(QuerySpec("pipeline_crawl_e2e", crawl_e2e, CRAWL_E2E_SQL))
    specs.append(
        QuerySpec("pipeline_daily_mart", pipeline_daily_mart, PIPELINE_DAILY_MART_SQL)
    )
    for mod_name in ("llm", "corpus_wl", "streaming_wl", "sources_wl"):
        # only the optional-dependency probe is allowed to shrink the
        # surface, and never silently: a typo'd import inside one of
        # these modules would otherwise drop ~30 declared queries
        try:
            mod = __import__(
                f"etl_dagster_service_crawler_spark.workloads.{mod_name}",
                fromlist=["SPECS"],
            )
            specs += mod.SPECS
        except ImportError as e:
            _log.warning(
                "workload module %s disabled (%s: %s) — its queries are "
                "missing from the registry",
                mod_name,
                type(e).__name__,
                e,
            )
    hash_green, rows_checked, touched_items = _rotation_state()
    ordered = order_specs(
        specs, hash_green, rows_checked, {r: set(fs) for r, fs in touched_items}
    )
    out: dict[str, QuerySpec] = {}
    for s in ordered:
        if s.name in out:
            raise ValueError(f"duplicate query name {s.name}")
        out[s.name] = s
    return out
