"""Unit tests for tools/bench_history.py — the cross-round bench
regression detector (VERDICT r6 item 1). The r6 round proved what an
untested trust tool costs: a noise-dominated bench went unflagged
because the tool crashed on the driver's `"parsed": null` artifacts.
These tests pin every behavior the tool claims:

- tail recovery of queries/runs from truncated driver stdout,
- the min-AND-median regression rule,
- the spread>=2x NOISY? gate,
- the last-3-prior-rounds baseline window (era drift must not flag a
  query that settled at a higher-but-stable level forever),
- BENCH_local.json auto-inclusion only while fresher than the newest
  driver artifact.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

spec = importlib.util.spec_from_file_location(
    "bench_history", REPO / "tools" / "bench_history.py"
)
bh = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bh)


def mk_round(tag, queries, runs=None, partial=False, canaries=None):
    return bh.Round(tag, queries, runs or {}, partial, canaries)


# ---------------------------------------------------------------- tail


def test_from_tail_recovers_runs_and_scalars():
    tail = (
        '...}, "queries": {"q_a": 1.25, "q_b": 0.5}, '
        '"runs": {"q_a": [1.3, 1.25, 1.9], "q_b": [0.5, 0.6, 0.7]}}'
    )
    queries, runs = bh._from_tail(tail)
    assert queries["q_a"] == 1.25 and queries["q_b"] == 0.5
    # runs come back sorted regardless of input order
    assert runs["q_a"] == [1.25, 1.3, 1.9]


def test_from_tail_runs_list_reconstructs_truncated_scalar():
    # the scalar pair for q_a was truncated away; only its runs survive
    tail = '"q_a": [2.0, 1.5, 3.0], "q_b": 0.25}'
    queries, runs = bh._from_tail(tail)
    assert queries["q_a"] == 1.5  # min of the sorted runs
    assert queries["q_b"] == 0.25


def test_from_tail_ignores_meta_keys():
    tail = '{"metric": 1, "value": 30.5, "sf": 0.1, "q_a": 1.0}'
    queries, _ = bh._from_tail(tail)
    assert "value" not in queries and "sf" not in queries
    assert queries == {"q_a": 1.0}


# ----------------------------------------------------------- parse_doc


def test_parse_doc_direct_bench_output():
    q, r, partial, can = bh._parse_doc(
        {"queries": {"a": 1.0}, "runs": {"a": [1.0]}, "canary_io": 0.4}
    )
    assert q == {"a": 1.0} and r == {"a": [1.0]} and not partial
    assert can == {"canary_io": 0.4}


def test_parse_doc_driver_parsed_dict():
    q, _, partial, can = bh._parse_doc(
        {"parsed": {"queries": {"a": 2.0}, "canary_cpu": 0.2}}
    )
    assert q == {"a": 2.0} and not partial and can == {"canary_cpu": 0.2}


def test_parse_doc_parsed_null_falls_back_to_tail():
    q, r, partial, can = bh._parse_doc(
        {"parsed": None,
         "tail": '"a": [1.0, 1.1, 1.2]}, "canary_cpu": 0.21, "canary_io": 0.5}'}
    )
    assert q == {"a": 1.0} and partial
    # canaries recovered from the tail, never mistaken for queries
    assert can == {"canary_cpu": 0.21, "canary_io": 0.5}
    assert "canary_cpu" not in q


def test_parse_doc_raises_when_nothing_recoverable():
    try:
        bh._parse_doc({"parsed": None, "tail": "no json here"})
    except ValueError:
        pass
    else:
        raise AssertionError("expected ValueError")


# ------------------------------------------------------------ flag_for


def test_flag_clean_when_within_ratio():
    prior = [mk_round("r01", {"a": 1.0}, {"a": [1.0, 1.1, 1.2]})]
    newest = mk_round("loc", {"a": 1.2}, {"a": [1.2, 1.25, 1.3]})
    assert bh.flag_for("a", newest, prior) == ""


def test_flag_regression_min_and_median_up_quiet_spread():
    prior = [mk_round("r01", {"a": 1.0}, {"a": [1.0, 1.05, 1.1]})]
    newest = mk_round("loc", {"a": 1.5}, {"a": [1.5, 1.55, 1.6]})
    assert bh.flag_for("a", newest, prior).startswith("REGRESSION 1.5x")


def test_flag_suppressed_when_median_holds():
    # min elevated (one bad first run) but the bulk of runs unchanged
    prior = [mk_round("r01", {"a": 1.0}, {"a": [1.0, 1.05, 1.1]})]
    newest = mk_round("loc", {"a": 1.4}, {"a": [1.4, 1.05, 1.06]})
    assert bh.flag_for("a", newest, prior) == ""


def test_flag_noisy_when_spread_wide():
    # both ratios trip but the newest round's own TRIMMED spread is
    # >= 2x (two of three runs elevated): the machine was loaded, so
    # the verdict is NOISY?, not REGRESSION
    prior = [mk_round("r01", {"a": 1.0}, {"a": [1.0, 1.05, 1.1]})]
    newest = mk_round("loc", {"a": 1.6}, {"a": [1.6, 3.4, 8.0]})
    flag = bh.flag_for("a", newest, prior)
    assert flag.startswith("NOISY?") and "re-run locally" in flag


def test_single_outlier_run_does_not_park_adjudication():
    """r9: the knn_join_ivf shape — one 17s outlier among quiet runs
    must NOT route to NOISY; the trimmed spread drops the single worst
    run and the query is adjudicated on its trustworthy min/median."""
    prior = [mk_round("r01", {"a": 1.0}, {"a": [1.0, 1.05, 1.1]})]
    # regression with an outlier: still flagged, not parked
    newest = mk_round("loc", {"a": 1.5}, {"a": [1.5, 1.55, 17.7]})
    assert bh.flag_for("a", newest, prior).startswith("REGRESSION 1.5x")
    # clean with an outlier: stays clean
    newest = mk_round("loc", {"a": 1.05}, {"a": [1.05, 1.1, 17.7]})
    assert bh.flag_for("a", newest, prior) == ""


def test_flag_baseline_is_last_three_prior_rounds_only():
    # an ancient fast round must NOT flag a query stable at a higher
    # level for the last 3 rounds (era drift)
    prior = [
        mk_round("r01", {"a": 0.5}, {"a": [0.5, 0.5, 0.5]}),
        mk_round("r02", {"a": 1.0}, {"a": [1.0, 1.0, 1.1]}),
        mk_round("r03", {"a": 1.0}, {"a": [1.0, 1.0, 1.1]}),
        mk_round("r04", {"a": 1.0}, {"a": [1.0, 1.0, 1.1]}),
    ]
    newest = mk_round("loc", {"a": 1.1}, {"a": [1.1, 1.1, 1.15]})
    assert bh.flag_for("a", newest, prior) == ""
    # ...but a real regression vs the recent window still flags
    newest = mk_round("loc", {"a": 1.5}, {"a": [1.5, 1.55, 1.6]})
    assert bh.flag_for("a", newest, prior).startswith("REGRESSION")


def test_flag_baseline_window_skips_rounds_missing_the_query():
    # rounds that never measured the query don't occupy window slots
    prior = [
        mk_round("r01", {"a": 1.0}, {"a": [1.0, 1.0, 1.0]}),
        mk_round("r02", {"b": 9.9}),
        mk_round("r03", {"b": 9.9}),
        mk_round("r04", {"b": 9.9}),
    ]
    newest = mk_round("loc", {"a": 1.5}, {"a": [1.5, 1.5, 1.5]})
    assert bh.flag_for("a", newest, prior).startswith("REGRESSION")


def test_flag_new_and_absent():
    prior = [mk_round("r01", {"a": 1.0})]
    assert bh.flag_for("b", mk_round("loc", {"b": 1.0}), prior) == "new"
    assert bh.flag_for("a", mk_round("loc", {"b": 1.0}), prior) == (
        "absent in latest"
    )


# ----------------------------------------------- env drift adjudication


def test_env_drift_measures_slower_machine():
    prior = [mk_round("r01", {"a": 1.0}, canaries={"canary_io": 0.5})]
    newest = mk_round("loc", {"a": 1.5}, canaries={"canary_io": 0.75})
    ratio, kind = bh.env_drift(newest, prior)
    assert (round(ratio, 2), kind) == (1.5, "io")


def test_env_drift_zero_when_canaries_absent():
    ratio, _ = bh.env_drift(mk_round("loc", {"a": 1.0}),
                            [mk_round("r01", {"a": 1.0})])
    assert ratio == 0.0


def test_env_drift_picks_worst_canary():
    prior = [mk_round("r01", {"a": 1.0},
                      canaries={"canary_cpu": 0.2, "canary_io": 0.5})]
    newest = mk_round("loc", {"a": 1.0},
                      canaries={"canary_cpu": 0.44, "canary_io": 0.55})
    ratio, kind = bh.env_drift(newest, prior)
    assert (round(ratio, 2), kind) == (2.2, "cpu")


def test_flag_cleared_to_env_when_canary_explains_delta():
    """r7 item 8: a query 1.5x slower on a machine whose canary is 1.6x
    slower is machine drift — the flag clears to ENV, not REGRESSION."""
    prior = [mk_round("r01", {"a": 1.0}, {"a": [1.0, 1.05, 1.1]})]
    newest = mk_round("loc", {"a": 1.5}, {"a": [1.5, 1.55, 1.6]})
    flag = bh.flag_for("a", newest, prior, env_ratio=1.6, env_kind="io")
    assert flag.startswith("ENV 1.5x")
    assert "machine drift" in flag


def test_flag_survives_when_query_moved_more_than_canary():
    prior = [mk_round("r01", {"a": 1.0}, {"a": [1.0, 1.05, 1.1]})]
    newest = mk_round("loc", {"a": 2.0}, {"a": [2.0, 2.1, 2.2]})
    flag = bh.flag_for("a", newest, prior, env_ratio=1.3, env_kind="cpu")
    assert flag.startswith("REGRESSION 2.0x")
    assert "env cpu 1.3x slower" in flag


def test_flag_unchanged_when_env_drift_below_threshold():
    prior = [mk_round("r01", {"a": 1.0}, {"a": [1.0, 1.05, 1.1]})]
    newest = mk_round("loc", {"a": 1.5}, {"a": [1.5, 1.55, 1.6]})
    flag = bh.flag_for("a", newest, prior, env_ratio=1.1, env_kind="io")
    assert flag == "REGRESSION 1.5x vs best"


def test_env_drift_windows_match_query_baseline():
    """env_drift must use the SAME last-3-rounds window flag_for uses:
    a quiet-era canary from four rounds back must not inflate the env
    ratio and clear a real regression measured against recent rounds
    (post-review fix). Here the machine has been flat (canary 1.0) for
    the entire window the query is judged in."""
    prior = [
        mk_round("r01", {"a": 1.0}, canaries={"canary_io": 0.5}),
        mk_round("r02", {"a": 1.0}, canaries={"canary_io": 1.0}),
        mk_round("r03", {"a": 1.0}, canaries={"canary_io": 1.0}),
        mk_round("r04", {"a": 1.0}, canaries={"canary_io": 1.0}),
    ]
    newest = mk_round(
        "loc", {"a": 1.5}, {"a": [1.5, 1.52, 1.55]},
        canaries={"canary_io": 1.0},
    )
    ratio, kind = bh.env_drift(newest, prior)
    assert round(ratio, 2) == 1.0  # NOT 2.0 vs the stale r01 canary
    flag = bh.flag_for("a", newest, prior, ratio, kind)
    assert flag.startswith("REGRESSION 1.5x")


def test_env_ratio_recomputed_from_query_own_window():
    """Post-review fix (r9): a query measured only in rounds where the
    machine was QUIET must not have its regression cleared by a global
    env ratio inflated by canary-less or slow rounds the query never
    appeared in — flag_for recomputes env drift from the query's own
    baseline subset whenever that subset carries canaries."""
    prior = [
        mk_round("r01", {"a": 1.0}, {"a": [1.0, 1.0, 1.0]},
                 canaries={"canary_io": 1.0}),
        mk_round("r02", {"a": 1.0}, {"a": [1.0, 1.0, 1.0]},
                 canaries={"canary_io": 1.0}),
        mk_round("r03", {"b": 9.9}),  # query absent; no canaries
        mk_round("r04", {"b": 9.9}),
    ]
    newest = mk_round(
        "loc", {"a": 1.5}, {"a": [1.5, 1.52, 1.55]},
        canaries={"canary_io": 1.0},
    )
    # caller passes a (wrongly) inflated global ratio — ignored because
    # the query's own window has canary data saying the machine is flat
    flag = bh.flag_for("a", newest, prior, env_ratio=1.6, env_kind="io")
    assert flag.startswith("REGRESSION 1.5x")


def test_env_global_fallback_when_query_window_lacks_canaries():
    """When the query's baseline rounds carry no canaries (pre-canary
    artifacts), the caller's global ratio is the only evidence and is
    still honored."""
    prior = [mk_round("r01", {"a": 1.0}, {"a": [1.0, 1.05, 1.1]})]
    newest = mk_round("loc", {"a": 1.5}, {"a": [1.5, 1.55, 1.6]},
                      canaries={"canary_io": 1.6})
    flag = bh.flag_for("a", newest, prior, env_ratio=1.6, env_kind="io")
    assert flag.startswith("ENV 1.5x")


def test_noisy_spread_gates_before_env_clearing():
    """A newest-round spread past NOISY_SPREAD means the measurement
    itself is untrusted — it must route to 'NOISY? re-run locally',
    never be confidently cleared to ENV (post-review fix)."""
    prior = [mk_round("r01", {"a": 1.0}, {"a": [1.0, 1.05, 1.1]})]
    newest = mk_round("loc", {"a": 1.5}, {"a": [1.5, 3.2, 4.6]})
    flag = bh.flag_for("a", newest, prior, env_ratio=1.6, env_kind="io")
    assert flag.startswith("NOISY?")
    assert "re-run locally" in flag


def test_from_tail_scalar_accepts_scientific_notation():
    q, _ = bh._from_tail('{"queries": {"tiny": 1.2e-05, "b": 3.5}}')
    assert q["tiny"] == 1.2e-05 and q["b"] == 3.5
    c = bh._canaries_from_tail('"canary_cpu": 9.7e-02, "canary_io": 0.15')
    assert c == {"canary_cpu": 0.097, "canary_io": 0.15}


# --------------------------------------------------------- load_rounds


def _write_bench(path: Path, queries, runs=None, mtime=None):
    path.write_text(json.dumps({"queries": queries, "runs": runs or {}}))
    if mtime is not None:
        os.utime(path, (mtime, mtime))


def test_load_rounds_orders_by_round_number_and_includes_fresh_local(
    tmp_path, monkeypatch
):
    # unpadded r2 vs r10: numeric order must win over lexicographic
    _write_bench(tmp_path / "BENCH_r2.json", {"a": 1.0}, mtime=1_000)
    _write_bench(tmp_path / "BENCH_r10.json", {"a": 2.0}, mtime=2_000)
    _write_bench(tmp_path / "BENCH_local.json", {"a": 3.0}, mtime=3_000)
    monkeypatch.setattr(bh, "REPO", tmp_path)
    rounds = bh.load_rounds([])
    assert [r.tag for r in rounds] == ["r02", "r10", "local"]
    assert rounds[-1].queries == {"a": 3.0}


def test_load_rounds_ignores_stale_local(tmp_path, monkeypatch, capsys):
    _write_bench(tmp_path / "BENCH_r1.json", {"a": 1.0}, mtime=5_000)
    _write_bench(tmp_path / "BENCH_local.json", {"a": 3.0}, mtime=1_000)
    monkeypatch.setattr(bh, "REPO", tmp_path)
    rounds = bh.load_rounds([])
    assert [r.tag for r in rounds] == ["r01"]
    assert "predates" in capsys.readouterr().err


def test_load_rounds_skips_unparseable_artifact(tmp_path, monkeypatch, capsys):
    (tmp_path / "BENCH_r1.json").write_text('{"parsed": null, "tail": "x"}')
    _write_bench(tmp_path / "BENCH_r2.json", {"a": 1.0})
    monkeypatch.setattr(bh, "REPO", tmp_path)
    rounds = bh.load_rounds([])
    assert [r.tag for r in rounds] == ["r02"]
    assert "skipping" in capsys.readouterr().err


def test_real_driver_artifacts_all_load():
    """Every BENCH_r*.json the driver has actually written must parse —
    this is the exact regression that broke the tool in r5/r6."""
    artifacts = sorted(REPO.glob("BENCH_r*.json"))
    assert artifacts, "driver BENCH artifacts missing from repo root"
    for p in artifacts:
        q, _, _, _ = bh._parse_doc(json.loads(p.read_text()))
        assert q, f"{p.name} recovered zero queries"


def test_env_clear_annotates_per_window_canaries():
    """r10 (advice 4): an ENV clearance on an artifact carrying
    per-window canaries shows each window's drift, and a drift living
    ONLY in the post-run window (possibly self-inflicted: warm cache,
    GC-pressured heap) is called out for a local re-run instead of
    silently passing as machine drift."""
    prior = [mk_round("r01", {"a": 1.0}, {"a": [1.0, 1.0, 1.0]},
                      canaries={"canary_par": 1.0})]
    # flat worst-of ratio 1.6 clears the 1.5x query; windows split
    newest = mk_round(
        "loc", {"a": 1.5}, {"a": [1.5, 1.5, 1.5]},
        canaries={
            "canary_par": 1.6,
            "canary_pre": {"par": 1.0},
            "canary_post": {"par": 1.6},
        },
    )
    flag = bh.flag_for("a", newest, prior, env_ratio=1.6, env_kind="par")
    assert flag.startswith("ENV 1.5x")
    assert "pre 1.0x" in flag and "post 1.6x" in flag
    assert "post-window only" in flag and "re-run locally" in flag

    # drift present in BOTH windows: annotated, but no re-run callout
    newest2 = mk_round(
        "loc", {"a": 1.5}, {"a": [1.5, 1.5, 1.5]},
        canaries={
            "canary_par": 1.6,
            "canary_pre": {"par": 1.55},
            "canary_post": {"par": 1.6},
        },
    )
    flag2 = bh.flag_for("a", newest2, prior, env_ratio=1.6, env_kind="par")
    assert flag2.startswith("ENV 1.5x")
    assert "pre 1.6x" in flag2 or "pre 1.5x" in flag2
    assert "post-window only" not in flag2


def test_parse_doc_keeps_window_canaries_and_tail_skips_their_keys():
    """The r10 artifact shape: canary_par joins the flat keys,
    canary_pre/canary_post ride along as dicts; tail recovery must
    not read the windows' short inner keys (cpu/io/par) as queries."""
    doc = {
        "queries": {"a": 1.0},
        "runs": {},
        "canary_cpu": 0.1, "canary_io": 0.2, "canary_par": 1.2,
        "canary_pre": {"cpu": 0.1, "io": 0.2, "par": 1.0},
        "canary_post": {"cpu": 0.09, "io": 0.15, "par": 1.2},
    }
    q, _, partial, canaries = bh._parse_doc(doc)
    assert not partial and q == {"a": 1.0}
    assert canaries["canary_par"] == 1.2
    assert canaries["canary_pre"] == {"cpu": 0.1, "io": 0.2, "par": 1.0}

    tail = ('"queries": {"a": 1.0}, "canary_par": 1.2, '
            '"canary_pre": {"cpu": 0.1, "io": 0.2, "par": 1.0}}')
    queries, _ = bh._from_tail(tail)
    assert queries == {"a": 1.0}  # cpu/io/par never become queries


def test_from_tail_window_spans_stripped_not_name_blacklisted():
    """Review pass 2: the window dicts are removed wholesale before the
    scalar regex, so a FUTURE fourth probe key inside them cannot leak
    out as a phantom query that _META_KEYS forgot to blacklist."""
    tail = ('"queries": {"a": 1.0}, '
            '"canary_pre": {"cpu": 0.1, "net": 0.4}, '
            '"canary_post": {"cpu": 0.2, "net": 0.5}}')
    queries, _ = bh._from_tail(tail)
    assert queries == {"a": 1.0}
    assert "net" not in queries


# ------------------------------------------- r11 compact final line


def _verbose_and_compact(queries, runs):
    verbose = json.dumps({
        "metric": "sum_query_seconds", "value": sum(queries.values()),
        "unit": "sec", "queries": queries, "runs": runs, "sf": 0.1,
        "canary_cpu": 0.1, "canary_io": 0.2, "canary_par": 1.0,
        "canary_pre": {"cpu": 0.1, "io": 0.2, "par": 1.0},
        "canary_post": {"cpu": 0.1, "io": 0.2, "par": 1.0},
    })
    compact = json.dumps({
        "metric": "sum_query_seconds", "value": sum(queries.values()),
        "unit": "sec", "queries": queries, "sf": 0.1,
        "canary_cpu": 0.1, "canary_io": 0.2, "canary_par": 1.0,
    }, separators=(",", ":"))
    return verbose, compact


def test_load_doc_merges_two_line_local_capture():
    # `python bench.py > f` now captures BOTH lines; runs and windows
    # come from the verbose line, the query set from the compact one
    q = {"q_a": 1.0, "q_b": 2.0}
    r = {"q_a": [1.0, 1.1], "q_b": [2.0, 2.2]}
    verbose, compact = _verbose_and_compact(q, r)
    doc = bh._load_doc(verbose + "\n" + compact + "\n")
    queries, runs, partial, canaries = bh._parse_doc(doc)
    assert queries == q and runs == r and partial is False
    assert canaries["canary_cpu"] == 0.1
    assert isinstance(canaries.get("canary_pre"), dict)


def test_load_doc_single_line_back_compat():
    q = {"q_a": 1.0}
    verbose, _ = _verbose_and_compact(q, {"q_a": [1.0]})
    doc = bh._load_doc(verbose)
    queries, runs, partial, _ = bh._parse_doc(doc)
    assert queries == q and runs == {"q_a": [1.0]} and partial is False


def test_parse_doc_prefers_compact_tail_line_and_scavenges_runs():
    # driver artifact: parsed null, tail begins mid-verbose-line (the
    # r10 failure shape) but now ENDS with the complete compact line.
    # The query set must be FULL (partial False) even though the
    # verbose front was cut, and the surviving runs lists are merged.
    q = {"q_early": 1.5, "q_late": 0.5}
    runs_late_only = '"q_late": [0.5, 0.6, 0.7]}, "canary_cpu": 0.1}'
    _, compact = _verbose_and_compact(q, {})
    tail = "…truncated…" + runs_late_only + "\n" + compact
    queries, runs, partial, canaries = bh._parse_doc(
        {"parsed": None, "tail": tail}
    )
    assert queries == q
    assert partial is False  # compact line vouches for the full set
    assert runs == {"q_late": [0.5, 0.6, 0.7]}  # scavenged, filtered
    assert canaries["canary_cpu"] == 0.1


def test_parse_doc_old_tail_without_compact_still_partial():
    tail = '"q_a": [2.0, 1.5], "q_b": 0.25}'
    queries, runs, partial, _ = bh._parse_doc({"parsed": None, "tail": tail})
    assert partial is True and queries == {"q_a": 1.5, "q_b": 0.25}


def test_parse_doc_driver_parsed_compact_scavenges_runs_from_tail():
    # if the driver itself json-parses the compact last line, 'parsed'
    # has queries but no runs — the tail's verbose remnant still feeds
    # the median/spread gates
    q = {"q_a": 1.0, "q_b": 2.0}
    _, compact = _verbose_and_compact(q, {})
    tail = '"q_b": [2.0, 2.5, 3.0], "q_zz_dropped": [9.9]}' + "\n" + compact
    queries, runs, partial, _ = bh._parse_doc(
        {"parsed": json.loads(compact), "tail": tail}
    )
    assert queries == q and partial is False
    # scavenged runs are filtered to the vouched query set
    assert runs == {"q_b": [2.0, 2.5, 3.0]}
