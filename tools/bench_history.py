"""Cross-round bench comparison (VERDICT r2 item 5; r5 item 7 / r6
item 1 — min-AND-median rule + tail recovery).

Reads every BENCH_r*.json in the repo root plus optional local bench
output files given as arguments, and prints a per-query table of
min-of-round values with a flag for regressions.

Driver BENCH artifacts come in two shapes: early rounds carry the full
bench.py JSON under "parsed"; later rounds have "parsed": null and only
a truncated "tail" of the bench stdout. The tail's suffix is the end of
the one-line JSON — complete `"name": min` scalar pairs and
`"name": [runs...]` list pairs are recovered by regex (runs lists are
sorted by bench.py, so runs[0] reconstructs a min even when the scalar
pair was truncated away). Rounds recovered this way are marked `*` in
the header: their query set may be partial, so their TOTAL is not
comparable across rounds.

Regression rule (min AND median, spread-gated): wall clock on this VM
swings 2-6x with neighbor I/O, so a single elevated number means
nothing. A query in the newest round is flagged REGRESSION only when

  newest_min    >= MIN_RATIO x best prior min      (the plan got
  newest_median >= MED_RATIO x best prior median    slower, not one
                                                    lucky/unlucky run)

and the newest round's own spread (max/min of its runs) is below
NOISY_SPREAD — a wide spread means the machine was loaded during the
measurement window, so the same ratios print `NOISY?` instead: re-run
locally to adjudicate. That re-run is the designed noise filter: run
`python bench.py > BENCH_local.json` on a quiet machine and pass it as
an argument (or leave it in the repo root — it is auto-included while
it is NEWER than the newest driver artifact, and ignored once the next
round's BENCH_rN lands, so a stale local run can never masquerade as
current evidence). The local file then becomes the "newest round" the
rule judges, with the driver history as the baseline.

Usage: python tools/bench_history.py [extra_bench.json ...]
"""

from __future__ import annotations

import json
import re
import statistics
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

# bench.py top-level scalar keys that are NOT query timings (the
# canary_pre/canary_post window dicts are stripped wholesale before
# the tail regex runs — see _strip_window_spans — so their inner keys
# need no blacklisting here and a new probe can't leak a phantom query)
_META_KEYS = {"metric", "value", "unit", "sf", "n", "rc", "cpus",
              "canary_cpu", "canary_io", "canary_par"}
_CANARY_KEYS = ("canary_cpu", "canary_io", "canary_par")
_WINDOW_KEYS = ("canary_pre", "canary_post")

MIN_RATIO = 1.25  # newest min vs best prior min
MED_RATIO = 1.10  # newest median vs best prior median
NOISY_SPREAD = 2.0  # newest-round max/min above this => machine noise
ENV_DRIFT_RATIO = 1.2  # canary slower than best prior by this => annotate


def _strip_window_spans(tail: str) -> str:
    """Remove the canary_pre/canary_post {...} spans before flat
    regex scanning: their inner keys ("cpu": 0.1, ...) would otherwise
    match the query-scalar pattern, and blacklisting the key NAMES
    instead would silently grow a phantom query the day bench.py adds
    a fourth probe (review pass 2)."""
    return re.sub(r'"canary_(?:pre|post)":\s*\{[^{}]*\}\s*,?', "", tail)


def _from_tail(tail: str) -> tuple[dict[str, float], dict[str, list[float]]]:
    """Recover (queries, runs) from a truncated bench stdout tail."""
    tail = _strip_window_spans(tail)
    runs: dict[str, list[float]] = {}
    for m in re.finditer(r'"([A-Za-z0-9_]+)":\s*\[([0-9eE+\-., ]+)\]', tail):
        try:
            runs[m.group(1)] = sorted(float(x) for x in m.group(2).split(","))
        except ValueError:
            continue
    queries: dict[str, float] = {}
    # exponent suffix included: a 1.2e-05 timing in a truncated tail
    # must not be silently dropped (the runs-list pattern above already
    # accepts eE)
    scalar = r"(\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)"
    for m in re.finditer(rf'"([A-Za-z0-9_]+)":\s*{scalar}(?=\s*[,}}])', tail):
        k = m.group(1)
        if k not in _META_KEYS:
            queries[k] = float(m.group(2))
    # a runs list can stand in for a truncated-away scalar min
    for k, r in runs.items():
        queries.setdefault(k, r[0])
    return queries, runs


def _canaries_from_tail(tail: str) -> dict[str, float]:
    out = {}
    for k in _CANARY_KEYS:
        m = re.search(rf'"{k}":\s*(\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)', tail)
        if m:
            out[k] = float(m.group(1))
    return out


def _load_doc(text: str) -> dict:
    """Parse a bench output file. Since r11 bench.py prints TWO JSON
    lines (verbose evidence + final compact); a local `bench.py > f`
    capture therefore holds both. Merge them: the compact line is the
    base (it is what the driver tail preserves), with runs/windows
    folded back in from the verbose line when present."""
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        docs = []
        for line in text.splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    docs.append(json.loads(line))
                except json.JSONDecodeError:
                    continue
        if not docs:
            raise ValueError("no parseable JSON line") from None
        base = docs[-1]
        for d in docs:
            for k in ("runs", *_WINDOW_KEYS):
                if k in d and k not in base:
                    base[k] = d[k]
        return base


def _compact_from_tail(tail: str) -> dict | None:
    """The r11 compact line is printed LAST, so a byte-tail of stdout
    ends with it complete. Return the parsed dict of the last tail line
    that is a full bench JSON object, else None."""
    for line in reversed(tail.splitlines()):
        line = line.strip()
        if line.startswith('{"metric"') and line.endswith("}"):
            try:
                doc = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(doc, dict) and "queries" in doc:
                return doc
    return None


def _parse_doc(
    doc: dict,
) -> tuple[dict[str, float], dict[str, list[float]], bool, dict[str, float]]:
    """(queries, runs, partial, canaries). Accepts bench.py's direct
    output, the driver wrapper with a full 'parsed' dict, and the
    driver wrapper with parsed null + stdout tail."""
    tail = doc.get("tail", "")
    for src in (doc, doc.get("parsed"), _compact_from_tail(tail)):
        if isinstance(src, dict) and "queries" in src:
            canaries = {k: src[k] for k in _CANARY_KEYS if k in src}
            # r10 per-window canaries ride along under their own keys;
            # the flat worst-of keys above stay the adjudication input
            # (cross-round comparable), the windows annotate it.
            for wk in _WINDOW_KEYS:
                if isinstance(src.get(wk), dict):
                    canaries[wk] = src[wk]
            runs = src.get("runs", {})
            if not runs and tail:
                # compact line carries no spread — scavenge runs lists
                # from whatever survives of the verbose line in the
                # tail (only for queries the compact line vouches for)
                _, tail_runs = _from_tail(tail)
                runs = {k: v for k, v in tail_runs.items()
                        if k in src["queries"]}
            return src["queries"], runs, False, canaries
    queries, runs = _from_tail(tail)
    if not queries:
        raise ValueError("no queries in parsed or tail")
    return queries, runs, True, _canaries_from_tail(tail)


class Round:
    def __init__(self, tag: str, queries: dict[str, float],
                 runs: dict[str, list[float]], partial: bool,
                 canaries: dict[str, float] | None = None):
        self.tag = tag
        self.queries = queries
        self.runs = runs
        self.partial = partial
        self.canaries = canaries or {}

    def median(self, name: str) -> float | None:
        r = self.runs.get(name)
        if r:
            return statistics.median(r)
        return self.queries.get(name)

    def spread(self, name: str) -> float | None:
        """Trimmed spread (r9, adjudicating the knn_join_ivf NOISY
        flag): with >=3 runs the single worst run is dropped before
        taking max/min. One 17s outlier in (2.8, 2.9, 17.7) is a
        transient env event — min and median are still trustworthy, so
        the query must be ADJUDICATED, not parked as NOISY. Two
        elevated runs out of three still read as a loaded machine and
        trip the gate."""
        r = self.runs.get(name)
        if r and min(r) > 0:
            r = sorted(r)
            trimmed = r[:-1] if len(r) >= 3 else r
            return trimmed[-1] / trimmed[0]
        return None


def load_rounds(extra: list[str]) -> list[Round]:
    rounds: list[Round] = []
    # sort by the ROUND NUMBER, not the filename: lexicographically an
    # unpadded BENCH_r2.json would sort after BENCH_r10.json and be
    # treated as newer
    numbered = []
    newest_artifact_mtime = 0.0
    for p in REPO.glob("BENCH_r*.json"):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", p.name)
        if m:
            numbered.append((int(m.group(1)), p))
            newest_artifact_mtime = max(newest_artifact_mtime, p.stat().st_mtime)
    for n, p in sorted(numbered):
        try:
            q, r, partial, canaries = _parse_doc(_load_doc(p.read_text()))
            rounds.append(Round(f"r{n:02d}", q, r, partial, canaries))
        except (OSError, ValueError, KeyError) as e:
            print(f"# skipping {p.name}: {e}", file=sys.stderr)
    # auto-include a repo-root local re-run while it is fresher than the
    # newest driver artifact (stale local evidence is ignored, loudly)
    local = REPO / "BENCH_local.json"
    paths = list(extra)
    if local.exists() and str(local) not in paths and local.name not in paths:
        if local.stat().st_mtime > newest_artifact_mtime:
            paths.append(str(local))
        else:
            print(
                f"# {local.name} predates the newest BENCH_r* artifact — "
                "ignored (re-run bench.py to refresh)",
                file=sys.stderr,
            )
    for i, arg in enumerate(paths):
        try:
            q, r, partial, canaries = _parse_doc(_load_doc(Path(arg).read_text()))
            tag = Path(arg).stem.replace("BENCH_", "")
            if len(paths) > 1 and tag == "local":
                tag = f"local{i}"
            rounds.append(Round(tag, q, r, partial, canaries))
        except (OSError, ValueError, KeyError) as e:
            print(f"# skipping {arg}: {e}", file=sys.stderr)
    return rounds


def _canary_baseline(prior: list[Round], full_key: str) -> float | None:
    """The shared baseline rule: min over the last <=3 canary-bearing
    prior rounds, None when absent or non-positive. env_drift's ratios
    and _window_note's annotations MUST divide by the same number —
    this helper is the single copy of that rule (review pass 2)."""
    prior_vs = [r.canaries[full_key] for r in prior if full_key in r.canaries][-3:]
    if not prior_vs or min(prior_vs) <= 0:
        return None
    return min(prior_vs)


def env_drift(newest: Round, prior: list[Round]) -> tuple[float, str]:
    """Compare the newest round's canaries against the best canary in
    `prior` (capped at the last <=3 canary-bearing rounds). Ratios from
    mismatched windows adjudicate wrongly: an all-time-best canary from
    a quiet era months back makes env_ratio permanently large, and a
    real plan regression measured against a recent baseline would clear
    to ENV on a machine that has been flat for the whole window. For
    exact alignment, flag_for passes the SAME round subset it uses as
    the query's baseline; main() passes the full history for the
    display-only summary note. Returns (worst_ratio, kind); 0.0 when
    canaries are absent (pre-canary artifacts)."""
    worst = 0.0
    worst_kind = ""
    for k in _CANARY_KEYS:
        newest_v = newest.canaries.get(k)
        base = _canary_baseline(prior, k)
        if newest_v is None or base is None:
            continue
        ratio = newest_v / base
        if ratio > worst:
            worst, worst_kind = ratio, k.removeprefix("canary_")
    return worst, worst_kind


def _window_note(newest: Round, prior: list[Round], kind: str) -> str:
    """Per-window annotation for an ENV-cleared flag (r10, advice 4):
    the post-run probe executes after the full battery, so part of a
    high post reading can be self-inflicted (warm cache, GC-pressured
    heap) rather than neighbor load. When the newest artifact carries
    per-window canaries, show each window's drift vs the same prior
    baseline the flat ratio used; a clearance whose drift lives ONLY
    in the post window is called out as needing a local re-run rather
    than silently passing as machine drift."""
    base = _canary_baseline(prior, f"canary_{kind}")
    if base is None:
        return ""
    ratios = {}
    for wk in _WINDOW_KEYS:
        win = newest.canaries.get(wk)
        if isinstance(win, dict) and kind in win:
            ratios[wk.removeprefix("canary_")] = win[kind] / base
    if len(ratios) != 2:
        return ""
    note = " [" + " ".join(f"{w} {v:.1f}x" for w, v in ratios.items()) + "]"
    if ratios["pre"] < ENV_DRIFT_RATIO <= ratios["post"]:
        note += " post-window only — possibly self-inflicted, re-run locally"
    return note


def flag_for(
    name: str, newest: Round, prior: list[Round], env_ratio: float = 0.0,
    env_kind: str = "",
) -> str:
    newest_min = newest.queries.get(name)
    if newest_min is None:
        return "absent in latest"
    # Baseline = best of the LAST <=3 prior rounds that measured this
    # query, not the all-time best: machine/codebase era drift over
    # months would otherwise flag every query that settled at a
    # higher-but-stable level forever. The full table still shows the
    # long-term trajectory; the flag answers "did THIS round regress".
    prior = [r for r in prior if name in r.queries][-3:]
    if not prior:
        return "new"
    # Per-query env alignment (post-review fix): recompute the canary
    # ratio from EXACTLY the rounds that form this query's baseline.
    # A query missing from some rounds (or judged across a round with
    # no canaries) must not be adjudicated against a canary era it was
    # never measured in. The caller-supplied global ratio remains only
    # as a fallback for windows with no canary data at all (pre-canary
    # artifacts), where the recent global window is the best evidence
    # available.
    if any(k in r.canaries for r in prior for k in _CANARY_KEYS):
        env_ratio, env_kind = env_drift(newest, prior)
    best_prior_min = min(r.queries[name] for r in prior)
    if best_prior_min <= 0 or newest_min < MIN_RATIO * best_prior_min:
        return ""
    prior_meds = [m for r in prior if (m := r.median(name)) is not None]
    newest_med = newest.median(name)
    if prior_meds and newest_med is not None:
        if newest_med < MED_RATIO * min(prior_meds):
            return ""  # the min moved but the bulk didn't: one bad run
    ratio = newest_min / best_prior_min
    # The spread gate runs FIRST: a newest-round spread past
    # NOISY_SPREAD means the machine was loaded during the measurement
    # window, so neither the ratio nor its comparison to the canaries
    # is trustworthy — route to the designed re-run-locally path
    # instead of confidently adjudicating from an untrusted number.
    spread = newest.spread(name)
    if spread is not None and spread >= NOISY_SPREAD:
        return f"NOISY? {ratio:.1f}x min but spread {spread:.1f}x — re-run locally"
    # canary adjudication (r7 item 8): when the machine's own canaries
    # moved at least as much as this query (measured over the exact
    # round subset forming this query's baseline, per above), the
    # delta is explained by the environment — clear the flag to ENV so
    # only plan regressions survive as REGRESSION. A query that moved
    # MORE than the canaries keeps its flag, annotated with the
    # measured env share.
    if env_ratio >= ENV_DRIFT_RATIO and ratio <= env_ratio:
        return (
            f"ENV {ratio:.1f}x ~ canary_{env_kind} {env_ratio:.1f}x — "
            f"machine drift, not plan{_window_note(newest, prior, env_kind)}"
        )
    flag = f"REGRESSION {ratio:.1f}x vs best"
    if env_ratio >= ENV_DRIFT_RATIO:
        flag += f" (env {env_kind} {env_ratio:.1f}x slower)"
    return flag


def main() -> None:
    rounds = load_rounds(sys.argv[1:])
    if not rounds:
        print("no BENCH_r*.json found", file=sys.stderr)
        raise SystemExit(1)
    names: list[str] = []
    for q in (n for r in rounds for n in r.queries):
        if q not in names:
            names.append(q)
    width = max(len(n) for n in names)
    header = "  ".join(
        (t.tag + ("*" if t.partial else "")).rjust(8) for t in rounds
    )
    print(f"{'query'.ljust(width)}  {header}  flag")
    newest, prior = rounds[-1], rounds[:-1]
    env_ratio, env_kind = env_drift(newest, prior)
    flagged, noisy, env_cleared = [], [], []
    for n in names:
        flag = flag_for(n, newest, prior, env_ratio, env_kind)
        if flag.startswith("REGRESSION"):
            flagged.append(n)
        elif flag.startswith("NOISY?"):
            noisy.append(n)
        elif flag.startswith("ENV"):
            env_cleared.append(n)
        cells = "  ".join(
            (f"{r.queries[n]:8.3f}" if n in r.queries else "       -")
            for r in rounds
        )
        print(f"{n.ljust(width)}  {cells}  {flag}")
    totals = "  ".join(
        f"{sum(r.queries.values()):8.3f}" for r in rounds
    )
    print(f"{'TOTAL'.ljust(width)}  {totals}")
    for k in _CANARY_KEYS:
        if any(k in r.canaries for r in rounds):
            cells = "  ".join(
                (f"{r.canaries[k]:8.3f}" if k in r.canaries else "       -")
                for r in rounds
            )
            print(f"{k.ljust(width)}  {cells}")
    if env_ratio >= ENV_DRIFT_RATIO:
        print(f"# machine canary_{env_kind} {env_ratio:.1f}x slower than its "
              "best prior — flags within that ratio cleared to ENV",
              file=sys.stderr)
    if any(r.partial for r in rounds):
        print("# * = recovered from truncated stdout tail; query set may be "
              "partial, TOTAL not cross-comparable", file=sys.stderr)
    if flagged:
        print(f"\nflagged: {flagged}")
    if env_cleared:
        print(f"env-cleared (canary explains the delta): {env_cleared}")
    if noisy:
        print(f"noisy (re-run locally to adjudicate): {noisy}")


if __name__ == "__main__":
    main()
