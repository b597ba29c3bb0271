"""Cross-round bench comparison (VERDICT r2 item 5).

Reads every BENCH_r*.json in the repo root plus optional local bench
output files given as arguments, and prints a per-query table of
min-of-round values with a REGRESSION flag for any query whose newest
min exceeds 1.5x its best historical min. Wall clock on this VM swings
2-6x with neighbor I/O; a min that CREEPS UP across rounds is a real
regression, a single max spike is noise (bench.py already records the
full run spread for that distinction).

Usage: python tools/bench_history.py [extra_bench.json ...]
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _queries(doc: dict) -> dict[str, float]:
    """Accept both bench.py's direct output and the driver's BENCH_r*
    wrapper (which nests it under 'parsed')."""
    if "queries" in doc:
        return doc["queries"]
    return doc["parsed"]["queries"]


def load_rounds(extra: list[str]) -> dict[str, dict[str, float]]:
    rounds: dict[str, dict[str, float]] = {}
    # sort by the ROUND NUMBER, not the filename: lexicographically an
    # unpadded BENCH_r2.json would sort after BENCH_r10.json and be
    # treated as newer
    numbered = []
    for p in REPO.glob("BENCH_r*.json"):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", p.name)
        if m:
            numbered.append((int(m.group(1)), p))
    for n, p in sorted(numbered):
        try:
            rounds[f"r{n:02d}"] = _queries(json.loads(p.read_text()))
        except (OSError, ValueError, KeyError) as e:
            print(f"# skipping {p.name}: {e}", file=sys.stderr)
    for i, arg in enumerate(extra):
        try:
            rounds[f"local{i}" if len(extra) > 1 else "local"] = _queries(
                json.loads(Path(arg).read_text())
            )
        except (OSError, ValueError, KeyError) as e:
            print(f"# skipping {arg}: {e}", file=sys.stderr)
    return rounds


def main() -> None:
    rounds = load_rounds(sys.argv[1:])
    if not rounds:
        print("no BENCH_r*.json found", file=sys.stderr)
        raise SystemExit(1)
    tags = list(rounds)
    names: list[str] = []
    for q in (n for r in rounds.values() for n in r):
        if q not in names:
            names.append(q)
    width = max(len(n) for n in names)
    print(f"{'query'.ljust(width)}  " + "  ".join(t.rjust(7) for t in tags) + "  flag")
    flagged = []
    latest = tags[-1]
    for n in names:
        vals = [rounds[t].get(n) for t in tags]
        known = [v for v in vals if v is not None]
        # only a query PRESENT in the true latest round can regress;
        # a last-known value from an older round says nothing about now
        newest = rounds[latest].get(n)
        flag = ""
        if newest is None:
            flag = "absent in latest"
        else:
            prior = [v for t in tags[:-1] if (v := rounds[t].get(n)) is not None]
            best_prior = min(prior) if prior else None
            if best_prior is not None and newest > 1.5 * best_prior:
                flag = f"REGRESSION {newest / best_prior:.1f}x vs best"
                flagged.append(n)
        cells = "  ".join(
            (f"{v:7.3f}" if v is not None else "      -") for v in vals
        )
        print(f"{n.ljust(width)}  {cells}  {flag}")
    totals = "  ".join(
        f"{sum(v for v in rounds[t].values()):7.3f}" for t in tags
    )
    print(f"{'TOTAL'.ljust(width)}  {totals}")
    if flagged:
        print(f"\nflagged: {flagged}")


if __name__ == "__main__":
    main()
