"""Print the driver's 50-entry check window for the CURRENT tree.

The driver verifies the FIRST 50 registry entries each round
(never-checked first, then stalest-verdict-first). Growing the registry
late in a round silently evicts the stalest refresh from the window —
the r11 rule: count the window BEFORE adding an entry.

Usage: python tools/rotation_window.py
"""

from __future__ import annotations

import sys
from collections import Counter
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from etl_dagster_service_crawler_spark.workloads import (  # noqa: E402
    _driver_verdicts,
    registry,
)


def main() -> None:
    reg = registry()
    hash_green, rows_checked, _ = _driver_verdicts(REPO)

    def stamp(n: str):
        return hash_green.get(n) or rows_checked.get(n)

    names = list(reg)
    window, rest = names[:50], names[50:]
    mix = Counter(stamp(n) for n in window)
    print(f"registry: {len(reg)} entries; window mix "
          f"{{round: count}}: {dict(sorted(mix.items(), key=lambda kv: (kv[0] is not None, kv[0])))}")
    never = [n for n in window if stamp(n) is None]
    if never:
        print(f"never-checked in window ({len(never)}): {', '.join(never)}")
    outside = {}
    for n in rest:
        s = stamp(n)
        outside.setdefault(s, []).append(n)
    oldest = min((s for s in outside if s is not None), default=None)
    if oldest is not None:
        print(f"stalest OUTSIDE window: r{oldest} x{len(outside[oldest])}: "
              f"{', '.join(outside[oldest][:10])}")
        slack = 0
    else:
        # how many new entries could be added before evicting the
        # stalest refresh class currently in the window
        in_window_stamps = sorted(s for s in (stamp(n) for n in window)
                                  if s is not None)
        newest = in_window_stamps[-1] if in_window_stamps else None
        slack = sum(1 for s in in_window_stamps if s == newest) if (
            newest is not None and len(set(in_window_stamps)) > 1
        ) else 0
        print("no refresh class outside the window")
    print(f"eviction slack (new entries addable without pushing the "
          f"stalest class out): {slack}")


if __name__ == "__main__":
    main()
