"""Compare two BENCH_SELF-style artifacts query by query.

Usage: python tools/bench_diff.py BEFORE.json AFTER.json [min_sec]

Prints per-query before/after/ratio for queries whose |delta| >= 0.15 s
(or min_sec), plus family and total summaries.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    before = json.load(open(sys.argv[1]))["queries"]
    after_doc = json.load(open(sys.argv[2]))
    after = after_doc["queries"]
    min_sec = float(sys.argv[3]) if len(sys.argv) > 3 else 0.15
    common = sorted(set(before) & set(after))
    rows = []
    for n in common:
        d = after[n] - before[n]
        if abs(d) >= min_sec:
            rows.append((d, n))
    rows.sort()
    print(f"{'query':42} {'before':>7} {'after':>7} {'ratio':>6}")
    for d, n in rows:
        r = after[n] / before[n] if before[n] else float("inf")
        print(f"{n:42} {before[n]:7.2f} {after[n]:7.2f} {r:6.2f}")
    tb = sum(before[n] for n in common)
    ta = sum(after[n] for n in common)
    print(
        f"\ncommon {len(common)} queries: {tb:.1f} -> {ta:.1f} s "
        f"(ratio {ta / tb:.3f}); improved>=0.15s: "
        f"{sum(1 for d, _ in rows if d < 0)}, regressed: "
        f"{sum(1 for d, _ in rows if d > 0)}"
    )
    only_after = set(after) - set(before)
    if only_after:
        print(f"new queries: {sorted(only_after)}")


if __name__ == "__main__":
    main()
