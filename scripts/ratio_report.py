"""Per-query scaling-slope report between two bench JSON artifacts.

Usage:
    python scripts/ratio_report.py BENCH_small.json BENCH_large.json [K]

Prints every query present in BOTH artifacts with its small/large
median seconds and the large/small ratio, sorted by ratio descending,
plus a summary (total ratio, count above the linear envelope). K is
the data-volume multiple between the two artifacts (default 10); a
query whose time ratio exceeds ~1.2*K is flagged ``SUPRA`` — the
"blowup" threshold the r9 verdict set at ~12x for a 10x step.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    small_path, large_path = sys.argv[1], sys.argv[2]
    k = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    small = json.load(open(small_path))
    large = json.load(open(large_path))
    sq, lq = small["queries"], large["queries"]
    shared = sorted(set(sq) & set(lq))
    rows = []
    for name in shared:
        a, b = sq[name], lq[name]
        ratio = (b / a) if a > 0 else float("inf")
        rows.append((ratio, name, a, b))
    rows.sort(reverse=True)
    flagged = 0
    print(f"{'query':44s} {'small_s':>8s} {'large_s':>8s} {'ratio':>7s}")
    for ratio, name, a, b in rows:
        mark = ""
        if ratio > 1.2 * k and b > 2.0:  # ignore sub-2s noise blowups
            mark = "  SUPRA"
            flagged += 1
        print(f"{name:44s} {a:8.2f} {b:8.2f} {ratio:7.2f}{mark}")
    ts, tl = sum(sq[n] for n in shared), sum(lq[n] for n in shared)
    print(
        f"\nshared={len(shared)} total {ts:.1f}s -> {tl:.1f}s "
        f"(ratio {tl / ts:.2f}x for {k:.0f}x data); "
        f"SUPRA(>{1.2 * k:.0f}x and >2s): {flagged}"
    )


if __name__ == "__main__":
    main()
