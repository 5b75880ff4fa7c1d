"""Scaling-slope report: compare two bench JSON artifacts (e.g. sf0.1
vs sf1) and print the per-query time ratio against the data ratio.

    python scripts/bench_slope.py BENCH_small.json BENCH_big.json [data_ratio]

For each query present in both artifacts prints
``name  t_small  t_big  ratio  verdict`` where the verdict buckets the
ratio against the data ratio (default 10):

- ``sub``      ratio <= 0.6 * data_ratio  (fixed overhead dominates /
               sub-linear plan, e.g. broadcast-dim or top-K shapes)
- ``linear``   ratio <= 1.2 * data_ratio
- ``SUPER``    ratio  > 1.2 * data_ratio  (diagnose or fix — the r5
               verdict's threshold for an sf1 run is 12x for 10x data)

Small absolute times are noise-flagged: a query under 0.3 s in the
small artifact can triple on scheduler jitter alone, so its verdict is
suffixed ``(noisy-base)`` instead of being treated as a finding.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    data_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qs, qb = small["queries"], big["queries"]
    rows = []
    for name in qs:
        if name not in qb:
            continue
        a, b = qs[name], qb[name]
        ratio = b / a if a > 0 else float("inf")
        rows.append((ratio, name, a, b))
    rows.sort(reverse=True)
    n_super = 0
    print(f"{'query':42s} {'t_small':>8s} {'t_big':>8s} {'ratio':>7s}  verdict")
    for ratio, name, a, b in rows:
        if ratio <= 0.6 * data_ratio:
            v = "sub"
        elif ratio <= 1.2 * data_ratio:
            v = "linear"
        else:
            v = "SUPER"
            n_super += 1
        noisy = " (noisy-base)" if a < 0.3 else ""
        print(f"{name:42s} {a:8.3f} {b:8.3f} {ratio:7.2f}  {v}{noisy}")
    supers = [r for r in rows if r[0] > 1.2 * data_ratio and r[2] >= 0.3]
    print(
        f"\n{len(rows)} shared queries; data ratio {data_ratio}; "
        f"{n_super} above 1.2x data ratio, {len(supers)} of them with a "
        f"non-noisy base"
    )
    for ratio, name, a, b in supers:
        print(f"  DIAGNOSE: {name} {a:.3f}s -> {b:.3f}s ({ratio:.1f}x)")


if __name__ == "__main__":
    main()
