"""Merge a cut-off heavy-tail bench run with its completion leg.

The r11 sf10 heavy-tail bench (SPARK_GRAFT_BENCH_RUNS=3 over the 20 most
expensive registry entries) was killed by its wall-clock guard during the
final entry (``streaming_pipeline``, which ``bench.py`` prices after the
registry loop). Rather than re-pay ~2 h for 19 already-measured medians,
this script rebuilds the one-JSON-line artifact from:

  1. the per-query ``bench <name>: median=..s min=..s`` stderr lines the
     killed run flushed after each query (bench.py prints these exactly so
     a cut-off run stays recoverable — see bench.py run loop), and
  2. the completion leg's JSON (a fresh ``SPARK_GRAFT_BENCH_ONLY=
     streaming_pipeline`` run at the same scale/runs), which contributes
     the streaming row, its throughput fields, and the calibration probe.

The merged artifact is marked ``merged_from`` so it is never mistaken for
a single-process run.

Usage:
  python scripts/merge_heavy_bench.py MEDIANS.txt COMPLETION.json OUT.json
"""

import json
import re
import sys


def main() -> None:
    medians_path, completion_path, out_path = sys.argv[1:4]

    timings: dict[str, float] = {}
    timings_min: dict[str, float] = {}
    pat = re.compile(r"^bench (\S+): median=([\d.]+)s min=([\d.]+)s")
    with open(medians_path) as f:
        for line in f:
            m = pat.match(line.strip())
            if m:
                timings[m.group(1)] = float(m.group(2))
                timings_min[m.group(1)] = float(m.group(3))

    with open(completion_path) as f:
        comp = json.load(f)
    timings.update(comp["queries"])
    timings_min.update(comp.get("queries_min", {}))

    out = {
        "metric": "total_sec_all_queries",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "queries_min": timings_min,
        "runs_per_query": comp["runs_per_query"],
        "calibration_sec": comp["calibration_sec"],
        "calibration_min": comp.get("calibration_min"),
        "sf": comp["sf"],
        "bench_only": sorted(timings),
        "n_queries": len(timings),
        "merged_from": {
            "recovered_stderr_medians": sorted(
                k for k in timings if k not in comp["queries"]
            ),
            "completion_leg": sorted(comp["queries"]),
        },
    }
    for k in (
        "streaming_articles_per_sec",
        "streaming_articles_per_drain",
        "streaming_run_secs",
    ):
        if k in comp:
            out[k] = comp[k]

    with open(out_path, "w") as f:
        json.dump(out, f)
        f.write("\n")
    print(f"wrote {out_path}: {len(timings)} queries, total {out['value']}s")


if __name__ == "__main__":
    main()
