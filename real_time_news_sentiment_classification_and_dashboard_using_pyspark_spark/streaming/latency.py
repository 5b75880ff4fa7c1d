"""Per-micro-batch latency instrumentation (r9 verdict #5).

Throughput (articles/s, bench.py) says nothing about how long one
article WAITS: end-to-end latency = file landed -> sink committed,
which includes trigger queueing — the number a freshness SLA is
written against. This module instruments it two ways:

- ``LatencyListener``: a ``StreamingQueryListener`` capturing every
  micro-batch's engine-side numbers (batchId, input rows,
  ``durationMs`` phases — addBatch, triggerExecution, latestOffset…)
  straight from the progress events, no sink cooperation needed.
- ``measure_e2e_latency``: a closed-loop harness that lands one file
  at a time (recording the land wall-clock), maps each file to the
  micro-batch that consumed it via cumulative input rows, and takes
  commit time = progress.timestamp (trigger start, UTC) +
  triggerExecution — so e2e = commit - land includes the trigger wait
  a real deployment pays. p50/p99 summarized per trigger setting.

The listener is pure observation (addListener/removeListener around
the run); the pipeline under test is the production
``start_pipeline`` fan-out, unchanged.
"""

from __future__ import annotations

import json
import time
from datetime import datetime, timezone

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class LatencyListener(StreamingQueryListener):
    """Collects one dict per micro-batch progress event."""

    def __init__(self) -> None:
        self.progress: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802 (listener API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        # go through the JSON form: stable across pyspark versions and
        # keeps this listener free of JVM-object attribute drift
        p = json.loads(event.progress.json)
        self.progress.append(
            {
                "id": p.get("id"),  # query run id: lets a harness
                # running SEVERAL streams (r11: pipeline + dedup-index
                # fold) attribute batches to the right query
                "batchId": p.get("batchId"),
                "timestamp": p.get("timestamp"),
                "numInputRows": p.get("numInputRows", 0),
                "durationMs": p.get("durationMs", {}),
            }
        )

    def for_query(self, query_id: str) -> list[dict]:
        return [p for p in self.progress if p.get("id") == query_id]

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass


def _parse_ts(ts: str) -> float:
    """Progress timestamps are UTC ISO-8601 (e.g.
    2026-08-15T12:00:00.123Z) -> epoch seconds."""
    return (
        datetime.fromisoformat(ts.replace("Z", "+00:00"))
        .astimezone(timezone.utc)
        .timestamp()
    )


def _pctl(vals: list[float], q: float) -> float:
    """Nearest-rank percentile (deterministic, no interpolation)."""
    if not vals:
        return float("nan")
    s = sorted(vals)
    idx = min(len(s) - 1, max(0, int(round(q * (len(s) - 1)))))
    return s[idx]


def summarize_batches(progress: list[dict]) -> dict:
    """p50/p99 of the engine-side phases over non-empty batches."""
    rows = [p for p in progress if p.get("numInputRows", 0) > 0]
    out: dict[str, float] = {"n_batches": len(rows)}
    for phase in ("addBatch", "triggerExecution"):
        vals = [
            float(p["durationMs"].get(phase, 0)) / 1000.0
            for p in rows
            if phase in p.get("durationMs", {})
        ]
        out[f"{phase}_p50_s"] = round(_pctl(vals, 0.50), 3)
        out[f"{phase}_p99_s"] = round(_pctl(vals, 0.99), 3)
    return out


def measure_e2e_latency(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    *,
    n_files: int = 12,
    rows_per_file: int = 200,
    trigger_seconds: int = 1,
    land_gap_seconds: float = 0.0,
    timeout_seconds: float = 300.0,
    warmup_files: int = 1,
    extra_land=None,
) -> dict:
    """Land ``n_files`` article files one at a time into a LIVE
    processingTime-triggered ``start_pipeline`` query and measure each
    file's end-to-end latency (land wall-clock -> that batch's commit).
    ``warmup_files`` are landed and fully committed FIRST and excluded
    from the percentiles — the first trigger pays one-time stream
    initialization (source listing setup, restart seed, plan compile)
    that would otherwise contaminate every steady-state sample.
    ``extra_land(i)``, if given, is called after each file lands — the
    hook the combined-load harness uses to land the same batch into a
    CONCURRENT stream's input (the dedup-index fold) at the same
    cadence. Returns {"e2e_p50_s", "e2e_p99_s", "e2e_latencies_s",
    engine-side summary, "trigger_seconds"}."""
    import os

    from .pipeline import start_pipeline

    os.makedirs(input_dir, exist_ok=True)
    listener = LatencyListener()
    spark.streams.addListener(listener)
    q = start_pipeline(
        spark,
        input_dir,
        output_dir,
        checkpoint_dir,
        trigger_seconds=trigger_seconds,
    )
    lands: list[tuple[int, float]] = []  # (cumulative_rows, land_time)
    lat: list[float] = []

    def _land(i: int) -> None:
        tmp = os.path.join(input_dir, f".file_{i}.json.tmp")
        with open(tmp, "w") as fh:
            for j in range(rows_per_file):
                fh.write(
                    json.dumps(
                        {
                            "id": f"f{i}_{j}",
                            "title": f"t {i} {j}",
                            "description": f"good news {i} {j}"
                            if j % 2
                            else f"bad news {i} {j}",
                            "url": f"http://x/{i}/{j}",
                            "publishedAt": "2025-11-21T20:06:38Z",
                            "lang": "en",
                            "fetched_at": "2025-11-22T13:52:00.000000",
                        }
                    )
                    + "\n"
                )
        # atomic visibility: the file source must never list a
        # half-written file
        os.rename(tmp, os.path.join(input_dir, f"file_{i}.json"))

    qid = str(q.id)

    def _my_progress() -> list[dict]:
        # only THIS query's batches: a concurrent stream in the same
        # session (the dedup-index fold harness) reports through the
        # same listener and must not inflate the committed-row sum
        return listener.for_query(qid)

    def _wait_committed(rows: int, deadline: float) -> None:
        while time.time() < deadline:
            if sum(p["numInputRows"] for p in _my_progress()) >= rows:
                return
            time.sleep(0.05)
        raise TimeoutError("stream did not drain within timeout")

    try:
        cum = 0
        for i in range(warmup_files):
            _land(i)
            if extra_land is not None:
                extra_land(i)
            cum += rows_per_file
        _wait_committed(cum, time.time() + timeout_seconds)
        land_t0 = time.time()
        for m, i in enumerate(range(warmup_files, warmup_files + n_files)):
            if land_gap_seconds and m:
                # stratified phase jitter (r12 verdict #7): with
                # gap == trigger every land falls at the SAME phase of
                # the trigger cycle, so every sample pays the same
                # queue wait — an arbitrary constant in [0, trigger)
                # set by where the first land happened to fall, which
                # made the reported p50 swing by up to a full trigger
                # between runs. Scheduling land m at
                # t0 + m*gap + m*gap/n_files sweeps the phase across
                # [0, gap) exactly once over the run, so the
                # percentiles converge to the phase-AVERAGED latency
                # (~trigger/2 + processing) — a citable number.
                target = land_t0 + m * land_gap_seconds * (1.0 + 1.0 / n_files)
                delay = target - time.time()
                if delay > 0:
                    time.sleep(delay)
            _land(i)
            if extra_land is not None:
                extra_land(i)
            cum += rows_per_file
            lands.append((cum, time.time()))
        # wait until every landed row is committed
        _wait_committed(cum, time.time() + timeout_seconds)
    finally:
        q.stop()
        spark.streams.removeListener(listener)
    # map each file to the first batch whose cumulative committed rows
    # reach the file's cumulative landed rows
    prog = sorted(_my_progress(), key=lambda p: p["batchId"])
    running = 0
    commits: list[tuple[int, float]] = []  # (cum_rows_through_batch, commit_time)
    for p in prog:
        running += p["numInputRows"]
        commit = _parse_ts(p["timestamp"]) + (
            float(p["durationMs"].get("triggerExecution", 0)) / 1000.0
        )
        commits.append((running, commit))
    for cum_rows, land_t in lands:
        for crows, ctime in commits:
            if crows >= cum_rows:
                lat.append(max(0.0, ctime - land_t))
                break
    out = {
        "trigger_seconds": trigger_seconds,
        "n_files": n_files,
        "rows_per_file": rows_per_file,
        "e2e_p50_s": round(_pctl(lat, 0.50), 3),
        "e2e_p99_s": round(_pctl(lat, 0.99), 3),
        "e2e_latencies_s": [round(v, 3) for v in lat],
    }
    out.update(summarize_batches(_my_progress()))
    return out
