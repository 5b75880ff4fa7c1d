"""Streaming latency at sf1 input volume WITH the dedup-index fold
running (r10 verdict #6).

The r10 latency datasheet measured the sentiment pipeline alone at
fixture scale. This harness repeats it at sf1 article volume — 50k
rows landed as 25 x 2,000-row files — while a SECOND stream (the
r11-GC'd dedup-index fold) ingests the same batches concurrently at
the same cadence, so the numbers price the full production topology:
score+fan-out latency under co-resident store-maintenance load, plus
the fold's own per-batch cost ("the fold's share").

Writes one JSON artifact:
  {"settings": [{trigger_seconds, e2e_p50_s, e2e_p99_s, ...,
                 fold: {addBatch_p50_s, addBatch_p99_s, n_batches}}]}

Usage: python scripts/latency_sf1.py OUT.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark import (  # noqa: E402
    get_spark,
)
from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.streaming import (  # noqa: E402
    start_dedup_index_stream,
)
from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.streaming.latency import (  # noqa: E402
    LatencyListener,
    measure_e2e_latency,
    summarize_batches,
)

N_FILES = 25
ROWS_PER_FILE = 2000  # 25 x 2000 = 50k rows = the sf1 documents count


def _land_docs_parquet(fold_in: str, i: int, rows: int) -> None:
    """Parquet (doc_id, text) twin of the landed article file — written
    with pyarrow (no Spark job on the landing path) and made visible
    atomically, mirroring the article landers."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ids = [i * rows + j for j in range(rows)]
    texts = [
        (f"good news {i} {j}" if j % 2 else f"bad news {i} {j}")
        + " the quick brown fox jumps over the lazy dog"
        for j in range(rows)
    ]
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    tmp = os.path.join(fold_in, f".docs_{i}.parquet.tmp")
    pq.write_table(t, tmp)
    os.rename(tmp, os.path.join(fold_in, f"docs_{i}.parquet"))


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "LATENCY_sf1.json"
    spark = get_spark("latency-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    # burst mode (gap=0): all 50k rows land as fast as the disk allows
    # and the stream drains them in 2-3 big batches — the backlog
    # catch-up number. steady mode (gap=trigger): one file per trigger,
    # the per-batch freshness-SLA number.
    for trig, gap in [(1, 0.0), (5, 0.0), (1, 1.0), (5, 5.0)]:
        work = tempfile.mkdtemp(prefix=f"latency_sf1_t{trig}g{int(gap)}_")
        dirs = {k: os.path.join(work, k) for k in
                ("in", "out", "ckpt", "fold_in", "store", "fold_ckpt")}
        for d in dirs.values():
            os.makedirs(d, exist_ok=True)
        fold_listener = LatencyListener()
        spark.streams.addListener(fold_listener)
        fold_q = start_dedup_index_stream(
            spark,
            dirs["fold_in"],
            dirs["store"],
            dirs["fold_ckpt"],
            trigger_seconds=trig,
            gc_keep_last=2,
            # r12: merge + compaction run as background maintenance
            # (merge_every cadence, absorbed by hard-link grafting) —
            # the foreachBatch critical path is pure O(delta)
            # (r11 verdict #4/#5)
            merge_every=8,
            async_maintenance=True,
        )
        try:
            r = measure_e2e_latency(
                spark,
                dirs["in"],
                dirs["out"],
                dirs["ckpt"],
                n_files=N_FILES,
                rows_per_file=ROWS_PER_FILE,
                trigger_seconds=trig,
                land_gap_seconds=gap,
                timeout_seconds=1800.0,
                extra_land=lambda i: _land_docs_parquet(
                    dirs["fold_in"], i, ROWS_PER_FILE
                ),
            )
            # let the fold drain whatever is still queued, bounded
            import time

            deadline = time.time() + 600
            fold_id = str(fold_q.id)
            while time.time() < deadline:
                committed = sum(
                    p["numInputRows"]
                    for p in fold_listener.for_query(fold_id)
                )
                if committed >= (N_FILES + 1) * ROWS_PER_FILE:
                    break
                time.sleep(0.5)
            r["fold"] = summarize_batches(fold_listener.for_query(fold_id))
            r["fold"]["rows_committed"] = sum(
                p["numInputRows"] for p in fold_listener.for_query(fold_id)
            )
        finally:
            fold_q.stop()
            # quiesce the background maintenance worker BEFORE deleting
            # the store — a mid-merge job holds open reads on its
            # snapshot (a failed refresh is harmless, so swallow it
            # here; the numbers above already include its load)
            from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.streaming import (
                wait_maintenance,
            )

            try:
                wait_maintenance(dirs["store"], 600)
            except Exception as exc:
                print(f"maintenance job surfaced: {exc!r}", file=sys.stderr)
            spark.streams.removeListener(fold_listener)
            shutil.rmtree(work, ignore_errors=True)
        r["land_gap_seconds"] = gap
        print(json.dumps(r), flush=True)
        results.append(r)
    artifact = {
        "generated_by": "scripts/latency_sf1.py",
        "volume": f"{N_FILES} files x {ROWS_PER_FILE} rows = "
        f"{N_FILES * ROWS_PER_FILE} articles (sf1 documents volume)",
        "concurrent": "dedup-index fold stream (gc_keep_last=2, "
        "merge_every=8 + async_maintenance: merges/compaction off the "
        "foreachBatch critical path, r12) ingesting the same batches",
        "settings": results,
    }
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1)
        fh.write("\n")
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
