"""Bench the streaming dedup-index fold at maxFilesPerTrigger=1 over
>= 32 micro-batches, with the r11 generation GC + periodic compaction
enabled (r10 verdict #3's "done" criterion).

Lands the sf0.1 dedup corpus as N single-batch parquet files, drains
them through ``start_dedup_index_stream`` (availableNow, one file per
micro-batch), times EVERY fold, and writes one JSON artifact with the
per-batch series, the compaction batches called out, and the
end-state directory/file counts that prove the GC bounds growth.

Usage:
    python scripts/bench_dedup_index_fold.py OUT.json [sf_dir] [n_batches]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark import (  # noqa: E402
    get_spark,
)
from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.dedup_queries import (  # noqa: E402
    _corpus,
)
from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.streaming import (  # noqa: E402
    current_store_path,
    start_dedup_index_stream,
)
from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.streaming import (  # noqa: E402
    dedup_index as di,
)

GC_KEEP_LAST = 2
COMPACT_EVERY = 8


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_dedup_fold.json"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    import tempfile

    spark = get_spark("dedup-fold-bench")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="dedup_fold_bench_")
    inp = os.path.join(work, "in")
    root = os.path.join(work, "store")
    ckpt = os.path.join(work, "ckpt")

    docs = _corpus(spark, sf_dir).selectExpr(
        "doc_id", "concat_ws(' ', toks) AS text"
    )
    # one parquet file per future micro-batch
    docs.repartition(n_batches).write.parquet(inp)

    # time every fold by wrapping the module fanout factory
    timings: list[dict] = []
    orig_fanout = di.dedup_index_fanout

    def timed_fanout(store_root, **kw):
        inner = orig_fanout(store_root, **kw)

        def process(batch_df, batch_id):
            t0 = time.time()
            inner(batch_df, batch_id)
            timings.append(
                {
                    "batch": batch_id,
                    "secs": round(time.time() - t0, 2),
                    "compacted": bool(
                        COMPACT_EVERY
                        and batch_id > 0
                        and batch_id % COMPACT_EVERY == 0
                    ),
                }
            )

        return process

    di.dedup_index_fanout = timed_fanout
    try:
        t_all = time.time()
        q = start_dedup_index_stream(
            spark,
            inp,
            root,
            ckpt,
            available_now=True,
            max_files_per_trigger=1,
            gc_keep_last=GC_KEEP_LAST,
            compact_every=COMPACT_EVERY,
        )
        q.awaitTermination(3600)
        total = round(time.time() - t_all, 2)
    finally:
        di.dedup_index_fanout = orig_fanout

    gens = sorted(
        e for e in os.listdir(root) if e.startswith("gen") and e != "gen_init"
    )
    cur = current_store_path(root)
    n_files = sum(len(files) for _, _, files in os.walk(cur))
    du_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, files in os.walk(root)
        for f in files
    )
    fold_secs = [t["secs"] for t in timings if not t["compacted"]]
    artifact = {
        "generated_by": "scripts/bench_dedup_index_fold.py",
        "sf_dir": sf_dir,
        "n_batches": n_batches,
        "max_files_per_trigger": 1,
        "gc_keep_last": GC_KEEP_LAST,
        "compact_every": COMPACT_EVERY,
        "total_secs": total,
        "fold_median_secs": sorted(fold_secs)[len(fold_secs) // 2],
        "fold_first5": fold_secs[:5],
        "fold_last5": fold_secs[-5:],
        "surviving_generations": gens,
        "current_store_files": n_files,
        "store_root_bytes": du_bytes,
        "per_batch": timings,
    }
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1)
        fh.write("\n")
    print(json.dumps({k: v for k, v in artifact.items() if k != "per_batch"}))
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
