"""Measure the merge-on-read store's LSM fold at scale shape
(r7 verdict #6): chain appends over a real corpus until accumulated
distinct overrides cross the half-base trigger, recording per append

- wall seconds,
- NEW bytes written (files with st_nlink == 1 after the rename — a
  hard-linked reuse of base/prior-generation files has nlink >= 2
  while its predecessor store exists),
- whether the fold fired (kept_over folded away),
- read-side cost of the logical kept (resolve_kept scan+merge,
  timed as a count over the exploded relation so the merge actually
  executes).

Usage:  python scripts/measure_compaction.py [sf_dir] [n_slices] [max_appends]

Prints one JSON line per append plus a trailing summary line; the
PERF.md compaction table is produced from this output.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F  # noqa: E402

from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark import (  # noqa: E402
    get_spark,
)


def new_bytes(path: str) -> int:
    total = 0
    for r, _, fs in os.walk(path):
        for f in fs:
            st = os.stat(os.path.join(r, f))
            if st.st_nlink == 1:
                total += st.st_size
    return total


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_slices = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    max_appends = int(sys.argv[3]) if len(sys.argv) > 3 else n_slices
    work = tempfile.mkdtemp(prefix="compact_meas_")
    os.environ["SPARK_GRAFT_SHINGLE_DIR"] = os.path.join(work, "stores")
    spark = get_spark("measure-compaction")
    spark.sparkContext.setLogLevel("ERROR")
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.dedup_queries import (
        append_to_shingle_artifact,
        build_shingle_artifact,
        resolve_kept,
        spark_toks,
    )

    try:
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        cut = docs.selectExpr(
            "percentile_cont(0.5) WITHIN GROUP (ORDER BY doc_id) p"
        ).head()["p"]
        base_dir = os.path.join(work, "sf_base")
        os.makedirs(base_dir)
        docs.filter(F.col("doc_id") <= cut).write.parquet(
            f"{base_dir}/documents.parquet"
        )
        t0 = time.time()
        store = build_shingle_artifact(spark, base_dir)
        build_s = time.time() - t0
        n_base = spark.read.parquet(os.path.join(store, "kept")).count()
        print(
            json.dumps(
                {"stage": "base_build", "sec": round(build_s, 2), "n_kept": n_base}
            ),
            flush=True,
        )

        rest = (
            docs.filter(F.col("doc_id") > cut)
            .select("doc_id", "text", F.expr(spark_toks("text")).alias("toks"))
            .withColumn("slice", F.ntile(n_slices).over(Window.orderBy("doc_id")))
        ).cache()

        def read_cost(path: str) -> float:
            t = time.time()
            resolve_kept(spark, path).select(
                F.explode("sh_arr")
            ).count()
            return time.time() - t

        print(
            json.dumps(
                {"stage": "read_pre_appends", "sec": round(read_cost(store), 2)}
            ),
            flush=True,
        )
        for k in range(1, min(n_slices, max_appends) + 1):
            b = rest.filter(F.col("slice") == k)
            delta = b.select("doc_id", "text").unionByName(
                b.select(
                    (F.col("doc_id") + 1000000).alias("doc_id"),
                    F.array_join(
                        F.expr("slice(toks, 1, greatest(size(toks) - 5, 1))"),
                        " ",
                    ).alias("text"),
                )
            )
            out = os.path.join(work, f"app{k}")
            t0 = time.time()
            store = append_to_shingle_artifact(spark, store, delta, out)
            wall = time.time() - t0
            over = os.path.join(store, "kept_over")
            folded = not os.path.isdir(over)
            gens = (
                sorted(
                    int(e.split("=")[1])
                    for e in os.listdir(over)
                    if e.startswith("gen=")
                )
                if not folded
                else []
            )
            print(
                json.dumps(
                    {
                        "stage": f"append_{k}",
                        "sec": round(wall, 2),
                        "new_mb": round(new_bytes(store) / 1e6, 2),
                        "folded": folded,
                        "gens": gens,
                        "read_sec": round(read_cost(store), 2),
                    }
                ),
                flush=True,
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
