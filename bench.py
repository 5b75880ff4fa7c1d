"""Benchmark harness: runs every registered query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

Also measures streaming throughput (articles/s through the full
clean->score->classify DAG with an availableNow trigger) as the
``streaming_pipeline`` entry — the reference's equivalent ceiling is
<= 1 article/s (BASELINE.md), set by API quota rather than compute.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark import (  # noqa: E402
    clear_caches,
    get_spark,
)
from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans import (  # noqa: E402
    REGISTRY,
)


def bench_streaming(
    spark, sf_dir: str, replicate: int = 5, runs: int = 3
) -> tuple[float, int, list[float]]:
    """Time the streaming pipeline draining the documents table rendered
    as article NDJSON, replicated ``replicate``x so the fixed ~2 s query
    startup (checkpoint init, file listing, sink commit) is amortized
    over real per-row work instead of dominating a short drain. The
    drain runs ``runs`` times against fresh checkpoints; the reported
    number is the MEDIAN run — single-run streaming numbers on this DAG
    swing +-40% (r3 postmortem), medians don't.

    Returns (median_seconds, n_articles_per_drain, all_run_seconds)."""
    from pyspark.sql import functions as F

    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.sources.tables import (
        table,
    )
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.streaming import (
        start_pipeline,
    )

    tmp = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        docs = table(spark, sf_dir, "documents")
        n = docs.count() * replicate
        (
            docs.crossJoin(
                spark.range(replicate).select(F.col("id").alias("rep"))
            )
            .select(
                F.concat_ws("_", F.col("doc_id").cast("string"), F.col("rep")).alias(
                    "id"
                ),
                F.lit("title").alias("title"),
                F.col("text").alias("description"),
                F.lit(None).cast("string").alias("url"),
                F.lit("2025-11-21T20:06:38Z").alias("publishedAt"),
                F.col("lang"),
                F.lit("2025-11-22T13:52:36.569054").alias("fetched_at"),
            )
            .repartition(32)
            .write.mode("overwrite")
            .json(f"{tmp}/input")
        )
        # one UNTIMED warm drain: the first streaming query of a session
        # pays stream-side codegen + state-store + sink-commit warmup the
        # timed runs should not (r4 artifact: first drain 10.78s vs 6.8s
        # steady — a 57% outlier the median hid but the spread showed)
        warm_q = start_pipeline(
            spark,
            f"{tmp}/input",
            f"{tmp}/out_warm",
            f"{tmp}/ckpt_warm",
            available_now=True,
        )
        if not warm_q.awaitTermination(600):
            # a stalled warm drain must not keep running under the
            # timed drains — stop it and fail loudly rather than
            # publish numbers inflated by a concurrent query
            warm_q.stop()
            raise RuntimeError("warm streaming drain did not finish in 600s")
        secs: list[float] = []
        for i in range(runs):
            t0 = time.time()
            q = start_pipeline(
                spark,
                f"{tmp}/input",
                f"{tmp}/out{i}",
                f"{tmp}/ckpt{i}",
                available_now=True,
            )
            if not q.awaitTermination(600):
                q.stop()
                raise RuntimeError(f"streaming drain {i} did not finish in 600s")
            secs.append(round(time.time() - t0, 3))
        return sorted(secs)[len(secs) // 2], n, secs
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import re

    # "sf0.1" but also "testdata_sf1" (locally generated scale-ups)
    m = re.search(r"sf([0-9.]+)$", os.path.basename(sf_dir.rstrip("/")))
    sf = float(m.group(1)) if m else 0.1
    # Fail fast on garbage BEFORE paying Spark startup, clamp to >= 1
    # (ADVICE r10): '0'/negative used to produce an empty runs list and
    # crash at runs[0] only after the full session came up.
    _runs_raw = os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")
    try:
        runs_per_query = max(1, int(_runs_raw))
    except ValueError:
        sys.exit(f"SPARK_GRAFT_BENCH_RUNS={_runs_raw!r} is not an integer")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup outside timing — the first query of a session otherwise
    # pays one-time machinery costs the steady state never sees (r4:
    # judge measured 16.7s first run vs 4.4s steady on whichever query
    # happened to run first). Three warm passes:
    # 1. JVM + codegen
    spark.range(1000).selectExpr("sum(id)").collect()
    # 2. Python worker pool + Arrow path, one worker per core
    width = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    (
        spark.range(256)
        .repartition(width)
        .mapInPandas(lambda it: it, schema="id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    # 3. shuffle + broadcast-join + parquet-write machinery (exchange
    #    threads, compression codecs, output committer) — measured ~4s
    #    landing on the session's first shuffling query when skipped
    from pyspark.sql import functions as F  # noqa: N812

    warm_dir = tempfile.mkdtemp(prefix="bench_warm_")
    try:
        (
            spark.range(10000)
            .repartition(width)
            .groupBy((F.col("id") % 7).alias("k"))
            .count()
            .join(F.broadcast(spark.range(7).withColumnRenamed("id", "k")), "k")
            .write.mode("overwrite")
            .parquet(f"{warm_dir}/p")
        )
        spark.read.parquet(f"{warm_dir}/p").write.format("noop").mode(
            "overwrite"
        ).save()
    finally:
        shutil.rmtree(warm_dir, ignore_errors=True)

    def run_once(q) -> float:
        # cold per query: without this, plan-keyed cache hits make each
        # number depend on which cache-sharing sibling ran earlier, and
        # round-over-round deltas stop being attributable
        clear_caches(spark)
        t0 = time.time()
        # noop-format write = full materialization JVM-side; the former
        # .foreach(lambda _: None) shipped every result row through
        # Python workers and billed the harness cost to the query
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    def calibration_probe() -> float:
        """A FIXED, IO-free shuffle+join+agg workload timed like a
        query — the host-speed yardstick embedded in every artifact.
        The r7 closing bench read 1.5x worse than r6 purely from host
        drift and the judge had to re-measure queries by hand to
        adjudicate (r7 verdict #1); dividing any two rounds'
        ``calibration_sec`` normalizes their per-query numbers without
        re-measurement. spark.range input: no parquet, no page cache,
        no file-listing variance — only JVM/shuffle/CPU speed."""
        t0 = time.time()
        (
            spark.range(4_000_000)
            .repartition(width)
            .groupBy((F.col("id") % 10007).alias("k"))
            .agg(
                F.sum("id").alias("s"),
                F.count(F.lit(1)).alias("c"),
                F.avg(F.col("id") % 97).alias("a"),
            )
            .join(
                F.broadcast(
                    spark.range(10007).withColumnRenamed("id", "k")
                ),
                "k",
            )
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        return time.time() - t0

    # MEDIAN-OF-3 for EVERY query, min recorded alongside (r7 verdict
    # #1): the old >1.5s-only rerun policy left sub-second entries
    # carrying raw single-run noise — nation_supplier_roster printed
    # 1.40s on the busy closing host vs the judge's 0.42s median.
    # SPARK_GRAFT_BENCH_RUNS overrides for the extra-scale (sf10)
    # sweeps, where 3x the full registry would blow the wall-clock
    # budget; the artifact records the value so a 1-run measurement is
    # never mistaken for a median.
    # runs_per_query parsed/clamped at the top of main(), before Spark
    # startup (ADVICE r10).
    # SPARK_GRAFT_BENCH_ONLY=q1,q2,... restricts the run to a curated
    # subset — used for the extra-scale (sf10) measurements where a
    # handful of eval harnesses (exact-ground-truth recall arms,
    # all-pairs block grids) are deliberately quadratic and priced
    # separately. Unset = the full registry, unchanged.
    only_env = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").strip()
    only = {s.strip() for s in only_env.split(",") if s.strip()} if only_env else None
    timings: dict[str, float] = {}
    timings_min: dict[str, float] = {}
    import gc

    for name, q in REGISTRY.items():
        if only is not None and name not in only:
            continue
        runs = sorted(run_once(q) for _ in range(runs_per_query))
        timings[name] = round(runs[len(runs) // 2], 3)
        timings_min[name] = round(runs[0], 3)
        # stderr progress (stdout stays the one-JSON-line contract):
        # long extra-scale runs are otherwise a black box, and a crash
        # (e.g. the sf10 heap OOM this line was added for) must be
        # attributable to a query.
        print(
            f"bench {name}: median={timings[name]}s min={timings_min[name]}s",
            file=sys.stderr,
            flush=True,
        )
        # Isolate queries from each other's leftovers: dropping the
        # dead py4j DataFrame refs promptly lets ContextCleaner release
        # localCheckpoint blocks / broadcasts / shuffle files between
        # queries instead of mid-measurement — without this, the r9
        # closing run showed the dedup pair family 1.5-3x slower deep
        # into the 164-query session than in isolation, with a clean
        # calibration probe (not host noise; accumulated session state).
        gc.collect()

    cal_runs = sorted(calibration_probe() for _ in range(runs_per_query))

    if only is None or "streaming_pipeline" in only:
        stream_sec, n_articles, stream_runs = bench_streaming(
            spark, sf_dir, runs=runs_per_query
        )
        timings["streaming_pipeline"] = round(stream_sec, 3)
        timings_min["streaming_pipeline"] = round(min(stream_runs), 3)
    else:
        stream_sec, n_articles, stream_runs = None, 0, []

    total = round(sum(timings.values()), 3)
    full_payload = {
        "metric": "total_sec_all_queries",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_min": timings_min,
        "runs_per_query": runs_per_query,
        "calibration_sec": round(cal_runs[len(cal_runs) // 2], 3),
        "calibration_min": round(cal_runs[0], 3),
        "sf": sf,
        **(
            {
                "streaming_articles_per_sec": round(
                    n_articles / stream_sec, 1
                ),
                "streaming_articles_per_drain": n_articles,
                "streaming_run_secs": stream_runs,
            }
            if stream_sec is not None
            else {"bench_only": sorted(only)}
        ),
        "n_queries": len(timings),
    }
    print(json.dumps(full_payload))
    # The driver records only a bounded tail of stdout, so a 175-entry
    # "queries" map can be cut mid-JSON (BENCH_r11.json: parsed=null,
    # 59/175 entries survived). Two mitigations (VERDICT r11 #2,
    # revised per VERDICT r13 #1):
    #  1. Persist the complete payload to a PER-RUN file next to
    #     bench.py (keyed on core count so an 8-core scaling run no
    #     longer clobbers the 32-core record — r13 lost its only full
    #     32-core payload that way). BENCH_last_full.json is still
    #     written for tooling that reads the fixed name.
    #  2. Emit a second, compact JSON line AFTER the full line —
    #     carrying the FULL per-query medians map under "queries"
    #     (VERDICT r13 #1: the driver's round-over-round comparator
    #     reads "queries" from the compact line; it now spans the whole
    #     registry, so summing it IS the total) plus "queries_top20"
    #     for display.
    per_run_name = f"BENCH_full_c{width}.json"
    for fname in (per_run_name, "BENCH_last_full.json"):
        try:
            with open(
                os.path.join(
                    os.path.dirname(os.path.abspath(__file__)), fname
                ),
                "w",
            ) as fh:
                json.dump(full_payload, fh)
                fh.write("\n")
        except OSError as exc:  # read-only checkout: keep stdout contract
            print(
                f"bench: could not persist full payload to {fname}: {exc}",
                file=sys.stderr,
            )
    top20 = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:20]
    )
    print(
        json.dumps(
            {
                "metric": "bench_summary_compact",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_queries": len(timings),
                "runs_per_query": runs_per_query,
                "calibration_sec": full_payload["calibration_sec"],
                "queries": timings,
                "queries_top20": top20,
                **(
                    {
                        "streaming_articles_per_sec": full_payload[
                            "streaming_articles_per_sec"
                        ]
                    }
                    if stream_sec is not None
                    else {}
                ),
                "full_payload_file": per_run_name,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
