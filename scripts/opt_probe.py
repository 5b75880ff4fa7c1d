"""Per-query optimization probe (r13): time one or more registered
queries with the noop sink (guide §1.4) and optionally dump their
``explain("formatted")`` to plans/r14/<query>_<tag>.txt.

Usage:
    python scripts/opt_probe.py q1,q2 [--runs 3] [--plan before|after]
        [--sf-dir /root/testdata/sf0.1]

Prints one line per query: median/min/all timings. Jobs are labelled
(guide §1.5) so a UI/eventlog session can attribute stages.
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark import (  # noqa: E402
    clear_caches,
    get_spark,
)
from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans import (  # noqa: E402
    REGISTRY,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", help="comma-separated registry names")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plan", default=None, help="tag: write plans/r14/<q>_<tag>.txt")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    spark = get_spark("opt-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py so first-query machinery costs don't land
    # on the probed query
    spark.range(1000).selectExpr("sum(id)").collect()
    width = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    (
        spark.range(256)
        .repartition(width)
        .mapInPandas(lambda it: it, schema="id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    from pyspark.sql import functions as F

    (
        spark.range(10000)
        .repartition(width)
        .groupBy((F.col("id") % 7).alias("k"))
        .count()
        .join(F.broadcast(spark.range(7).withColumnRenamed("id", "k")), "k")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14"
    )
    for name in args.queries.split(","):
        name = name.strip()
        q = REGISTRY[name]
        secs = []
        for _ in range(args.runs):
            clear_caches(spark)
            gc.collect()
            spark.sparkContext.setJobDescription(f"probe:{name}")
            t0 = time.time()
            q.fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            secs.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        secs_sorted = sorted(secs)
        print(
            f"probe {name}: median={secs_sorted[len(secs) // 2]}s "
            f"min={secs_sorted[0]}s all={secs}",
            flush=True,
        )
        if args.plan:
            os.makedirs(plans_dir, exist_ok=True)
            clear_caches(spark)
            df = q.fn(spark, args.sf_dir)
            out = os.path.join(plans_dir, f"{name}_{args.plan}.txt")
            with open(out, "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                ))
            print(f"plan -> {out}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
