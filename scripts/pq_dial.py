"""Price the Lloyd-PQ dial (r8 verdict #3): recall@5 per query and
engine wall seconds across the (k, iters, shortlist) grid, on the
standard corpus and the adversarial hard fixture. Emits the PERF.md
markdown table. Usage: python scripts/pq_dial.py [sf_dir ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark import (  # noqa: E402
    get_spark,
)
from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.similarity_queries import (  # noqa: E402
    _emb,
    _pq_lloyd_codebook,
    _pq_lloyd_codes_qdist,
    cosine,
)

GRID = [
    # (k, iters, shortlist-or-None=scale-adaptive)
    (64, 0, None),
    (64, 1, None),
    (64, 2, None),   # <- the registered point
    (64, 3, None),
    (32, 2, None),
    (64, 2, 40),
    (64, 2, 128),
]


def recall_at(spark, sf_dir, k, iters, sl):
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.similarity_queries import (
        _pq_lloyd_shortlist_depth,
    )

    e = _emb(spark, sf_dir)
    if sl is None:
        sl = _pq_lloyd_shortlist_depth(e.filter(F.col("vec_id") >= 3).count())
    t0 = time.time()
    cent = _pq_lloyd_codebook(spark, sf_dir, k=k, iters=iters)
    codes, qdist = _pq_lloyd_codes_qdist(spark, sf_dir, cent)
    adc = (
        codes.join(F.broadcast(qdist), ["s", "cid"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d").cast("bigint").alias("adc_d"))
    )
    aw = Window.partitionBy("query_id").orderBy(F.asc("adc_d"), F.asc("neighbor_id"))
    short = adc.withColumn("arank", F.row_number().over(aw)).filter(F.col("arank") <= sl)
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    c = e.filter(F.col("vec_id") >= 3).select(
        F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("cemb")
    )
    ew = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(cosine(F.col("qemb"), F.col("cemb")), 6)), F.asc("neighbor_id")
    )
    exact5 = (
        c.crossJoin(F.broadcast(q))
        .withColumn("rk", F.row_number().over(ew))
        .filter(F.col("rk") <= 5)
        .select("query_id", "neighbor_id")
    )
    rows = (
        exact5.join(short.select("query_id", "neighbor_id", F.lit(1).alias("hit")),
                    ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.round(F.count("hit") / 5.0, 2).alias("r"))
        .collect()
    )
    secs = time.time() - t0
    return sl, {r["query_id"]: r["r"] for r in rows}, secs


def main():
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "testdata_hard"]
    spark = get_spark("pq-dial")
    spark.sparkContext.setLogLevel("ERROR")
    print("| corpus | k | iters | shortlist | q0 | q1 | q2 | min | secs |")
    print("|---|---|---|---|---|---|---|---|---|")
    for d in dirs:
        for k, iters, sl in GRID:
            slv, rec, secs = recall_at(spark, d, k, iters, sl)
            mark = " **(registered)**" if (k, iters, sl) == (64, 2, None) else ""
            print(
                f"| {d.rstrip('/').split('/')[-1]}{mark} | {k} | {iters} | {slv} "
                f"| {rec.get(0)} | {rec.get(1)} | {rec.get(2)} "
                f"| {min(rec.values())} | {secs:.1f} |",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
