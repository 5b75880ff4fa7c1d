"""Serving layer — everything the reference's Streamlit dashboard
computes (streamlit_app.py:159-359), as Spark queries that collect only
final small aggregates.

The reference's dashboard IS its ad-hoc query engine: union, dedup,
group-by, mean/max, histogram, top-K all run in pandas on the full
dataset per 10 s refresh (SURVEY §3.3). Here the engine does the query
work; a renderer (Streamlit or anything else) receives a small dict of
plain Python values. Collected volumes are O(classes + bins + K) —
independent of corpus size, so the same code serves a 100 TB table.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


# Auto-refresh contract (reference parity: streamlit_app.py:51-57 slider
# + :362-364 sleep/rerun loop): the renderer picks an interval on the
# reference's 5-60 s range; the SAME value drives both the metrics-cache
# TTL bucket and the rerun sleep, so data freshness and page refresh
# can't drift apart.
REFRESH_MIN_S, REFRESH_MAX_S, REFRESH_DEFAULT_S = 5, 60, 10


def refresh_interval(seconds: int | None = None) -> int:
    """Clamp a requested auto-refresh interval to the reference's slider
    range; ``None`` means the reference's 10 s default."""
    if seconds is None:
        return REFRESH_DEFAULT_S
    return max(REFRESH_MIN_S, min(REFRESH_MAX_S, int(seconds)))


def refresh_cache_bucket(interval_s: int, now_s: float) -> int:
    """Monotone bucket id that changes every ``interval_s`` seconds —
    the cache key a renderer adds to its metrics call so cached metrics
    expire exactly on the user-chosen cadence."""
    return int(now_s // max(1, interval_s))


def dedup_latest(scored: DataFrame, key: str = "title", ts_col: str = "fetched_at") -> DataFrame:
    """Read-time dedup, deterministic rendering of the dashboard's
    drop_duplicates(keep='first') (E1: streamlit_app.py:147): keep the
    most recent row per key (row_number over ts desc)."""
    w = Window.partitionBy(key).orderBy(F.desc(ts_col), F.asc("id"))
    return scored.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def raw_sample(scored: DataFrame, n: int = 200) -> list[dict[str, Any]]:
    """The dashboard's "Show raw data" expander (streamlit_app.py:355-359)
    — the reference collects the WHOLE frame into the page; here the
    engine serves the n most recent rows (TakeOrderedAndProject: each
    partition keeps its local top-n, the driver merges K*n rows) so the
    widget stays O(n) at any corpus size."""
    return [
        r.asDict()
        for r in scored.orderBy(F.desc("fetched_at"), F.asc("id")).limit(n).collect()
    ]


def dashboard_metrics(scored: DataFrame, top_k: int = 20, nbins: int = 30) -> dict[str, Any]:
    """One pass over the scored articles table -> every dashboard widget:

    - metric tiles: total, per-class counts + pcts, avg polarity,
      latest fetch (streamlit_app.py:159-215);
    - pie/bar data: class counts sorted desc (:243-284);
    - histogram: fixed-bin polarity counts (:287-309, G6);
    - top-K recent headlines (:314-352, H1).
    """
    deduped = dedup_latest(scored).cache()
    try:
        class_counts = {
            r["sentiment"]: r["cnt"]
            for r in deduped.groupBy("sentiment").agg(F.count(F.lit(1)).alias("cnt")).collect()
        }
        total = sum(class_counts.values())
        stats = deduped.agg(
            F.avg("polarity").alias("avg_polarity"),
            F.max("fetched_at").alias("latest_fetch"),
        ).head()

        # fixed-width histogram over [-1, 1]
        width = 2.0 / nbins
        bucket = F.least(
            F.floor((F.col("polarity") + 1.0) / width).cast("int"), F.lit(nbins - 1)
        )
        hist = {
            r["bucket"]: r["cnt"]
            for r in deduped.select(bucket.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }

        headlines = [
            r.asDict()
            for r in deduped.orderBy(F.desc("fetched_at"), F.asc("id"))
            .limit(top_k)
            .select("title", "polarity", "sentiment", "publishedAt", "fetched_at")
            .collect()
        ]
        return {
            "total_articles": total,
            "class_counts": {c: class_counts.get(c, 0) for c in ("Positive", "Neutral", "Negative")},
            "class_pcts": {
                c: (100.0 * class_counts.get(c, 0) / total if total else 0.0)
                for c in ("Positive", "Neutral", "Negative")
            },
            "avg_polarity": stats["avg_polarity"],
            "latest_fetch": stats["latest_fetch"],
            "histogram": [hist.get(b, 0) for b in range(nbins)],
            "top_headlines": headlines,
        }
    finally:
        deduped.unpersist()
