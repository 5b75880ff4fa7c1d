"""Serving-layer tests: the generator -> streaming pipeline -> dashboard
metrics path, end to end (the reference's full demo flow:
`generate` mode -> streaming_pipeline -> streamlit dashboard)."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.pipeline import (
    transform_articles,
)
from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.serving import (
    dashboard_metrics,
    dedup_latest,
)
from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.sources.articles import (
    read_articles,
)
from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.sources.http import (
    generate_batches,
    synthetic_fetcher,
)
from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.streaming import (
    start_pipeline,
)


def test_generator_is_deterministic(tmp_path):
    a = synthetic_fetcher(0)
    b = synthetic_fetcher(0)
    assert a == b
    assert len(a) == 10
    assert any(x["description"] == "" for x in synthetic_fetcher(0) + synthetic_fetcher(1))
    files = generate_batches(str(tmp_path / "in"), n_batches=3)
    assert len(files) == 3


def test_generator_to_stream_to_dashboard(spark, tmp_path):
    inp, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    generate_batches(str(inp), n_batches=3)
    q = start_pipeline(spark, str(inp), str(out), str(ckpt), available_now=True)
    q.awaitTermination(120)

    scored = spark.read.parquet(f"{out}/scored")
    metrics = dashboard_metrics(scored, top_k=5, nbins=10)

    assert metrics["total_articles"] > 0
    assert sum(metrics["class_counts"].values()) == metrics["total_articles"]
    assert abs(sum(metrics["class_pcts"].values()) - 100.0) < 1e-6
    assert -1.0 <= metrics["avg_polarity"] <= 1.0
    assert sum(metrics["histogram"]) == metrics["total_articles"]
    assert 0 < len(metrics["top_headlines"]) <= 5
    # headlines sorted by recency desc
    fetched = [h["fetched_at"] for h in metrics["top_headlines"]]
    assert fetched == sorted(fetched, reverse=True)

    # raw-data expander contract: bounded recent slice, all columns,
    # served through TakeOrderedAndProject (never a full collect)
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.serving import (
        raw_sample,
    )

    sample = raw_sample(scored, n=7)
    assert 0 < len(sample) <= 7
    assert set(scored.columns) <= set(sample[0])
    ts = [r["fetched_at"] for r in sample]
    assert ts == sorted(ts, reverse=True)
    plan = (
        scored.orderBy(F.desc("fetched_at"), F.asc("id"))
        .limit(7)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_dedup_latest_keeps_most_recent(spark):
    rows = [
        ("i1", "dup title", "fast text", "2025-01-01T00:00:00"),
        ("i2", "dup title", "slow text", "2025-01-02T00:00:00"),
        ("i3", "other", "merge text", "2025-01-01T00:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "id string, title string, description string, fetched_at string"
    )
    scored = transform_articles(df)
    deduped = dedup_latest(scored)
    got = {r["title"]: r["id"] for r in deduped.collect()}
    assert got == {"dup title": "i2", "other": "i3"}


def test_refresh_interval_clamps_to_reference_slider_range():
    """The auto-refresh knob (reference streamlit_app.py:51-57): values
    clamp to the 5-60 s slider range, None means the 10 s default."""
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.serving import (
        refresh_interval,
    )

    assert refresh_interval(None) == 10
    assert refresh_interval(30) == 30
    assert refresh_interval(1) == 5
    assert refresh_interval(9999) == 60


def test_refresh_cache_bucket_ticks_on_interval():
    """The interval flows through to cache expiry: the bucket id is
    stable within an interval and advances across it."""
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.serving import (
        refresh_cache_bucket,
    )

    assert refresh_cache_bucket(10, 100.0) == refresh_cache_bucket(10, 109.9)
    assert refresh_cache_bucket(10, 110.0) == refresh_cache_bucket(10, 100.0) + 1
    # a different slider setting re-buckets immediately
    assert refresh_cache_bucket(5, 109.9) != refresh_cache_bucket(10, 109.9)
