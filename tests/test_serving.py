"""Serving-layer tests: the generator -> streaming pipeline -> dashboard
metrics path, end to end (the reference's full demo flow:
`generate` mode -> streaming_pipeline -> streamlit dashboard)."""

from __future__ import annotations

import os

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


def test_dashboard_serves_oracle_checked_aggregates(spark, tmp_path):
    """r6 verdict #4: drive the serving layer end-to-end ON ENGINE
    OUTPUT — sf0.001 documents rendered as article NDJSON -> batch
    pipeline (read/clean/score/classify/write) -> dashboard_metrics ->
    SVG chart sinks — and assert the SERVED numbers equal the
    oracle-paired ``sentiment_summary`` registry query over the same
    corpus (the query the driver hash-checks against DuckDB). This
    closes the loop the unit tests left open: the dashboard shows the
    same numbers the correctness gate verifies.

    Corpus alignment: titles are the digit-only doc_id (unique, so
    ``dedup_latest`` keeps every row; cleans to '' and digits can't
    match the lexicon, so polarity is exactly the document-text score);
    every sf0.001 text survives the pipeline's empty-after-clean filter
    (asserted via total), so the served population IS the query's."""
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.charts import (
        histogram_svg,
        pie_svg,
        save_sentiment_chart,
    )
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.pipeline import (
        run_batch_pipeline,
    )
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans import (
        REGISTRY,
    )
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.sources.tables import (
        table,
    )

    sf = "/root/testdata/sf0.001"
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    (
        table(spark, sf, "documents")
        .select(
            F.col("doc_id").cast("string").alias("id"),
            F.col("doc_id").cast("string").alias("title"),
            F.col("text").alias("description"),
            F.lit(None).cast("string").alias("url"),
            F.lit("2025-01-01T00:00:00Z").alias("publishedAt"),
            F.lit("2025-01-01T00:00:00.000000").alias("fetched_at"),
        )
        .write.json(inp)
    )
    scored = run_batch_pipeline(spark, inp, out)
    nbins = 10
    m = dashboard_metrics(scored, top_k=7, nbins=nbins)

    # the oracle-checked queries over the SAME corpus
    summary = {
        r["sentiment"]: (r["cnt"], r["pct"])
        for r in REGISTRY["sentiment_summary"].fn(spark, sf).collect()
    }
    docs_scored = REGISTRY["sentiment_docs"].fn(spark, sf).collect()

    assert m["total_articles"] == len(docs_scored) == 500
    for cls in ("Positive", "Neutral", "Negative"):
        cnt, pct = summary.get(cls, (0, 0.0))
        assert m["class_counts"][cls] == cnt, cls
        # query pct is rounded to 4 decimals, serving pct is raw
        assert abs(m["class_pcts"][cls] - pct) < 1e-3, cls

    # avg polarity and histogram against the per-doc oracle query
    pols = [r["polarity"] for r in docs_scored]
    assert abs(m["avg_polarity"] - sum(pols) / len(pols)) < 1e-9
    width = 2.0 / nbins
    expected_hist = [0] * nbins
    for p in pols:
        expected_hist[min(int((p + 1.0) / width), nbins - 1)] += 1
    assert m["histogram"] == expected_hist

    # top-K: constant fetched_at -> deterministic id-ascending order
    ids = sorted(str(r["doc_id"]) for r in docs_scored)
    assert [h["title"] for h in m["top_headlines"]] == ids[:7]

    # chart sinks render the served dict (pie slices = nonzero classes)
    pie = pie_svg(m["class_counts"])
    n_classes = sum(1 for c in m["class_counts"].values() if c > 0)
    assert pie.count("<path") == n_classes
    hist_svg = histogram_svg(m["histogram"])
    assert hist_svg.count("<rect") >= sum(1 for b in m["histogram"] if b > 0)
    p = save_sentiment_chart(m, str(tmp_path / "dist.svg"))
    assert os.path.getsize(p) > 0
