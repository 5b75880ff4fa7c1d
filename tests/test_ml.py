"""MLlib sentiment path: trains on lexicon-weak-labels, must agree with
the lexicon classifier on the vast majority of the training corpus and
produce sane predictions on fresh text."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.functions.ml import (
    predict_sentiment,
    train_on_documents,
)
from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.functions.sentiment import (
    score_text_expr,
)
from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.sources.tables import (
    table,
)

SF = "/root/testdata/sf0.001"


def test_model_agrees_with_lexicon_on_train(spark):
    model = train_on_documents(spark, SF)
    docs = score_text_expr(table(spark, SF, "documents"), "text")
    scored = predict_sentiment(model, docs, "text")
    agree = scored.withColumn(
        "ok", (F.col("ml_sentiment") == F.col("sentiment")).cast("int")
    )
    rate = agree.agg(F.avg("ok")).head()[0]
    assert rate > 0.85, f"train agreement only {rate:.2%}"


def test_model_predicts_fresh_text(spark):
    model = train_on_documents(spark, SF)
    fresh = spark.createDataFrame(
        [
            Row(text="fast fast fast big spark"),
            Row(text="slow slow dup small"),
        ],
        "text string",
    )
    preds = [r["ml_sentiment"] for r in predict_sentiment(model, fresh).collect()]
    assert preds[0] == "Positive"
    assert preds[1] == "Negative"
    assert set(preds) <= {"Positive", "Negative", "Neutral"}


def test_mllib_model_scores_a_stream(spark, tmp_path):
    """North-star integration: the fitted MLlib pipeline runs INSIDE
    Structured Streaming (PipelineModel.transform is a narrow map), so
    streaming micro-batches get model predictions with no extra
    machinery."""
    import json

    model = train_on_documents(spark, SF)
    src = tmp_path / "stream_in"
    src.mkdir()
    rows = [
        {"text": "fast fast big spark rally"},
        {"text": "slow slow dup small slump"},
    ]
    with open(src / "a.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    stream = spark.readStream.schema("text string").json(str(src))
    scored = predict_sentiment(model, stream, "text")
    q = (
        scored.select("text", "ml_sentiment")
        .writeStream.format("memory")
        .queryName("ml_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["text"].split()[0]: r["ml_sentiment"] for r in spark.sql("SELECT * FROM ml_stream").collect()}
    assert got == {"fast": "Positive", "slow": "Negative"}


def test_prediction_pin_is_committed_and_silent(spark):
    """The registry carries a prediction-vector fingerprint for the
    fixture corpus, and the agreement query's sentinel branch stays
    SILENT when the model reproduces it — exactly 3 class rows."""
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.functions.ml import (
        expected_prediction_fingerprint,
    )
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.sentiment_queries import (
        mllib_sentiment_agreement,
    )

    pin = expected_prediction_fingerprint(SF)
    assert pin is not None and pin["fingerprint"] > 0
    rows = mllib_sentiment_agreement(spark, SF).collect()
    assert len(rows) == 3
    assert all(r["sentiment"] != "__PREDHASH_MISMATCH__" for r in rows)
    assert sum(r["n_agree"] for r in rows) == pin["n_agree"]


def test_prediction_pin_mismatch_fires_sentinel(spark, monkeypatch):
    """A drifted prediction vector must surface as a VISIBLE extra row
    (rowcount change), never a silently wrong answer — pin the failure
    mode by feeding the plan a perturbed expected fingerprint."""
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.functions import ml
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans import (
        sentiment_queries,
    )

    real = ml.expected_prediction_fingerprint(SF)
    tampered = dict(real, fingerprint=real["fingerprint"] + 1)
    monkeypatch.setattr(
        ml, "expected_prediction_fingerprint", lambda _sf: tampered
    )
    rows = sentiment_queries.mllib_sentiment_agreement(spark, SF).collect()
    marks = [r for r in rows if r["sentiment"] == "__PREDHASH_MISMATCH__"]
    assert len(rows) == 4 and len(marks) == 1
    assert marks[0]["n_docs"] == real["fingerprint"]  # the recomputed hash


def test_mllib_literal_oracle_matches_pin_and_spark(spark):
    """r8 verdict #1: the agreement query is hash-checkable — its
    callable oracle emits the committed per-class table as literal
    VALUES, DuckDB returns exactly the rows the Spark plan computes,
    and a corpus with no pin yields None (rows-only fallback)."""
    import duckdb

    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.functions import ml
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.sentiment_queries import (
        _mllib_agreement_oracle,
        mllib_sentiment_agreement,
    )

    sql = _mllib_agreement_oracle(SF)
    assert sql is not None and "VALUES" in sql
    duck = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    got = sorted(
        (r["sentiment"], r["n_docs"], r["n_agree"])
        for r in mllib_sentiment_agreement(spark, SF).collect()
    )
    assert duck == got
    # per-class pins sum to the corpus-level pin (internal consistency)
    pin = ml.expected_prediction_fingerprint(SF)
    assert sum(c["n_agree"] for c in pin["classes"]) == pin["n_agree"]
    assert sum(c["n_docs"] for c in pin["classes"]) == pin["n_docs"]
    # a pin-less corpus degrades to rows-only, never a wrong oracle
    assert _mllib_agreement_oracle("/nonexistent/corpus") is None
