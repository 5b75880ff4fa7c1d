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
