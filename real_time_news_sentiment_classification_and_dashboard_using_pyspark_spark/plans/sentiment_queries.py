"""Sentiment queries over ``documents`` — the reference's core DAG
(fetch -> clean -> score -> classify -> summarize; work.py:107-207,
streaming_pipeline.py:97-167) re-expressed as oracle-checkable Spark
plans. See functions/sentiment.py for the scorer design."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.sentiment import (
    SCORED_DOCS_SQL,
    confidence_expr,
    scored_documents,
)
from .registry import register


@register(
    "sentiment_docs",
    oracle=SCORED_DOCS_SQL
    + """
SELECT doc_id, lang, source, polarity, sentiment FROM classified
""",
    tags=("sentiment",),
)
def sentiment_docs(spark, sf_dir):
    """Per-document polarity + class — the scored-results projection the
    reference writes to CSV/NDJSON (B2: work.py:182,255-258)."""
    return scored_documents(spark, sf_dir).select(
        "doc_id", "lang", "source", "polarity", "sentiment"
    )


@register(
    "sentiment_summary",
    oracle=SCORED_DOCS_SQL
    + """
SELECT sentiment,
       count(*) AS cnt,
       round(100.0 * count(*) / CAST(sum(count(*)) OVER () AS DOUBLE), 4) AS pct
FROM classified
GROUP BY sentiment
""",
    tags=("sentiment", "agg", "flagship"),
)
def sentiment_summary(spark, sf_dir):
    """FLAGSHIP: the sentiment-distribution summary both reference
    surfaces compute (work.py:285-304 console; streamlit_app.py:179-211
    dashboard tiles) — clean -> score -> classify -> groupBy count ->
    pct-of-total. Three hot groups; partial aggregation makes the skew
    irrelevant (AQE would split them anyway)."""
    agg = (
        scored_documents(spark, sf_dir)
        .groupBy("sentiment")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = F.sum("cnt").over(Window.partitionBy())
    return agg.withColumn("pct", F.round(100.0 * F.col("cnt") / total.cast("double"), 4))


@register(
    "sentiment_by_lang",
    oracle=SCORED_DOCS_SQL
    + """
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN sentiment = 'Positive' THEN 1 ELSE 0 END) AS BIGINT) AS n_positive,
       CAST(sum(CASE WHEN sentiment = 'Negative' THEN 1 ELSE 0 END) AS BIGINT) AS n_negative,
       CAST(sum(CASE WHEN sentiment = 'Neutral'  THEN 1 ELSE 0 END) AS BIGINT) AS n_neutral,
       round(avg(polarity), 4) AS avg_polarity
FROM classified
GROUP BY lang
""",
    tags=("sentiment", "agg", "pivot"),
)
def sentiment_by_lang(spark, sf_dir):
    """Sentiment mix per language — conditional aggregation (a portable
    pivot) plus mean polarity (dashboard G4: streamlit_app.py:215)."""
    scored = scored_documents(spark, sf_dir)
    def flag(v):
        return F.sum(F.when(F.col("sentiment") == v, 1).otherwise(0)).cast("bigint")
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        flag("Positive").alias("n_positive"),
        flag("Negative").alias("n_negative"),
        flag("Neutral").alias("n_neutral"),
        F.round(F.avg("polarity"), 4).alias("avg_polarity"),
    )


@register(
    "sentiment_confidence_summary",
    oracle=SCORED_DOCS_SQL
    + """
SELECT CASE WHEN abs(polarity) > 0.5 THEN 'High'
            WHEN abs(polarity) > 0.2 THEN 'Medium'
            ELSE 'Low' END AS sentiment_confidence,
       count(*) AS cnt
FROM classified
GROUP BY 1
""",
    tags=("sentiment", "agg"),
)
def sentiment_confidence_summary(spark, sf_dir):
    """Confidence bucketing (F3: streaming_pipeline.py:146-151) rolled
    up to counts."""
    return (
        scored_documents(spark, sf_dir)
        .withColumn("sentiment_confidence", confidence_expr("polarity"))
        .groupBy("sentiment_confidence")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "top_polar_docs",
    oracle=SCORED_DOCS_SQL
    + """
SELECT doc_id, polarity, sentiment
FROM classified
ORDER BY abs(polarity) DESC, doc_id ASC
LIMIT 15
""",
    tags=("sentiment", "topk"),
)
def top_polar_docs(spark, sf_dir):
    """Most-polar documents — the 'top headlines' top-K (H1) keyed on
    score instead of recency; TakeOrderedAndProject again."""
    return (
        scored_documents(spark, sf_dir)
        .orderBy(F.abs(F.col("polarity")).desc(), F.asc("doc_id"))
        .limit(15)
        .select("doc_id", "polarity", "sentiment")
    )


@register(
    "mllib_sentiment_agreement",
    oracle=None,  # MLlib model output is not ANSI-SQL-expressible -> rows-only check
    tags=("sentiment", "mllib"),
)
def mllib_sentiment_agreement(spark, sf_dir):
    """North-star MLlib path (BASELINE.json: 'Structured Streaming +
    MLlib for sentiment'): train RegexTokenizer->HashingTF->IDF->
    LogisticRegression on lexicon-weak-labeled documents, then report
    per-class agreement between the model and the lexicon classifier.
    Always exactly one row per lexicon class — stable under the driver's
    rows-only check. Inference is a narrow JVM-side transform, so the
    fitted model drops into the streaming pipeline unchanged."""
    from ..functions.ml import predict_sentiment, train_on_documents
    from ..functions.sentiment import score_text_expr
    from ..sources.tables import table as _t

    model = train_on_documents(spark, sf_dir)
    docs = score_text_expr(_t(spark, sf_dir, "documents"), "text")
    pred = predict_sentiment(model, docs, "text")
    return (
        pred.groupBy("sentiment")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("ml_sentiment") == F.col("sentiment")).cast("int"))
            .cast("bigint")
            .alias("n_agree"),
        )
    )


@register(
    "sentiment_docs_join_scorer",
    oracle=SCORED_DOCS_SQL
    + """
SELECT doc_id, polarity, sentiment FROM classified
""",
    tags=("sentiment", "join"),
)
def sentiment_docs_join_scorer(spark, sf_dir):
    """The broadcast-join rendering of the lexicon scorer (explode ->
    broadcast hash join -> exact integer agg -> join back), kept as a
    first-class query alongside the expression rendering
    (sentiment_docs): when the lexicon outgrows a map literal (real
    lexica run 10^5+ entries), this is the plan that scales — and it
    must stay numerically identical to both the expression scorer and
    the oracle."""
    from ..functions.sentiment import score_text
    from ..sources.tables import table as _t

    docs = _t(spark, sf_dir, "documents")
    return score_text(docs, "doc_id", "text", spark).select(
        "doc_id", "polarity", "sentiment"
    )
