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


def _mllib_agreement_oracle(sf_dir: str) -> str | None:
    """Literal-VALUES oracle derived from the committed prediction pin
    (r8 verdict #1): MLlib inference itself is not ANSI-SQL-expressible,
    but the fitted model AND its full prediction vector are committed
    artifacts, so the expected 3-row per-class table is a constant of
    the (corpus, model) pair. Emitting those constants as the oracle
    upgrades this query from the rows-only contract to the full
    rowcount+schema+hash check; the in-plan ``__PREDHASH_MISMATCH__``
    sentinel keeps model drift visible — a drifted model appends a 4th
    row and fails the rowcount gate, never silently re-pins. Returns
    None (rows-only) only for a corpus whose first train hasn't written
    the pin yet."""
    from ..functions.ml import expected_agreement_table

    classes = expected_agreement_table(sf_dir)
    if not classes:
        return None
    rows = ", ".join(
        f"('{c['sentiment']}', {int(c['n_docs'])}, {int(c['n_agree'])})"
        for c in classes
    )
    return (
        "SELECT sentiment, CAST(n_docs AS BIGINT) AS n_docs, "
        "CAST(n_agree AS BIGINT) AS n_agree "
        f"FROM (VALUES {rows}) AS t(sentiment, n_docs, n_agree)"
    )


@register(
    "mllib_sentiment_agreement",
    oracle=_mllib_agreement_oracle,
    tags=("sentiment", "mllib"),
)
def mllib_sentiment_agreement(spark, sf_dir):
    """North-star MLlib path (BASELINE.json: 'Structured Streaming +
    MLlib for sentiment'): train RegexTokenizer->HashingTF->IDF->
    LogisticRegression on lexicon-weak-labeled documents, then report
    per-class agreement between the model and the lexicon classifier.
    Always exactly one row per lexicon class — stable under the driver's
    rows-only check. Inference is a narrow JVM-side transform, so the
    fitted model drops into the streaming pipeline unchanged.

    The rows-only contract is PINNED (r7 verdict #3): the model
    registry commits an order-independent fingerprint of the full
    prediction vector (sum of per-row md5 slices of
    ``doc_id:ml_sentiment``) plus the exact corpus-level agreement
    count alongside the fitted artifact. The plan recomputes both and
    appends a ``__PREDHASH_MISMATCH__`` sentinel row on any deviation
    — a drifted model or flipped prediction changes the row COUNT,
    which even the weaker rows-only comparator catches. Same
    visible-failure idiom as the CC oracles' ``cc_unconverged``
    sentinel."""
    from ..functions.ml import (
        expected_prediction_fingerprint,
        predict_sentiment,
        prediction_fingerprint_expr,
        train_on_documents,
    )
    from ..functions.sentiment import score_text_expr
    from ..sources.tables import table as _t

    model = train_on_documents(spark, sf_dir)
    docs = score_text_expr(_t(spark, sf_dir, "documents"), "text")
    pred = predict_sentiment(model, docs, "text")
    agg = pred.groupBy("sentiment").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("ml_sentiment") == F.col("sentiment")).cast("int"))
        .cast("bigint")
        .alias("n_agree"),
    )
    pin = expected_prediction_fingerprint(sf_dir)
    if pin is None:
        return agg
    sentinel = (
        pred.agg(
            F.sum(prediction_fingerprint_expr()).alias("h"),
            F.sum(
                (F.col("ml_sentiment") == F.col("sentiment")).cast("int")
            )
            .cast("bigint")
            .alias("agree"),
        )
        .filter(
            (F.col("h") != F.lit(int(pin["fingerprint"])))
            | (F.col("agree") != F.lit(int(pin["n_agree"])))
        )
        .select(
            F.lit("__PREDHASH_MISMATCH__").alias("sentiment"),
            F.col("h").alias("n_docs"),
            F.col("agree").alias("n_agree"),
        )
    )
    return agg.unionByName(sentinel)


# Fixed-weight hashed linear classifier: the inference plan of the
# MLlib path (hash -> bucket -> dot product -> argmax) with md5-derived
# deterministic weights, so the WHOLE scoring pipeline is ANSI-SQL-
# expressible and integer-exact — the oracle-checkable twin of
# ``mllib_sentiment_agreement``'s rows-only model path.
_LIN_BUCKETS = 64


def _lin_weight_sql(c: int) -> str:
    return (
        f"(('0x' || substr(md5(CAST(b AS VARCHAR) || '_{c}'), 32, 1))::BIGINT % 5) - 2"
    )


_LINEAR_AGREEMENT_SQL = f"""
, ltok AS (
    SELECT doc_id,
           unnest(list_filter(string_split(lower(regexp_replace(text, '[^a-zA-Z\\s]', '', 'g')), ' '),
                              x -> x <> '')) AS word
    FROM classified
),
lbuck AS (
    SELECT doc_id, ('0x' || substr(md5(word), 25, 8))::BIGINT % {_LIN_BUCKETS} AS b
    FROM ltok
),
lw AS (
    SELECT b,
           {_lin_weight_sql(0)} AS w0,
           {_lin_weight_sql(1)} AS w1,
           {_lin_weight_sql(2)} AS w2
    FROM range({_LIN_BUCKETS}) t(b)
),
lsums AS (
    SELECT tb.doc_id, sum(w0) AS s0, sum(w1) AS s1, sum(w2) AS s2
    FROM lbuck tb JOIN lw ON tb.b = lw.b
    GROUP BY tb.doc_id
),
lpred AS (
    SELECT c.sentiment,
           CASE WHEN coalesce(s0, 0) >= coalesce(s1, 0) AND coalesce(s0, 0) >= coalesce(s2, 0) THEN 'Neutral'
                WHEN coalesce(s1, 0) >= coalesce(s2, 0) THEN 'Positive'
                ELSE 'Negative' END AS ml_sentiment
    FROM classified c LEFT JOIN lsums s USING (doc_id)
)
SELECT sentiment, count(*) AS n_docs,
       CAST(sum(CASE WHEN ml_sentiment = sentiment THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
FROM lpred GROUP BY sentiment
"""


@register(
    "linear_sentiment_agreement",
    oracle=SCORED_DOCS_SQL + _LINEAR_AGREEMENT_SQL,
    tags=("sentiment", "ml", "linear"),
)
def linear_sentiment_agreement(spark, sf_dir):
    """Hashed-linear text classification, fully oracle-checkable: the
    exact inference plan shape of the MLlib model (tokenize -> hash to
    buckets -> broadcast the weight matrix -> per-doc dot products ->
    argmax) but with a FIXED md5-derived integer weight matrix, so both
    engines reproduce every score bit-for-bit. This is the SQL twin
    closing the oracle hole ``mllib_sentiment_agreement`` (rows-only by
    nature) leaves: same plan, same agreement-summary output shape,
    deterministic weights instead of fitted ones.

    Plan: the 64x3 weight matrix is a broadcast-joined dimension (at
    10^5+ features this is exactly a broadcast of model coefficients);
    per-doc scores are one partial-aggregated groupBy; argmax is a
    deterministic CASE (ties resolve by class id: Neutral, Positive,
    Negative)."""
    from ..functions.sentiment import score_text_expr
    from ..sources.tables import table as _t
    from .dedup_queries import SPARK_TOKS

    docs = score_text_expr(_t(spark, sf_dir, "documents"), "text")
    toks = docs.select("doc_id", F.explode(F.expr(SPARK_TOKS)).alias("word"))
    buck = toks.select(
        "doc_id",
        (
            F.conv(F.substring(F.md5("word"), 25, 8), 16, 10).cast("bigint")
            % _LIN_BUCKETS
        ).alias("b"),
    )

    def w(c: int) -> F.Column:
        return (
            F.conv(
                F.substring(F.md5(F.concat_ws("_", F.col("b"), F.lit(c))), 32, 1),
                16,
                10,
            ).cast("bigint")
            % 5
            - 2
        )

    weights = spark.range(_LIN_BUCKETS).select(
        F.col("id").alias("b"), w(0).alias("w0"), w(1).alias("w1"), w(2).alias("w2")
    )
    sums = (
        buck.join(F.broadcast(weights), "b")
        .groupBy("doc_id")
        .agg(F.sum("w0").alias("s0"), F.sum("w1").alias("s1"), F.sum("w2").alias("s2"))
    )
    s0 = F.coalesce(F.col("s0"), F.lit(0))
    s1 = F.coalesce(F.col("s1"), F.lit(0))
    s2 = F.coalesce(F.col("s2"), F.lit(0))
    pred = docs.join(sums, "doc_id", "left").select(
        "sentiment",
        F.when((s0 >= s1) & (s0 >= s2), "Neutral")
        .when(s1 >= s2, "Positive")
        .otherwise("Negative")
        .alias("ml_sentiment"),
    )
    return pred.groupBy("sentiment").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("ml_sentiment") == F.col("sentiment")).cast("int"))
        .cast("bigint")
        .alias("n_agree"),
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
