"""Batch news-sentiment pipeline — the reference's end-to-end DAG
(work.py:107-207 pandas / work.py:212-280 dormant Spark) as one
distributed plan.

Stage mapping (SURVEY §2/§3.1):
  project B1 -> clean F1 -> filter B4 -> concat F4 -> score K1 ->
  classify F2 -> confidence F3 -> final projection B2 ->
  CSV A10 + NDJSON A11 sinks -> summary G2+F10.

Differences from the reference, on purpose:
- scoring is the expression lexicon (functions.sentiment.polarity_expr),
  not a row-at-a-time Python UDF — whole-stage codegen end to end;
- writes are distributed ``df.write`` (the reference collects everything
  to the driver first, work.py:261 — its scalability cliff);
- the same ``transform_articles`` runs unchanged under Structured
  Streaming (streaming/pipeline.py) — one logical plan, two runtimes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .functions.sentiment import classify_expr, confidence_expr, polarity_expr
from .functions.text import clean_text
from .sources.articles import read_articles, repair_schema

FINAL_COLUMNS = [
    "id",
    "title",
    "description",
    "url",
    "polarity",
    "sentiment",
    "sentiment_confidence",
    "publishedAt",
    "fetched_at",
]


def transform_articles(df: DataFrame, polarity_fn=polarity_expr) -> DataFrame:
    """Project -> clean -> filter -> concat -> score -> classify ->
    confidence -> final projection. Pure narrow transformations: works
    identically on a batch or streaming DataFrame, no shuffle at all.

    Semantics pinned to the reference:
    - clean = lower(regexp_replace(col, "[^a-zA-Z\\s]", "")) on title
      and description (work.py:230-235);
    - rows whose cleaned description is null/empty are dropped BEFORE
      scoring (work.py:238 places the filter before the UDF; trim for
      the pandas-path parity, work.py:147);
    - combined = concat_ws(" ", title_clean, text_clean)
      (work.py:245-248);
    - classify thresholds +-0.1 exclusive, null -> Neutral
      (work.py:96-105); confidence 0.5/0.2 (streaming_pipeline.py:146-151).

    ``polarity_fn`` swaps the scorer (column-expression signature):
    default is the zero-shuffle expression lexicon; pass
    ``functions.pattern_parity.parity_polarity_expr`` for bit-identical
    TextBlob golden parity (tests/test_textblob_parity.py).
    """
    projected = repair_schema(df)
    cleaned = projected.withColumns(
        {
            "title_clean": clean_text("title"),
            "text_clean": clean_text("description"),
        }
    )
    filtered = cleaned.filter(
        F.col("text_clean").isNotNull() & (F.trim(F.col("text_clean")) != "")
    )
    scored = (
        filtered.withColumn(
            "combined_text", F.concat_ws(" ", "title_clean", "text_clean")
        )
        .withColumn("polarity", polarity_fn(F.col("combined_text")))
        .withColumn("sentiment", classify_expr("polarity"))
        .withColumn("sentiment_confidence", confidence_expr("polarity"))
        .withColumn("processing_time", F.current_timestamp())
    )
    return scored.select(*FINAL_COLUMNS, "processing_time")


def sentiment_summary(scored: DataFrame) -> DataFrame:
    """Class counts + percentage of total (work.py:285-304)."""
    agg = scored.groupBy("sentiment").agg(F.count(F.lit(1)).alias("cnt"))
    total = F.sum("cnt").over(Window.partitionBy())
    return agg.withColumn(
        "pct", F.round(100.0 * F.col("cnt") / total.cast("double"), 4)
    )


def run_batch_pipeline(
    spark: SparkSession, input_path: str, output_dir: str
) -> DataFrame:
    """Read NDJSON articles -> transform -> write CSV + NDJSON sinks ->
    return the scored DataFrame. Distributed writes; CSV matches the
    reference's dashboard contract columns (A10/A11)."""
    raw = read_articles(spark, input_path)
    scored = transform_articles(raw).drop("processing_time")
    scored.write.mode("overwrite").option("header", True).csv(
        f"{output_dir}/sentiment_results_csv"
    )
    scored.write.mode("overwrite").json(f"{output_dir}/consolidated_json")
    return scored
