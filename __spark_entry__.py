"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's query catalog
(real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.REGISTRY):
every implemented operator from SURVEY.md §2 is a named (spark_fn,
oracle_sql) pair registered there; this module re-exports them in the
driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans import (
    REGISTRY,
)

SF0_001 = "/root/testdata/sf0.001"
SF0_01 = "/root/testdata/sf0.01"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's sentiment-distribution summary
    (clean -> lexicon score -> classify -> groupBy count -> pct of
    total; work.py:285-304 / streamlit_app.py:179-211) over the
    sf0.001 documents table."""
    return REGISTRY["sentiment_summary"].fn(spark, SF0_001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql(sf_dir: str = SF0_01) -> dict[str, str]:
    """DuckDB oracle per query. Most oracles are static ANSI SQL; a few
    derive a literal-VALUES oracle from per-corpus committed artifacts
    (the MLlib prediction pin) and are registered as callables of
    sf_dir — resolved here against the driver's sf0.01 contract by
    default. A callable returning None (no pin for this corpus yet)
    falls back to the rows-only contract by omission."""
    out: dict[str, str] = {}
    for name, q in REGISTRY.items():
        sql = q.oracle(sf_dir) if callable(q.oracle) else q.oracle
        if sql is not None:
            out[name] = sql
    return out
