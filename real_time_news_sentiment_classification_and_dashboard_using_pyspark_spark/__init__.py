"""PySpark-native analytics engine with the query/data-processing surface of
fadnc/Real-Time-News-Sentiment-Classification-and-Dashboard-using-PySpark.

Everything is DataFrame/SQL-first: logical plans are declared with the
PySpark DataFrame API and optimized by Catalyst; Python appears only in
vectorized (Arrow) Pandas UDFs where built-ins genuinely cannot express
the semantics (see `operators/multimodal.py`).

Layout
------
- ``session``    — tuned SparkSession factory (AQE, Arrow, broadcast).
- ``schemas``    — explicit StructTypes (reference: streaming_pipeline.py:33-43).
- ``sources``    — parquet star-schema loader, tolerant NDJSON, streaming source.
- ``functions``  — text cleaning / lexicon sentiment as *native column
                   expressions* (no row-at-a-time UDFs in the hot path).
- ``operators``  — dedup (exact/minhash/simhash/jaccard), similarity search,
                   relational helpers, multimodal plumbing.
- ``plans``      — the query catalog: every operator exposed as a named
                   (spark_fn, oracle_sql) pair consumed by __spark_entry__.py.
- ``streaming``  — single-query foreachBatch pipeline, watermarked windows.
"""

from .session import get_spark


def clear_caches(spark) -> None:
    """Release every cached relation the query catalog has registered.

    Cache contract: catalog queries ``.cache()`` shared intermediates
    (shingle sets, embedding norms, classified-file scans). Spark's
    cache manager keys them by canonicalized plan, so repeated queries
    over the same ``sf_dir`` share one materialization — intended for
    interactive sessions, but a long-lived session that touches many
    datasets accumulates entries until the executors' storage fills.
    Call this between workloads (bench.py calls it between queries so
    every timing is cold/attributable); it does NOT drop driver-side
    artifacts with their own lifecycle (the persisted sentiment model's
    train-once memo)."""
    spark.catalog.clearCache()


__all__ = ["get_spark", "clear_caches"]
__version__ = "0.1.0"
