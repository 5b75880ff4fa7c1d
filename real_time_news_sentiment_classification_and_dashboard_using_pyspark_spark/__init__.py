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

__all__ = ["get_spark"]
__version__ = "0.1.0"
