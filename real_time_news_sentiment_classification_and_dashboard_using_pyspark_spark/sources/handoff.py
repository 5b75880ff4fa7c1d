"""Inter-stage handoff at scale: partitioned parquet + small-file
compaction + bucketed tables.

The reference hands data between stages as loose NDJSON files in flat
directories (SURVEY §1.1) and compacts by rewriting one consolidated
JSON by hand (streamlit_app.py:83-90). The scalable renderings:

- ``write_partitioned``: date-partitioned parquet -> partition pruning
  (a dashboard asking for 'today' reads one directory of a 100 TB
  table).
- ``compact``: rewrite a directory to max(1, bytes/target) files —
  the foreachBatch-compaction pattern for streaming sinks that would
  otherwise accrete one file per micro-batch per partition.
- ``write_bucketed``: hash-bucketed managed tables; two tables bucketed
  on the same join key co-locate, removing the join shuffle entirely
  (tested in tests/test_scale_infra.py by asserting the plan has no
  Exchange).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def add_date_partition(df: DataFrame, ts_col: str, out_col: str = "event_date") -> DataFrame:
    return df.withColumn(out_col, F.to_date(F.col(ts_col)))


def compact(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite ``src`` parquet into ~target-sized files at ``dst``;
    returns the file count chosen. Size estimate comes from the scan
    statistics, so no data is collected."""
    df = spark.read.parquet(src)
    size_bytes = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    n_files = max(1, math.ceil(int(size_bytes) / target_file_bytes))
    df.repartition(n_files).write.mode("overwrite").parquet(dst)
    return n_files


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)
