"""SparkSession factory tuned for the engine.

The reference configures almost nothing beyond driver memory and a
checkpoint dir (streaming_pipeline.py:177-185). We instead turn on the
settings that matter at 100 TB and are harmless locally:

- AQE (runtime coalescing + skew-join splitting) — the 3-hot-key
  ``sentiment`` groupings and any skewed join benefit without hand-salting.
- Arrow for every JVM<->Python exchange (pandas_udf / mapInPandas /
  toPandas) — the reference's row-pickled UDFs are ~10-100x slower.
- A generous autoBroadcastJoinThreshold so dimension tables (region,
  nation, customer at small SF, the sentiment lexicon) never shuffle.
- shuffle.partitions sized to the core count locally; on a real cluster
  AQE coalesces the default upward-sized value anyway.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "news-sentiment-engine",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.schemaInference", "false")
        # the driver's events.parquet stores ts as TIMESTAMP(NANOS), which
        # Spark's vectorized reader rejects; read it as epoch-nanos long
        # and convert explicitly (sources.tables.events_with_ts).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
