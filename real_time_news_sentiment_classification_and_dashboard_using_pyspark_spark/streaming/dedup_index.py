"""Streaming maintenance of the dedup shingle/LSH store.

The batch store is already incremental (``append_to_shingle_artifact``:
per-doc tables append, ``df`` sum-merges, ``kept`` is merge-on-read) —
this module wires that maintenance into Structured Streaming's
``foreachBatch`` so near-duplicate suppression works ACROSS
micro-batches, not just within the watermark horizon
(``dedup_within_watermark``). This is the production shape of the
reference dashboard's read-time drop_duplicates
(streamlit_app.py:147): the crawl streams in, the persisted LSH index
advances with each micro-batch, and any consumer (the pair queries,
``incremental_near_dup``-style probes) reads the current generation.

Layout under ``store_root``:

- ``gen_init``  — the empty bootstrap store (full-build pipeline over a
  zero-row corpus, so every table exists with its real schema);
- ``gen{N}``    — the complete store after micro-batch N folded in
  (``append_to_shingle_artifact(base=current, delta=batch)``); per-doc
  table files are HARD-LINKED from the previous generation, so a
  generation costs O(delta) bytes, not O(corpus);
- ``_CURRENT``  — sidecar naming the newest complete generation
  (atomic tmp+rename, same pattern as the metrics ``_LATEST``
  sidecar). Readers resolve through ``current_store_path``.

Exactly-once effect under foreachBatch's at-least-once contract: a
generation directory is only visible after the store build's own
atomic tmp->rename (its ``_DONE`` marker is written before the
rename), so a replayed batch finds its completed ``gen{N}`` and only
repoints the sidecar — the append itself is never re-applied. Batches
arrive sequentially, so the current pointer always names
``gen{max committed batch}`` and the next batch folds onto it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

_DOCS_SCHEMA = "doc_id BIGINT, text STRING"


def init_empty_shingle_store(spark: SparkSession, path: str) -> str:
    """Bootstrap a ZERO-document store at ``path`` by running the exact
    full-build table pipeline over an empty (doc_id, text) relation —
    every table (arrays/hashes/df/stop/kept/bands/simsig/simsig64/meta)
    exists with the schema the append path expects, so micro-batch 0 is
    an ordinary append, not a special case."""
    import shutil

    from ..plans.dedup_queries import _build_artifact_tables, shingle_arrays_of

    if os.path.exists(os.path.join(path, "_DONE")):
        return path
    tmp = f"{path}.tmp{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    empty = spark.range(0).select(
        F.col("id").alias("doc_id"), F.lit("").alias("text")
    )
    raw = shingle_arrays_of(empty)
    try:
        _build_artifact_tables(
            spark, None, tmp, raw, spark.sparkContext.defaultParallelism
        )
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    open(os.path.join(tmp, "_DONE"), "w").close()
    try:
        os.rename(tmp, path)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.exists(os.path.join(path, "_DONE")):
            raise
    return path


def _write_current(store_root: str, gen_name: str) -> None:
    tmp = os.path.join(store_root, f"_CURRENT.tmp{os.getpid()}")
    with open(tmp, "w") as fh:
        fh.write(gen_name)
    os.replace(tmp, os.path.join(store_root, "_CURRENT"))


def current_store_path(store_root: str) -> str:
    """Path of the newest complete store generation."""
    try:
        with open(os.path.join(store_root, "_CURRENT")) as fh:
            return os.path.join(store_root, fh.read().strip())
    except OSError:
        return os.path.join(store_root, "gen_init")


def dedup_index_fanout(store_root: str):
    """foreachBatch callable: fold each micro-batch of (doc_id, text)
    documents into the store as one new generation. Module-level so
    tests can drive the replay/idempotency path with a static batch."""
    from ..plans.dedup_queries import append_to_shingle_artifact

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        gen_name = f"gen{batch_id}"
        gen_path = os.path.join(store_root, gen_name)
        if not os.path.exists(os.path.join(gen_path, "_DONE")):
            base = current_store_path(store_root)
            append_to_shingle_artifact(
                spark, base, batch_df.select("doc_id", "text"), gen_path
            )
        # repoint (also the replayed-batch path: the append committed
        # but the sidecar update was lost with the crash)
        cur = os.path.basename(current_store_path(store_root))
        cur_n = int(cur[3:]) if cur.startswith("gen") and cur[3:].isdigit() else -1
        if batch_id > cur_n:
            _write_current(store_root, gen_name)

    return process_batch


def start_dedup_index_stream(
    spark: SparkSession,
    input_dir: str,
    store_root: str,
    checkpoint_dir: str,
    *,
    available_now: bool = False,
    trigger_seconds: int = 10,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """File-source stream of (doc_id, text) parquet -> per-micro-batch
    shingle/LSH store maintenance. ``available_now=True`` drains all
    pending files and stops (the deterministic test/backfill mode);
    ``max_files_per_trigger`` bounds batch size — the knob that keeps
    per-generation append cost (delta tokenize + df merge + kept
    override) flat as the backlog grows."""
    os.makedirs(store_root, exist_ok=True)
    init_empty_shingle_store(spark, os.path.join(store_root, "gen_init"))
    reader = spark.readStream.schema(_DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(input_dir)
    writer = (
        docs.writeStream.foreachBatch(dedup_index_fanout(store_root))
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
