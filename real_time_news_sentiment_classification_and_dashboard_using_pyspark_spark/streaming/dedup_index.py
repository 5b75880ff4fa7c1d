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


def _gen_number(name: str) -> int:
    return int(name[3:]) if name.startswith("gen") and name[3:].isdigit() else -1


def gc_generations(store_root: str, keep_last: int = 2) -> list[str]:
    """Keep-last-K generation GC (r10 verdict #3): delete ``gen{N}``
    directories older than the newest ``keep_last`` at-or-below the
    ``_CURRENT`` pointer. Never touched: ``gen_init`` (the _CURRENT
    fallback), the current generation itself, and any generation NEWER
    than current (an append that committed before a crash repointed —
    its replay must find the completed dir and only repoint).

    Why this cannot break exactly-once replay: Structured Streaming
    commits a batch's offsets only AFTER foreachBatch returns, so the
    only replayable batch is the newest one — whose generation is by
    construction current or newer, both protected. Even if a replayed
    batch's generation WERE missing, the fold is regenerative, not
    mutative: it rebuilds the same generation from the current base
    plus the replayed batch (append never modifies its base), so the
    worst case is re-paid delta CPU, never a wrong store. Old
    generations hard-link shared files, so deletion frees only bytes
    no newer generation references. Returns the deleted names."""
    import shutil

    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    cur_n = _gen_number(os.path.basename(current_store_path(store_root)))
    gens = sorted(
        g
        for g in (
            _gen_number(e)
            for e in os.listdir(store_root)
            if e.startswith("gen") and e[3:].isdigit()
        )
        if g >= 0
    )
    committed = [g for g in gens if g <= cur_n]
    keep = set(g for g in gens if g > cur_n) | set(committed[-keep_last:])
    removed = []
    for g in gens:
        if g not in keep:
            shutil.rmtree(os.path.join(store_root, f"gen{g}"), ignore_errors=True)
            removed.append(f"gen{g}")
    return removed


_PER_DOC_TABLES = ("arrays", "hashes", "bands", "simsig", "simsig64")


def compact_store(spark: SparkSession, src_path: str, dst_path: str) -> str:
    """Full-rewrite compaction fold (r10 verdict #3): rewrite a store
    generation's LOGICAL content into fresh flat files — per-doc
    tables coalesced from their accumulated per-batch appended files
    into session-width files, ``kept_over`` override generations
    folded into a flat ``kept`` base. A long crawl's thousands of
    O(delta) appends otherwise accumulate unbounded FILE COUNT (every
    fold adds small parquet files per table) even though bytes are
    hard-link-shared; the periodic compaction resets that, and — since
    a compacted generation shares no links with its predecessors —
    lets the keep-last-K GC reclaim the full byte history behind it.
    Same atomic tmp+rename discipline as the builds; ``src_path`` may
    equal ``dst_path`` (in-place swap via the tmp dir)."""
    import shutil

    from ..plans.dedup_queries import resolve_kept

    width = spark.sparkContext.defaultParallelism
    tmp = f"{dst_path}.compact{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    try:
        for name in _PER_DOC_TABLES + ("df", "stop"):
            (
                spark.read.parquet(os.path.join(src_path, name))
                .repartition(width)
                .write.mode("overwrite")
                .parquet(os.path.join(tmp, name))
            )
        (
            resolve_kept(spark, src_path)
            .repartition(width)
            .write.mode("overwrite")
            .parquet(os.path.join(tmp, "kept"))
        )
        (
            spark.read.parquet(os.path.join(src_path, "meta"))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(tmp, "meta"))
        )
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    open(os.path.join(tmp, "_DONE"), "w").close()
    shutil.rmtree(dst_path, ignore_errors=True)
    os.rename(tmp, dst_path)
    return dst_path


def dedup_index_fanout(
    store_root: str,
    *,
    gc_keep_last: int | None = None,
    compact_every: int | None = None,
):
    """foreachBatch callable: fold each micro-batch of (doc_id, text)
    documents into the store as one new generation. Module-level so
    tests can drive the replay/idempotency path with a static batch.
    ``gc_keep_last`` enables the keep-last-K generation GC after each
    repoint; ``compact_every`` rewrites every C-th generation flat
    (see ``compact_store``) before repointing — crash anywhere in the
    fold/compact/repoint chain replays into the same regenerative
    path."""

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
            if compact_every and batch_id > 0 and batch_id % compact_every == 0:
                compact_store(spark, gen_path, gen_path)
        # repoint (also the replayed-batch path: the append committed
        # but the sidecar update was lost with the crash)
        cur = os.path.basename(current_store_path(store_root))
        cur_n = _gen_number(cur)
        if batch_id > cur_n:
            _write_current(store_root, gen_name)
        if gc_keep_last:
            gc_generations(store_root, keep_last=gc_keep_last)

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
    gc_keep_last: int | None = None,
    compact_every: int | None = None,
) -> StreamingQuery:
    """File-source stream of (doc_id, text) parquet -> per-micro-batch
    shingle/LSH store maintenance. ``available_now=True`` drains all
    pending files and stops (the deterministic test/backfill mode);
    ``max_files_per_trigger`` bounds batch size — the knob that keeps
    per-generation append cost (delta tokenize + df merge + kept
    override) flat as the backlog grows. ``gc_keep_last`` /
    ``compact_every`` bound generation-history growth over a long
    crawl (r10 verdict #3): keep-last-K directory GC after each
    commit, and a flat full-rewrite of every C-th generation so file
    count and link-shared byte history stay bounded."""
    os.makedirs(store_root, exist_ok=True)
    init_empty_shingle_store(spark, os.path.join(store_root, "gen_init"))
    reader = spark.readStream.schema(_DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(input_dir)
    writer = (
        docs.writeStream.foreachBatch(
            dedup_index_fanout(
                store_root,
                gc_keep_last=gc_keep_last,
                compact_every=compact_every,
            )
        )
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
