"""Streaming shingle/LSH store maintenance (r9 verdict #2): an
availableNow stream folding micro-batches into the dedup store must
produce a store EQUAL to the one-shot batch build over the same corpus
— table by table — and replaying a committed batch must be a no-op."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.dedup_queries import (
    _corpus,
    build_shingle_artifact,
    resolve_kept,
)
from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.streaming import (
    current_store_path,
    dedup_index_fanout,
    start_dedup_index_stream,
)

SF = "/root/testdata/sf0.001"


def _corpus_docs(spark):
    """The dedup corpus as a (doc_id, text) relation — re-cleaning
    space-joined clean tokens is the identity, so streaming this text
    through ``shingle_arrays_of`` is bit-compatible with the batch
    build's ``_shingle_arrays``."""
    return _corpus(spark, SF).select(
        "doc_id", F.concat_ws(" ", "toks").alias("text")
    )


def _table_rows(spark, path, name):
    df = spark.read.parquet(os.path.join(path, name))
    cols = sorted(df.columns)
    return sorted(
        tuple(tuple(v) if isinstance(v, list) else v for v in r)
        for r in df.select(*cols).collect()
    )


def _kept_rows(spark, path):
    return sorted(
        (r["doc_id"], tuple(r["sh_arr"]))
        for r in resolve_kept(spark, path).collect()
    )


def test_streamed_store_equals_batch_build(spark, tmp_path):
    inp, root, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
    )
    _corpus_docs(spark).repartition(3).write.parquet(inp)

    q = start_dedup_index_stream(
        spark, inp, root, ckpt, available_now=True, max_files_per_trigger=1
    )
    q.awaitTermination(600)

    gens = sorted(e for e in os.listdir(root) if e.startswith("gen"))
    assert len([g for g in gens if g != "gen_init"]) >= 2, (
        "expected multiple micro-batch generations, got " + repr(gens)
    )
    cur = current_store_path(root)
    assert os.path.exists(os.path.join(cur, "_DONE"))

    full = build_shingle_artifact(spark, SF)
    for name in ("meta", "df", "stop", "hashes", "bands", "simsig", "simsig64"):
        assert _table_rows(spark, cur, name) == _table_rows(spark, full, name), (
            f"store table {name} diverged from the batch build"
        )
    # arrays: per-doc shingle arrays, order included (same expression on
    # both paths)
    assert _table_rows(spark, cur, "arrays") == _table_rows(spark, full, "arrays")
    # kept: compare the LOGICAL relation (streamed side may hold
    # merge-on-read override generations / compactions)
    assert _kept_rows(spark, cur) == _kept_rows(spark, full)

    # replaying a committed batch is a no-op: the generation exists, so
    # the fanout must not re-append and must not regress the pointer
    before = cur
    fanout = dedup_index_fanout(root)
    fanout(spark.read.parquet(inp).limit(5), 0)
    assert current_store_path(root) == before

    # a restarted availableNow drain with no new files commits nothing
    q2 = start_dedup_index_stream(
        spark, inp, root, ckpt, available_now=True, max_files_per_trigger=1
    )
    q2.awaitTermination(120)
    assert sorted(e for e in os.listdir(root) if e.startswith("gen")) == gens
