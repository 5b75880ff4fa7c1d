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


def test_deferred_merge_stream_equals_batch_build(spark, tmp_path):
    """r11 verdict #4: with merge_every set, per-batch folds are pure
    O(delta) — per-doc appends + df_delta/pending side generations;
    df/stop/kept/meta are linked stale. The probe tables (bands,
    arrays) must be FRESH after every fold, the K-th fold merges the
    backlog, and finalize brings the drained store to full equality
    with the one-shot batch build."""
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.dedup_queries import (
        has_unmerged_deltas,
    )
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.streaming import (
        finalize_dedup_index,
    )

    inp, root, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
    )
    _corpus_docs(spark).repartition(5).write.parquet(inp)

    # 5 batches, merge at every 2nd -> batches 1,3,5 (well, 2 and 4
    # merge; 1,3,5 defer) leave a backlog for finalize
    q = start_dedup_index_stream(
        spark, inp, root, ckpt,
        available_now=True, max_files_per_trigger=1, merge_every=2,
    )
    q.awaitTermination(600)

    cur = current_store_path(root)
    # the drain ends on a deferred fold (5 batches, ids 0..4: id 4
    # merged; re-check either way — the contract is finalize closes it)
    # probe freshness: bands/arrays contain every corpus doc already
    n_docs = _corpus_docs(spark).count()
    got_arr = spark.read.parquet(os.path.join(cur, "arrays")).count()
    assert got_arr == n_docs
    finalize_dedup_index(spark, root)
    cur = current_store_path(root)
    assert not has_unmerged_deltas(cur)
    full = build_shingle_artifact(spark, SF)
    assert _store_logical_rows(spark, cur) == _store_logical_rows(spark, full)

    # replay of the newest committed batch stays a no-op in deferred mode
    before = _store_logical_rows(spark, cur)
    fanout = dedup_index_fanout(root, merge_every=2)
    last_id = max(
        int(e[3:]) for e in os.listdir(root)
        if e.startswith("gen") and e[3:].isdigit()
    )
    fanout(spark.read.parquet(inp).limit(0), last_id)
    assert _store_logical_rows(spark, current_store_path(root)) == before


def test_async_maintenance_stream_equals_batch_build(spark, tmp_path):
    """r11 verdict #5: with async_maintenance, EVERY fold is light; the
    background worker merges+compacts a snapshot and later folds absorb
    it by hard-link grafting. After the drain + worker completion +
    finalize, the store equals the one-shot batch build, and at least
    one maintenance base must have been published and absorbed."""
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.streaming import (
        finalize_dedup_index,
    )
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.streaming.dedup_index import (
        _absorbed_base,
        _newest_maint_base,
        dedup_index_fanout as make_fanout,
    )

    inp, root = str(tmp_path / "in"), str(tmp_path / "store")
    _corpus_docs(spark).repartition(6).write.parquet(inp)

    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.streaming import (
        init_empty_shingle_store,
    )

    os.makedirs(root, exist_ok=True)
    init_empty_shingle_store(spark, os.path.join(root, "gen_init"))
    # drive the fanout directly so the worker can be awaited
    # deterministically between folds
    fanout = make_fanout(root, merge_every=2, async_maintenance=True)
    files = sorted(
        os.path.join(inp, f) for f in os.listdir(inp) if f.endswith(".parquet")
    )
    for i, f in enumerate(files):
        fanout(spark.read.parquet(f), i)
        if fanout.maintenance is not None:
            # deterministic: let any scheduled refresh finish so the
            # NEXT fold exercises the absorption graft
            fanout.maintenance.wait(600)

    assert _newest_maint_base(root) is not None, "no maintenance base published"
    finalize_dedup_index(spark, root)
    cur = current_store_path(root)
    full = build_shingle_artifact(spark, SF)
    assert _store_logical_rows(spark, cur) == _store_logical_rows(spark, full)
    # absorption actually happened at least once mid-stream: some gen
    # carries the _BASE marker
    markers = [
        _absorbed_base(os.path.join(root, e))
        for e in os.listdir(root)
        if e.startswith("gen") and e[3:].isdigit()
    ]
    assert any(markers), "no fold absorbed a published base"


def _store_logical_rows(spark, path):
    """Every logical table of a store, normalized for equality."""
    out = {
        name: _table_rows(spark, path, name)
        for name in (
            "meta", "df", "stop", "arrays", "hashes", "bands",
            "simsig", "simsig64",
        )
    }
    out["kept"] = _kept_rows(spark, path)
    return out


def test_gc_and_compaction_preserve_store_and_replay(spark, tmp_path):
    """r10 verdict #3: the keep-last-K generation GC and the periodic
    full-rewrite compaction must (a) bound generation-directory growth,
    (b) leave the current store's LOGICAL content identical to the
    batch build, and (c) never break exactly-once replay — a replayed
    committed batch stays a no-op, and a replayed batch whose
    generation was GC'd REGENERATES it from the current base instead
    of corrupting the store."""
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.streaming import (
        compact_store,
        gc_generations,
    )

    inp, root, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
    )
    _corpus_docs(spark).repartition(4).write.parquet(inp)

    q = start_dedup_index_stream(
        spark,
        inp,
        root,
        ckpt,
        available_now=True,
        max_files_per_trigger=1,
        gc_keep_last=2,
        compact_every=2,
    )
    q.awaitTermination(600)

    gens = sorted(
        e for e in os.listdir(root)
        if e.startswith("gen") and e != "gen_init"
    )
    # 4 micro-batches with keep_last=2 -> only the newest two survive
    assert len(gens) == 2, f"GC left {gens}"
    assert "gen_init" in os.listdir(root)  # fallback is never GC'd
    cur = current_store_path(root)
    assert os.path.basename(cur) == max(gens, key=lambda g: int(g[3:]))
    assert os.path.exists(os.path.join(cur, "_DONE"))

    # (b) logical equality with the one-shot batch build, GC+compaction
    # notwithstanding (batch 2 was compacted in place mid-stream)
    full = build_shingle_artifact(spark, SF)
    assert _store_logical_rows(spark, cur) == _store_logical_rows(spark, full)

    # (c1) replaying the newest committed batch is a pure no-op
    before_rows = _store_logical_rows(spark, cur)
    fanout = dedup_index_fanout(root, gc_keep_last=2, compact_every=2)
    last_id = int(os.path.basename(cur)[3:])
    fanout(spark.read.parquet(inp).limit(0), last_id)
    assert current_store_path(root) == cur
    assert _store_logical_rows(spark, cur) == before_rows

    # (c2) a replayed batch whose generation was GC'd regenerates it
    # from the current base — same store content, pointer repointed
    victim = min(gens, key=lambda g: int(g[3:]))
    victim_id = int(victim[3:])
    # simulate: GC removed the victim (delete it directly)
    import shutil

    shutil.rmtree(os.path.join(root, victim))
    # replay the victim with an EMPTY batch (content is irrelevant:
    # the point is the fold path runs against the current base and
    # produces a complete generation without touching its base)
    fanout(spark.read.parquet(inp).limit(0), victim_id)
    regen = os.path.join(root, victim)
    assert os.path.exists(os.path.join(regen, "_DONE"))
    # pointer did not regress (victim_id < current)
    assert current_store_path(root) == cur
    # current store content untouched by the replay
    assert _store_logical_rows(spark, cur) == before_rows

    # compaction is idempotent on logical content and kills kept_over
    compacted = str(tmp_path / "compacted")
    compact_store(spark, cur, compacted)
    assert not os.path.isdir(os.path.join(compacted, "kept_over"))
    assert _store_logical_rows(spark, compacted) == before_rows

    # direct GC API: keep_last=1 collapses to the current generation
    removed = gc_generations(root, keep_last=1)
    survivors = sorted(
        e for e in os.listdir(root)
        if e.startswith("gen") and e != "gen_init"
    )
    assert os.path.basename(cur) in survivors
    assert all(r not in survivors for r in removed)


def test_async_maintenance_crash_recovery(spark, tmp_path, monkeypatch, caplog):
    """r12 verdict #6: the async worker's two crash windows must never
    corrupt the store or stall maintenance silently.

    (a) Killed between tmp-build and repoint: the debris is a
        ``maint/baseN.work`` directory that already CONTAINS ``_DONE``
        (compact_store writes it before the publish rename) plus a
        stale snapshot dir. A restarted fanout (fresh _Maintenance,
        as after process restart) must never select the debris as a
        published base.
    (b) Worker dies mid-merge: the exception is held in the future;
        the next schedule attempt must SURFACE it (log) and proceed
        with a fresh refresh rather than stalling merge-on-read
        forever (the r13 maybe_schedule contract).

    After both injections the finalized store equals the one-shot
    batch build, and a genuinely newer base was published post-crash."""
    import logging
    import shutil
    import time

    import real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.streaming.dedup_index as di
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.streaming import (
        finalize_dedup_index,
        init_empty_shingle_store,
    )

    inp, root = str(tmp_path / "in"), str(tmp_path / "store")
    _corpus_docs(spark).repartition(7).write.parquet(inp)
    files = sorted(
        os.path.join(inp, f) for f in os.listdir(inp) if f.endswith(".parquet")
    )
    assert len(files) == 7
    os.makedirs(root, exist_ok=True)
    init_empty_shingle_store(spark, os.path.join(root, "gen_init"))

    # --- phase 1: healthy folds until a base is published -------------
    fanout_a = dedup_index_fanout(root, merge_every=2, async_maintenance=True)
    for i in (0, 1, 2):
        fanout_a(spark.read.parquet(files[i]), i)
        fanout_a.maintenance.wait(600)
    nb = di._newest_maint_base(root)
    assert nb is not None, "no maintenance base published in phase 1"

    # --- phase 2: plant the kill debris -------------------------------
    # (a real kill between compact_store's _DONE write and os.rename)
    debris_done = os.path.join(root, "maint", "base12.work")
    shutil.copytree(nb, debris_done, copy_function=os.link)
    assert os.path.exists(os.path.join(debris_done, "_DONE"))
    debris_partial = os.path.join(root, "maint", "base14.work")
    os.makedirs(debris_partial)  # mid-merge kill: no _DONE yet
    os.makedirs(os.path.join(root, "maint", "src99"))  # orphaned snapshot
    assert di._newest_maint_base(root) == nb, (
        ".work debris must never be selected as a published base"
    )

    # --- phase 3: restart + a worker that dies mid-merge --------------
    fanout_b = dedup_index_fanout(root, merge_every=2, async_maintenance=True)
    real_merge = di.merge_backlog
    calls = {"n": 0}

    def flaky_merge(spark_, src, dst):
        if calls["n"] == 0:
            calls["n"] += 1
            raise RuntimeError("simulated worker death mid-merge")
        return real_merge(spark_, src, dst)

    monkeypatch.setattr(di, "merge_backlog", flaky_merge)
    fanout_b(spark.read.parquet(files[3]), 3)
    fanout_b(spark.read.parquet(files[4]), 4)  # schedules; worker dies
    fut = fanout_b.maintenance._future
    deadline = time.time() + 600
    while not fut.done() and time.time() < deadline:
        time.sleep(0.1)
    assert fut.done() and fut.exception() is not None
    assert di._newest_maint_base(root) == nb  # nothing new published

    fanout_b(spark.read.parquet(files[5]), 5)  # light fold, no schedule
    with caplog.at_level(logging.WARNING, logger=di.__name__):
        fanout_b(spark.read.parquet(files[6]), 6)  # surfaces + reschedules
    assert any(
        "maintenance refresh failed" in r.message for r in caplog.records
    ), "the held worker exception must be logged, not swallowed"
    fanout_b.maintenance.wait(600)
    nb2 = di._newest_maint_base(root)
    assert nb2 is not None and nb2 != nb, (
        "maintenance must resume publishing after the crashed refresh"
    )

    # --- phase 4: the store is still exactly the batch build ----------
    finalize_dedup_index(spark, root)
    cur = current_store_path(root)
    full = build_shingle_artifact(spark, SF)
    assert _store_logical_rows(spark, cur) == _store_logical_rows(spark, full)
