"""Streaming tests (SURVEY §5.2 layer 4): availableNow end-to-end runs,
checkpoint-based exactly-once across restarts, watermarked windows vs
the batch oracle, and streaming dedup."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.sources.tables import (
    events_with_ts,
)
from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.streaming import (
    batch_fanout,
    dedup_within_watermark,
    session_counts,
    start_pipeline,
    windowed_counts,
)

SF = "/root/testdata/sf0.001"


def write_batches(input_dir, batches):
    input_dir.mkdir(parents=True, exist_ok=True)
    for i, batch in enumerate(batches):
        with open(input_dir / f"batch_{i}.json", "w") as f:
            for row in batch:
                f.write(json.dumps(row) + "\n")


def article(i, desc):
    return {
        "id": f"id{i}",
        "title": f"title {i}",
        "description": desc,
        "url": f"http://x/{i}",
        "publishedAt": "2025-11-21T20:06:38Z",
        "lang": "en",
        "fetched_at": f"2025-11-22T13:52:{i:02d}.000000",
    }


def test_single_query_fanout_available_now(spark, tmp_path):
    inp, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    write_batches(
        inp,
        [
            [article(1, "fast fast gains"), article(2, "slow losses")],
            [article(3, "merge value stream"), article(4, "12345 !!")],
        ],
    )
    q = start_pipeline(spark, str(inp), str(out), str(ckpt), available_now=True)
    q.awaitTermination(120)

    scored = spark.read.parquet(f"{out}/scored")
    got = {r["id"]: r["sentiment"] for r in scored.collect()}
    # article 4 is punct-only -> dropped by the B4 filter inside the stream
    assert got == {"id1": "Positive", "id2": "Negative", "id3": "Positive"}

    metrics = spark.read.parquet(f"{out}/metrics")
    assert metrics.agg(F.sum("cnt")).head()[0] == 3

    # memory/global view maintained by the foreachBatch fan-out
    view = spark.sql("SELECT * FROM global_temp.news_sentiment")
    assert {r["sentiment"]: r["cnt"] for r in view.collect()} == {
        "Positive": 2,
        "Negative": 1,
    }


def test_checkpoint_no_reprocessing_on_restart(spark, tmp_path):
    """Exactly-once file-source semantics: a restarted query with the
    same checkpoint must not re-ingest already-committed files."""
    inp, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    write_batches(inp, [[article(1, "fast rally")]])
    q = start_pipeline(spark, str(inp), str(out), str(ckpt), available_now=True)
    q.awaitTermination(120)
    assert spark.read.parquet(f"{out}/scored").count() == 1

    # second run: one new file; old file must not be reprocessed
    write_batches(inp / "more", [])  # ensure dir exists trick not needed; add file directly
    with open(inp / "batch_new.json", "w") as f:
        f.write(json.dumps(article(9, "slow slump")) + "\n")
    q2 = start_pipeline(spark, str(inp), str(out), str(ckpt), available_now=True)
    q2.awaitTermination(120)

    scored = spark.read.parquet(f"{out}/scored")
    assert scored.count() == 2  # 1 old + 1 new, no duplicates
    assert scored.filter(F.col("id") == "id1").count() == 1


def test_memory_view_is_local_relation_not_sink_rescan(spark, tmp_path):
    """The global view must be published from driver-side running totals
    (a LocalRelation), never by re-aggregating the cumulative scored/
    sink inside the trigger — per-batch view cost is O(classes), not
    O(corpus)."""
    inp, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    write_batches(inp, [[article(1, "fast fast gains"), article(2, "slow losses")]])
    q = start_pipeline(spark, str(inp), str(out), str(ckpt), available_now=True)
    q.awaitTermination(120)
    view = spark.sql("SELECT * FROM global_temp.news_sentiment")
    plan = view._jdf.queryExecution().executedPlan().toString()
    # driver-local rows surface as LocalTableScan or Scan ExistingRDD;
    # either is fine — what must NOT appear is a file-source scan
    assert "LocalTableScan" in plan or "ExistingRDD" in plan
    assert "FileScan" not in plan and "parquet" not in plan.lower()


def test_batch_retry_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-delivering the same (batch_df,
    batch_id) must not duplicate sink rows or double-count the view."""
    out = tmp_path / "out"
    fanout = batch_fanout(str(out), memory_table="retry_view")
    batch = spark.createDataFrame(
        [("id1", "Positive", 0.5), ("id2", "Negative", -0.4), ("id3", "Positive", 0.2)],
        "id string, sentiment string, polarity double",
    )
    fanout(batch, 0)
    fanout(batch, 0)  # simulated retry of the same micro-batch
    assert spark.read.parquet(f"{out}/scored").count() == 3
    assert spark.read.parquet(f"{out}/metrics").agg(F.sum("cnt")).head()[0] == 3
    view = {r["sentiment"]: r["cnt"] for r in spark.sql("SELECT * FROM global_temp.retry_view").collect()}
    assert view == {"Positive": 2, "Negative": 1}


def test_crash_between_scored_and_metrics_then_replay(spark, tmp_path, monkeypatch):
    """Crash-consistency of the partition-path overwrite (r5 verdict #7):
    kill the batch AFTER the scored write commits but BEFORE the metrics
    write, then replay the same batch_id in a fresh closure ("restarted
    process"). The replay must leave exactly one copy of the rows, a
    metrics sink consistent with the scored sink, and correct view
    totals — the at-least-once contract under a torn fan-out, not just
    a clean re-delivery."""
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.streaming import (
        pipeline as P,
    )

    out = tmp_path / "out"
    fanout = P.batch_fanout(str(out), memory_table="crash_view")
    batch = spark.createDataFrame(
        [("id1", "Positive", 0.5), ("id2", "Negative", -0.4), ("id3", "Positive", 0.2)],
        "id string, sentiment string, polarity double",
    )
    real_counts_df = P._counts_df
    calls = {"n": 0}

    def failing_counts_df(session, items):
        calls["n"] += 1
        if calls["n"] == 1:  # first call = the metrics write of batch 0
            raise RuntimeError("simulated crash before metrics commit")
        return real_counts_df(session, items)

    monkeypatch.setattr(P, "_counts_df", failing_counts_df)
    with pytest.raises(RuntimeError, match="simulated crash"):
        fanout(batch, 0)
    # torn state on disk: scored partition committed, metrics absent
    assert spark.read.parquet(f"{out}/scored").count() == 3
    with pytest.raises(Exception):
        spark.read.parquet(f"{out}/metrics").collect()

    # restart: fresh closure seeds from (empty) metrics, replays batch 0
    monkeypatch.setattr(P, "_counts_df", real_counts_df)
    fanout2 = P.batch_fanout(str(out), memory_table="crash_view")
    fanout2(batch, 0)
    for _ in range(2):  # and a post-success replay stays stable too
        assert spark.read.parquet(f"{out}/scored").count() == 3
        assert (
            spark.read.parquet(f"{out}/metrics").agg(F.sum("cnt")).head()[0] == 3
        )
        view = {
            r["sentiment"]: r["cnt"]
            for r in spark.sql("SELECT * FROM global_temp.crash_view").collect()
        }
        assert view == {"Positive": 2, "Negative": 1}
        fanout2(batch, 0)


def test_console_sink_prints_batch(spark, tmp_path, capsys):
    """A6: the console debug sink prints each micro-batch's rows from
    inside the single-query fan-out."""
    out = tmp_path / "out"
    fanout = batch_fanout(str(out), memory_table="console_view", console=True)
    batch = spark.createDataFrame(
        [("id1", "Positive", 0.5)], "id string, sentiment string, polarity double"
    )
    fanout(batch, 7)
    printed = capsys.readouterr().out
    assert "micro-batch 7" in printed
    assert "Positive" in printed


def test_view_totals_seeded_from_metrics_on_restart(spark, tmp_path):
    """A fresh process (new fanout closure) must recover prior totals
    from the committed metrics sink — O(batches) rows, read once — and
    skip replayed batch ids."""
    out = tmp_path / "out"
    first = batch_fanout(str(out), memory_table="seeded_view")
    b0 = spark.createDataFrame([("a", "Positive", 0.5)], "id string, sentiment string, polarity double")
    first(b0, 0)

    second = batch_fanout(str(out), memory_table="seeded_view")  # "restart"
    second(b0, 0)  # replay of an already-committed batch: must be a no-op for totals
    b1 = spark.createDataFrame(
        [("b", "Positive", 0.3), ("c", "Neutral", 0.0)],
        "id string, sentiment string, polarity double",
    )
    second(b1, 1)
    view = {r["sentiment"]: r["cnt"] for r in spark.sql("SELECT * FROM global_temp.seeded_view").collect()}
    assert view == {"Positive": 2, "Neutral": 1}


def test_windowed_counts_match_batch_oracle(spark, tmp_path):
    """Stream the events table through a watermarked tumbling window and
    assert exact equality with the batch date_trunc aggregation."""
    src = tmp_path / "events_json"
    events = events_with_ts(spark, SF)
    events.select(
        "event_id", F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
        "event_type",
    ).coalesce(2).write.mode("overwrite").json(str(src))

    stream = (
        spark.readStream.schema("event_id bigint, ts_str string, event_type string")
        .json(str(src))
        .withColumn("ts", F.to_timestamp("ts_str"))
    )
    agg = windowed_counts(stream, ts_col="ts", key_col="event_type", window_size="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("hourly_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["window_start"], r["event_type"]): r["cnt"]
        for r in spark.sql("SELECT * FROM hourly_stream").collect()
    }
    expected = {
        (r["hour_start"], r["event_type"]): r["cnt"]
        for r in events.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == expected


def test_session_windows_match_batch_sessionization(spark, tmp_path):
    """Stream the events table through watermarked session windows
    (30 min gap) and assert exact equality with the batch lag/cumsum
    sessionization — the same cross-check pattern windowed_counts has."""
    src = tmp_path / "events_json"
    events = events_with_ts(spark, SF)
    events.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
        "user_id",
    ).coalesce(2).write.mode("overwrite").json(str(src))

    stream = (
        spark.readStream.schema("event_id bigint, ts_str string, user_id bigint")
        .json(str(src))
        .withColumn("ts", F.to_timestamp("ts_str"))
    )
    agg = session_counts(stream, ts_col="ts", key_col="user_id", gap="30 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("session_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"], r["session_end"]): r["n_events"]
        for r in spark.sql("SELECT * FROM session_stream").collect()
    }

    # batch twin: gap > 30 min starts a new session; session_window's
    # end = last event ts + gap
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    sess = (
        events.withColumn("prev", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            (F.col("prev").isNull())
            | ((F.col("ts").cast("double") - F.col("prev").cast("double")) >= 30 * 60),
        )
        .withColumn("sess_id", F.sum(F.col("new_sess").cast("int")).over(w))
        .groupBy("user_id", "sess_id")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
            F.date_format(
                F.max("ts") + F.expr("INTERVAL 30 MINUTES"), "yyyy-MM-dd HH:mm:ss.SSSSSS"
            ).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    expected = {
        (r["user_id"], r["session_start"], r["session_end"]): r["n_events"]
        for r in sess.collect()
    }
    assert got == expected


def test_streaming_dedup_within_watermark(spark, tmp_path):
    src = tmp_path / "dups"
    src.mkdir()
    rows = [
        {"k": "a", "ts_str": "2024-01-01 00:00:01"},
        {"k": "a", "ts_str": "2024-01-01 00:10:00"},  # dup within watermark
        {"k": "b", "ts_str": "2024-01-01 00:20:00"},
    ]
    with open(src / "f.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    stream = (
        spark.readStream.schema("k string, ts_str string")
        .json(str(src))
        .withColumn("ts", F.to_timestamp("ts_str"))
    )
    deduped = dedup_within_watermark(stream, ["k"], "ts", watermark="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["k"] for r in spark.sql("SELECT k FROM dedup_stream").collect())
    assert got == ["a", "b"]


def test_stream_stream_left_outer_join_emits_unmatched(spark, tmp_path):
    """LEFT OUTER stream-stream join: an impression with no click inside
    its hour must emit with NULL click once the watermark passes the
    join window. Far-future rows on BOTH sides push the (min-policy)
    global watermark so eviction happens inside the availableNow run."""
    imp_dir, clk_dir = tmp_path / "imp", tmp_path / "clk"
    imp_dir.mkdir(), clk_dir.mkdir()
    imps = [
        {"imp_id": "i1", "ts_str": "2024-01-01 10:00:00"},
        {"imp_id": "i2", "ts_str": "2024-01-01 11:00:00"},  # never clicked
        {"imp_id": "i_future", "ts_str": "2024-01-02 10:00:00"},  # watermark pusher
    ]
    clks = [
        {"imp_ref": "i1", "ts_str": "2024-01-01 10:20:00"},
        {"imp_ref": "zz", "ts_str": "2024-01-02 10:00:00"},  # watermark pusher
    ]
    with open(imp_dir / "a.json", "w") as f:
        for r in imps:
            f.write(json.dumps(r) + "\n")
    with open(clk_dir / "a.json", "w") as f:
        for r in clks:
            f.write(json.dumps(r) + "\n")

    imp = (
        spark.readStream.schema("imp_id string, ts_str string").json(str(imp_dir))
        .withColumn("imp_ts", F.to_timestamp("ts_str"))
        .withWatermark("imp_ts", "10 minutes")
    )
    clk = (
        spark.readStream.schema("imp_ref string, ts_str string").json(str(clk_dir))
        .withColumn("clk_ts", F.to_timestamp("ts_str"))
        .withWatermark("clk_ts", "10 minutes")
    )
    joined = imp.join(
        clk,
        F.expr(
            "imp_id = imp_ref AND clk_ts >= imp_ts AND clk_ts <= imp_ts + interval 1 hour"
        ),
        "left_outer",
    ).select("imp_id", F.date_format("clk_ts", "HH:mm").alias("click_at"))
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_left_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["imp_id"], r["click_at"])
        for r in spark.sql("SELECT * FROM ss_left_join").collect()
    }
    assert ("i1", "10:20") in got
    assert ("i2", None) in got  # the outer-emitted unmatched impression


def test_stream_stream_join_with_watermarks(spark, tmp_path):
    """Stream-stream inner join (impressions x clicks) with watermarks
    and an event-time range constraint — the join class the reference
    never reaches. availableNow drains both sides; result must equal the
    batch join."""
    imp_dir, clk_dir = tmp_path / "imp", tmp_path / "clk"
    imp_dir.mkdir(), clk_dir.mkdir()
    imps = [
        {"imp_id": "i1", "ts_str": "2024-01-01 10:00:00"},
        {"imp_id": "i2", "ts_str": "2024-01-01 11:00:00"},
    ]
    clks = [
        {"imp_ref": "i1", "ts_str": "2024-01-01 10:20:00"},   # within 1h of i1
        {"imp_ref": "i2", "ts_str": "2024-01-01 13:00:00"},   # too late for i2
        {"imp_ref": "i9", "ts_str": "2024-01-01 10:30:00"},   # no impression
    ]
    with open(imp_dir / "a.json", "w") as f:
        for r in imps:
            f.write(json.dumps(r) + "\n")
    with open(clk_dir / "a.json", "w") as f:
        for r in clks:
            f.write(json.dumps(r) + "\n")

    imp = (
        spark.readStream.schema("imp_id string, ts_str string").json(str(imp_dir))
        .withColumn("imp_ts", F.to_timestamp("ts_str"))
        .withWatermark("imp_ts", "2 hours")
    )
    clk = (
        spark.readStream.schema("imp_ref string, ts_str string").json(str(clk_dir))
        .withColumn("clk_ts", F.to_timestamp("ts_str"))
        .withWatermark("clk_ts", "2 hours")
    )
    joined = imp.join(
        clk,
        F.expr(
            "imp_id = imp_ref AND clk_ts >= imp_ts AND clk_ts <= imp_ts + interval 1 hour"
        ),
    ).select("imp_id", F.date_format("clk_ts", "HH:mm").alias("click_at"))
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["imp_id"], r["click_at"]) for r in spark.sql("SELECT * FROM ss_join").collect()}
    assert got == {("i1", "10:20")}


def test_streaming_near_dup_suppression_against_index(spark, tmp_path):
    """Streaming twin of incremental_near_dup: each micro-batch pays
    signatures for its own rows only and probes the PERSISTED banded
    index; verified near-copies of indexed corpus docs are dropped
    before the sink, novel articles pass. Exercises both batches of an
    availableNow drain through foreachBatch."""
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.operators.stream_dedup import (
        drop_near_dups,
    )
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.dedup_queries import (
        _shingle_store,
    )
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.sources.articles import (
        stream_articles,
    )

    store = _shingle_store(spark, SF)
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(6)
        .collect()
    )
    # near-copies: corpus text with the last 3 tokens dropped (the same
    # geometry the corpus's planted twins use — jaccard well over 0.5);
    # novel: out-of-vocabulary words that can't collide with anything
    dup_arts = [
        article(i, " ".join(r["text"].split()[:-3]))
        for i, r in enumerate(docs)
    ]
    novel_arts = [
        article(100 + i, f"qx{i} wz{i} vk{i} jq{i} zz{i} xx{i} yy{i} kk{i}")
        for i in range(4)
    ]
    inp, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    write_batches(inp, [dup_arts[:3] + novel_arts[:2], dup_arts[3:] + novel_arts[2:]])

    kept_ids = []

    def sink(batch_df, batch_id):
        kept = drop_near_dups(
            batch_df, store, id_col="id", text_col="description"
        )
        kept_ids.extend(r["id"] for r in kept.select("id").collect())

    q = (
        stream_articles(spark, str(inp))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    assert sorted(kept_ids) == sorted(a["id"] for a in novel_arts)


def test_near_dup_replay_not_swallowed_by_own_index_entry(spark):
    """At-least-once hardening: a batch row whose id is ALREADY in the
    index (replayed micro-batch after checkpoint recovery over a
    self-indexing sink) must not self-match at jaccard 1.0 and vanish.
    Default exclude_self=True keeps it; exclude_self=False restores the
    strict 'any indexed near-copy is a dup' semantics."""
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.operators.stream_dedup import (
        drop_near_dups,
    )
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.dedup_queries import (
        _shingle_store,
    )

    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.operators.stream_dedup import (
        near_dup_matches,
    )

    store = _shingle_store(spark, SF)
    indexed = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(3)
    )
    replay_ids = {r["doc_id"] for r in indexed.select("doc_id").collect()}
    # replay: the exact indexed rows (same ids, same text)
    m_default = near_dup_matches(indexed, store).collect()
    assert all(r["doc_id"] != r["dup_of"] for r in m_default)  # no self-match
    m_strict = near_dup_matches(indexed, store, exclude_self=False).collect()
    selfs = [r for r in m_strict if r["doc_id"] == r["dup_of"]]
    # strict mode sees every replayed row as its own jaccard-1.0 copy
    assert {r["doc_id"] for r in selfs} == replay_ids
    assert all(r["jaccard"] == 1.0 for r in selfs)
    # and a row whose ONLY indexed neighbor is itself survives the
    # default drop path: planted twins (base id + offset) aside, any
    # match that remains must point at a genuinely different doc
    kept = drop_near_dups(indexed, store)
    dropped = replay_ids - {r["doc_id"] for r in kept.select("doc_id").collect()}
    other_matched = {r["doc_id"] for r in m_default}
    assert dropped == other_matched  # dropped iff matched a DIFFERENT doc


def test_restart_seed_bounded_by_metrics_summary(spark, tmp_path, monkeypatch):
    """r6 verdict #6: cold-restart seeding against a LONG-LIVED stream's
    sink — 1,200 accumulated per-batch metric dirs, synthesized directly
    (pyarrow) so the test measures the seed path, not a 1,200-batch
    drain. Asserts the compacted path (metrics_summary + tail fold)
    recovers byte-identical totals to the full-scan fallback, never
    double-counts a replayed batch, and is measurably faster than
    scanning every batch dir."""
    import os
    import shutil
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.streaming.pipeline import (
        batch_fanout,
    )

    out = str(tmp_path / "out")
    n_batches = 1200
    for b in range(n_batches):
        d = os.path.join(out, "metrics", f"batch_id={b}")
        os.makedirs(d)
        pq.write_table(
            pa.table(
                {"sentiment": ["Positive", "Negative"], "cnt": pa.array([2, 1], "int64")}
            ),
            os.path.join(d, "part-0.parquet"),
        )
    # summary as a prior process would have left it: snapshot at batch
    # 1184, so the seed's tail fold covers batches 1185-1199 only
    sd = os.path.join(out, "metrics_summary")
    os.makedirs(sd)
    pq.write_table(
        pa.table(
            {
                "sentiment": ["Positive", "Negative"],
                "cnt": pa.array([2 * 1185, 1185], "int64"),
                "last_batch_id": pa.array([1184, 1184], "int64"),
            }
        ),
        os.path.join(sd, "part-0.parquet"),
    )

    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.streaming.pipeline import (
        seed_totals,
    )

    # warmup: absorb the session's one-time parquet-reader costs so the
    # two timed seeds below differ only in strategy
    spark.read.parquet(os.path.join(out, "metrics", "batch_id=0")).collect()

    t0 = time.time()
    totals_fast, applied_fast = seed_totals(spark, out)
    seed_fast = time.time() - t0
    assert totals_fast == {"Positive": 2 * n_batches, "Negative": n_batches}
    assert applied_fast == set(range(n_batches))

    # fallback: no summary -> full per-batch scan, identical recovery
    shutil.rmtree(sd)
    t0 = time.time()
    totals_full, applied_full = seed_totals(spark, out)
    seed_full = time.time() - t0
    assert totals_full == totals_fast
    assert applied_full == applied_fast
    # the compacted seed reads 1 snapshot + a 15-dir tail instead of
    # 1,200 batch dirs — wall-clock evidence, not just row counts
    assert seed_fast < seed_full, (seed_fast, seed_full)
    print(f"seed cost: with summary {seed_fast:.2f}s vs full scan {seed_full:.2f}s")

    # GENERIC (non-local) path (r7 verdict #7): with the local listdir
    # branch disabled, the _LATEST sidecar must bound the tail read to
    # explicit batch paths — no partition discovery — and recover the
    # identical state, measurably faster than the 1,200-dir full scan
    os.makedirs(sd)
    pq.write_table(
        pa.table(
            {
                "sentiment": ["Positive", "Negative"],
                "cnt": pa.array([2 * 1185, 1185], "int64"),
                "last_batch_id": pa.array([1184, 1184], "int64"),
            }
        ),
        os.path.join(sd, "part-0.parquet"),
    )
    metrics_dir = os.path.join(out, "metrics")
    with open(os.path.join(metrics_dir, "_LATEST"), "w") as fh:
        fh.write(str(n_batches - 1))
    real_isdir = os.path.isdir
    monkeypatch.setattr(
        os.path, "isdir", lambda p: False if p == metrics_dir else real_isdir(p)
    )
    t0 = time.time()
    totals_side, applied_side = seed_totals(spark, out)
    seed_side = time.time() - t0
    monkeypatch.undo()
    assert totals_side == totals_fast and applied_side == applied_fast
    assert seed_side < seed_full, (seed_side, seed_full)
    print(f"seed cost: sidecar generic path {seed_side:.2f}s")

    # and the streaming closure consumes the seed correctly: applying a
    # NEW batch folds forward; replaying an already-applied batch is a
    # no-op on the totals
    batch = spark.createDataFrame([("Positive",)], "sentiment string")
    fanout = batch_fanout(out, memory_table="seed_view")
    fanout(batch, n_batches)
    view = {
        r["sentiment"]: r["cnt"]
        for r in spark.table("global_temp.seed_view").collect()
    }
    assert view == {"Positive": 2 * n_batches + 1, "Negative": n_batches}
    fanout(batch, n_batches)  # replay
    replay = {
        r["sentiment"]: r["cnt"]
        for r in spark.table("global_temp.seed_view").collect()
    }
    assert replay == view
    # and the fan-out advanced the sidecar monotonically past our seed
    with open(os.path.join(out, "metrics", "_LATEST")) as fh:
        assert int(fh.read()) == n_batches


def test_latency_listener_wiring(spark, tmp_path):
    """r9 verdict #5 regression guard: the StreamingQueryListener
    harness captures per-micro-batch progress (batchId, rows,
    durationMs phases) and the e2e measurement maps every landed file
    to a commit with a positive latency."""
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.streaming.latency import (
        measure_e2e_latency,
    )

    r = measure_e2e_latency(
        spark,
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        n_files=3,
        rows_per_file=50,
        trigger_seconds=1,
        land_gap_seconds=0.2,
    )
    assert r["n_batches"] >= 1
    assert len(r["e2e_latencies_s"]) == 3  # every file mapped to a commit
    assert all(v > 0 for v in r["e2e_latencies_s"])
    assert r["e2e_p50_s"] > 0 and r["e2e_p99_s"] >= r["e2e_p50_s"]
    # engine-side phases came through the listener, not the sink
    assert r["addBatch_p50_s"] > 0 and r["triggerExecution_p50_s"] > 0
