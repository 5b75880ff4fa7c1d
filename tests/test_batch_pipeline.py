"""End-to-end batch pipeline test (SURVEY §5.2 layer 2): NDJSON articles
in -> CSV/NDJSON sinks out, with reference semantics asserted on a
deterministic fixture (including malformed lines, null/empty
descriptions, and boundary polarities)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.pipeline import (
    run_batch_pipeline,
    sentiment_summary,
    transform_articles,
)
from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.sources.articles import (
    read_articles,
    read_articles_mixed,
    read_articles_quarantine,
)

FIXTURE = [
    # fast(+0.8)*2 -> Positive / High
    {"id": "a1", "title": "Fast gains", "description": "fast fast rally!",
     "url": "http://x/1", "publishedAt": "2025-11-21T20:06:38Z",
     "lang": "en", "fetched_at": "2025-11-22T13:52:36.569054"},
    # slow(-0.8) -> Negative / High
    {"id": "a2", "title": "Slow day", "description": "slow markets...",
     "url": "http://x/2", "publishedAt": "2025-11-21T21:00:00Z",
     "lang": "en", "fetched_at": "2025-11-22T13:52:37.000000"},
    # no lexicon match -> 0.0 Neutral / Low
    {"id": "a3", "title": "Plain", "description": "nothing notable here",
     "url": "http://x/3", "publishedAt": "2025-11-21T22:00:00Z",
     "lang": "en", "fetched_at": "2025-11-22T13:52:38.000000"},
    # empty description after cleaning -> dropped by B4
    {"id": "a4", "title": "Numbers", "description": "12345 !!!",
     "url": "http://x/4", "publishedAt": "2025-11-21T23:00:00Z",
     "lang": "en", "fetched_at": "2025-11-22T13:52:39.000000"},
    # null description -> dropped by B4
    {"id": "a5", "title": "NullDesc", "description": None,
     "url": "http://x/5", "publishedAt": "2025-11-22T00:00:00Z",
     "lang": "en", "fetched_at": "2025-11-22T13:52:40.000000"},
    # nested publisher struct preserved by the schema (dropped by ref)
    {"id": "a6", "title": "Sourced", "description": "merge value stream",
     "url": "http://x/6", "publishedAt": "2025-11-22T01:00:00Z",
     "lang": "en", "fetched_at": "2025-11-22T13:52:41.000000",
     "source": {"id": "s1", "name": "Wire", "url": "http://w", "country": "us"}},
]


@pytest.fixture()
def article_file(tmp_path):
    p = tmp_path / "news_data.json"
    with open(p, "w") as f:
        for row in FIXTURE:
            f.write(json.dumps(row) + "\n")
        f.write("{ this is not json\n")  # malformed line -> silently dropped (A3)
    return str(p)


def test_end_to_end(spark, tmp_path, article_file):
    out = str(tmp_path / "out")
    scored = run_batch_pipeline(spark, article_file, out)
    rows = {r["id"]: r.asDict() for r in scored.collect()}

    # B4 filter: a4 (punct-only) and a5 (null) dropped; malformed line dropped
    assert set(rows) == {"a1", "a2", "a3", "a6"}

    assert rows["a1"]["sentiment"] == "Positive"
    assert rows["a1"]["sentiment_confidence"] == "High"
    assert rows["a1"]["polarity"] == pytest.approx(0.8)  # fast+fast+fast(title)/3... title 'Fast gains' adds fast
    assert rows["a2"]["sentiment"] == "Negative"
    assert rows["a3"]["sentiment"] == "Neutral"
    assert rows["a3"]["polarity"] == 0.0
    # merge(30)+value(20)+stream(40) / 300 = 0.3 -> Positive / Medium
    assert rows["a6"]["polarity"] == pytest.approx(0.3)
    assert rows["a6"]["sentiment_confidence"] == "Medium"

    # sinks exist and agree with the returned frame
    csv_back = spark.read.option("header", True).csv(f"{out}/sentiment_results_csv")
    json_back = spark.read.json(f"{out}/consolidated_json")
    assert csv_back.count() == 4
    assert json_back.count() == 4


def test_kernel_scorer_matches_expression_path(spark):
    """r14 optimization pin: the Arrow scoring kernel (default
    transform_articles path) must reproduce the expression path's rows
    BIT-FOR-BIT — same clean/filter/combine semantics, same exact
    integer lexicon sum and single IEEE division — over the whole
    sf0.001 corpus rendered as articles (incl. nulls/empties/
    whitespace edge docs below)."""
    from pyspark.sql import functions as F

    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.functions.sentiment import (
        classify_expr,
        confidence_expr,
        polarity_expr,
    )
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.functions.text import (
        clean_text,
    )
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.pipeline import (
        FINAL_COLUMNS,
    )
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.sources.tables import (
        table,
    )

    docs = table(spark, "/root/testdata/sf0.001", "documents").select(
        F.col("doc_id").cast("string").alias("id"),
        F.col("text").alias("title"),
        F.col("text").alias("description"),
        F.lit(None).cast("string").alias("url"),
        F.lit("p").alias("publishedAt"),
        F.lit("f").alias("fetched_at"),
    )
    edge = spark.createDataFrame(
        [
            (None, None),
            ("", ""),
            ("   ", " \t\n\x0b\f\r "),
            ("fast", "slow FAST f4st!"),
            ("a\x0bb", "big\nsmall big  big"),
            ("café", "naïve café FAST2slow"),
        ],
        "title string, description string",
    ).select(
        F.lit("e").alias("id"),
        "title",
        "description",
        F.lit(None).cast("string").alias("url"),
        F.lit("p").alias("publishedAt"),
        F.lit("f").alias("fetched_at"),
    )
    src = docs.unionByName(edge)

    got = sorted(
        tuple(r)
        for r in transform_articles(src).drop("processing_time").collect()
    )
    # reference arm: the pre-r14 expression pipeline, inline
    cleaned = src.withColumns(
        {"title_clean": clean_text("title"), "text_clean": clean_text("description")}
    )
    filtered = cleaned.filter(
        F.col("text_clean").isNotNull() & (F.trim(F.col("text_clean")) != "")
    )
    ref_df = (
        filtered.withColumn(
            "combined_text", F.concat_ws(" ", "title_clean", "text_clean")
        )
        .withColumn("polarity", polarity_expr(F.col("combined_text")))
        .withColumn("sentiment", classify_expr("polarity"))
        .withColumn("sentiment_confidence", confidence_expr("polarity"))
        .select(*FINAL_COLUMNS)
    )
    ref = sorted(tuple(r) for r in ref_df.collect())
    assert got == ref and got


def test_summary_percentages(spark, article_file):
    scored = transform_articles(read_articles(spark, article_file))
    summary = {r["sentiment"]: (r["cnt"], r["pct"]) for r in sentiment_summary(scored).collect()}
    assert summary["Positive"][0] == 2  # a1, a6
    assert summary["Negative"][0] == 1
    assert summary["Neutral"][0] == 1
    assert sum(c for c, _ in summary.values()) == 4
    assert sum(p for _, p in summary.values()) == pytest.approx(100.0)


def test_mixed_dir_ndjson_array_object_garbage(spark, tmp_path):
    """A12 reference semantics (streamlit_app.py:101-109): per file,
    NDJSON -> whole-file JSON (array OR single object) -> skip."""
    d = tmp_path / "mixed"
    d.mkdir()
    with open(d / "lines.json", "w") as f:
        for row in FIXTURE[:2]:
            f.write(json.dumps(row) + "\n")
    with open(d / "array.json", "w") as f:
        json.dump(FIXTURE[2:4], f, indent=2)  # pretty-printed array
    with open(d / "object.json", "w") as f:
        json.dump(FIXTURE[5], f, indent=2)  # single pretty-printed object
    with open(d / "garbage.json", "w") as f:
        f.write("<html>not json at all</html>\n")

    got = read_articles_mixed(spark, str(d))
    assert sorted(r["id"] for r in got.select("id").collect()) == [
        "a1", "a2", "a3", "a4", "a6",
    ]
    # nested publisher struct survives the multiLine path too
    assert got.filter(F.col("id") == "a6").head()["source"]["name"] == "Wire"


def test_mixed_dir_scales_to_many_files(spark, tmp_path):
    """A12 at file-count scale: 1,000 files must not build a 1,000-term
    isin() literal — the clean side is a broadcast semi-join, and only
    the (rare) dirty files become a driver-side re-scan list."""
    d = tmp_path / "many"
    d.mkdir()
    for i in range(1000):
        with open(d / f"f{i:04d}.json", "w") as f:
            if i % 100 == 99:  # 10 dirty files: pretty-printed array
                json.dump([{"id": f"arr{i}", "title": "t"}], f, indent=2)
            else:
                f.write(json.dumps({"id": f"nd{i}", "title": "t"}) + "\n")

    got = read_articles_mixed(spark, str(d))
    ids = [r["id"] for r in got.select("id").collect()]
    assert len(ids) == 1000
    assert sum(1 for i in ids if i.startswith("arr")) == 10
    # the literal-free plan: no 1,000-branch In() expression anywhere
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert " IN (" not in plan and "isin" not in plan


def test_mixed_dir_dirty_majority_stays_distributed(spark, tmp_path):
    """A12 dirty-majority hardening (r5 verdict #4): when the dirty
    count exceeds the collect cap, NO path list reaches the driver —
    the dirty files are re-parsed by a wholetext scan + semi-join +
    from_json(array<article>), same results as the collected path."""
    d = tmp_path / "dirtymaj"
    d.mkdir()
    for i in range(60):
        with open(d / f"f{i:03d}.json", "w") as f:
            if i % 4 == 0:  # 15 clean NDJSON files
                f.write(json.dumps({"id": f"nd{i}", "title": "t"}) + "\n")
            elif i % 4 == 1:  # pretty-printed array
                json.dump([{"id": f"arr{i}", "title": "t"},
                           {"id": f"arr{i}b", "title": "t"}], f, indent=2)
            elif i % 4 == 2:  # pretty-printed single object
                json.dump({"id": f"obj{i}", "title": "t",
                           "source": {"id": "s", "name": "Wire",
                                      "url": "u", "country": "us"}}, f, indent=2)
            else:  # garbage: skipped by both paths
                f.write("<html>not json</html>\n")

    lo = read_articles_mixed(spark, str(d), dirty_collect_cap=5)   # distributed path
    hi = read_articles_mixed(spark, str(d), dirty_collect_cap=500)  # collect path
    lo_ids = sorted(r["id"] for r in lo.select("id").collect())
    hi_ids = sorted(r["id"] for r in hi.select("id").collect())
    assert lo_ids == hi_ids
    assert len(lo_ids) == 15 + 15 * 2 + 15  # ndjson + arrays(2 each) + objects
    # nested struct survives the distributed from_json path
    assert lo.filter(F.col("id") == "obj2").head()["source"]["name"] == "Wire"
    # literal-free there too
    plan = lo._jdf.queryExecution().executedPlan().toString()
    assert " IN (" not in plan and "isin" not in plan


def test_quarantine_scan_preserves_bad_lines(spark, tmp_path):
    """PERMISSIVE quarantine split: good rows parse, bad lines survive
    VERBATIM with their source file — nothing silently dropped."""
    d = tmp_path / "quar"
    d.mkdir()
    with open(d / "batch.json", "w") as f:
        for row in FIXTURE[:3]:
            f.write(json.dumps(row) + "\n")
        f.write("{not valid json}\n")
        f.write("also not json\n")

    good, quarantine = read_articles_quarantine(spark, str(d))
    assert sorted(r["id"] for r in good.select("id").collect()) == ["a1", "a2", "a3"]
    bad = quarantine.collect()
    assert sorted(r["raw_line"] for r in bad) == sorted(
        ["{not valid json}", "also not json"]
    )
    assert all(r["source_file"].endswith("batch.json") for r in bad)


def test_schema_repair_tolerates_missing_columns(spark):
    df = spark.createDataFrame([("t", "fast fast text")], "title string, description string")
    out = transform_articles(df)
    assert set(out.columns) >= {"title", "description", "url", "polarity", "sentiment"}
    row = out.head()
    assert row["url"] is None and row["sentiment"] == "Positive"


def test_python_datasource_batch_and_stream(spark, tmp_path):
    """Spark 4 Python Data Source API: the article API as a first-class
    format — batch read fans pages out to executor tasks; the stream
    reader ingests by page offsets with no NDJSON landing zone."""
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.sources.datasource import (
        ArticlesDataSource,
    )
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.sources.http import (
        synthetic_fetcher,
    )

    spark.dataSource.register(ArticlesDataSource)

    df = spark.read.format("articles_api").option("batches", "4").load()
    rows = df.collect()
    assert len(rows) == 40
    assert {r["id"] for r in rows} == {
        a["id"] for b in range(4) for a in synthetic_fetcher(b)
    }

    q = (
        spark.readStream.format("articles_api")
        .option("batches", "3")
        .load()
        .writeStream.format("memory")
        .queryName("api_stream_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.sql("SELECT count(*) c FROM api_stream_test").head()["c"] == 30


def test_curated_corpus_materialization_matches_funnel(spark, tmp_path):
    """write_curated_corpus lands exactly the rows curation_pipeline
    counts as n_sampled, partitioned by lang (pruning-ready)."""
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.curation import (
        write_curated_corpus,
    )
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans import (
        REGISTRY,
    )

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "curated")
    write_curated_corpus(spark, sf, out)

    funnel = {
        r["lang"]: (r["n_sampled"], r["tokens_sampled"])
        for r in REGISTRY["curation_pipeline"].fn(spark, sf).collect()
    }
    back = spark.read.parquet(out)
    got = {
        r["lang"]: (r["n"], r["toks"])
        for r in back.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("est_tokens").alias("toks"))
        .collect()
    }
    assert {k: v for k, v in funnel.items() if v[0] > 0} == got

    # partition pruning: a lang filter must read only that partition
    one_lang = next(k for k, v in got.items())
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        back.filter(F.col("lang") == one_lang).explain("formatted")
    assert f"lang={one_lang}" in buf.getvalue() or "PartitionFilters" in buf.getvalue()
