"""Unit tests for the as-of join operator (union + window rendering)."""

from __future__ import annotations

from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.operators.asof import (
    asof_join,
)


def test_asof_basic_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, "e1"), (1, 25, "e2"), (2, 5, "e3")],
        "k bigint, t bigint, ev string",
    ).selectExpr("k", "timestamp_micros(t * 1000000) AS t", "ev")
    right = spark.createDataFrame(
        [(1, 8, "o1"), (1, 20, "o2"), (2, 30, "o3")],
        "k bigint, t bigint, name string",
    ).selectExpr("k AS rk", "timestamp_micros(t * 1000000) AS rt", "name")

    out = asof_join(
        left, right, left_on="k", right_on="rk", left_ts="t", right_ts="rt",
        right_cols=["name"],
    )
    got = {r["ev"]: r["name"] for r in out.collect()}
    # matches DuckDB ASOF LEFT JOIN on the same data (probed separately):
    # e1 -> o1 (8 <= 10 < 20), e2 -> o2, e3 -> no order yet -> null
    assert got == {"e1": "o1", "e2": "o2", "e3": None}


def test_asof_inclusive_tie(spark):
    left = spark.createDataFrame([(1, 10, "e")], "k bigint, t bigint, ev string") \
        .selectExpr("k", "timestamp_micros(t * 1000000) AS t", "ev")
    right = spark.createDataFrame([(1, 10, "same-instant")], "k bigint, t bigint, name string") \
        .selectExpr("k AS rk", "timestamp_micros(t * 1000000) AS rt", "name")
    out = asof_join(left, right, "k", "rk", "t", "rt", ["name"])
    # inclusive >=: a right row at exactly the left timestamp matches
    assert out.head()["name"] == "same-instant"


def test_asof_null_field_stays_with_its_row(spark):
    """A matched right row with a NULL in one column must deliver that
    NULL — not back-fill the column from an older right row (row-level
    as-of semantics; the right payload travels as one struct)."""
    left = spark.createDataFrame([(1, 30, "e")], "k bigint, t bigint, ev string") \
        .selectExpr("k", "timestamp_micros(t * 1000000) AS t", "ev")
    right = spark.createDataFrame(
        [(1, 10, "old-name", 5.0), (1, 20, None, 7.0)],
        "k bigint, t bigint, name string, price double",
    ).selectExpr("k AS rk", "timestamp_micros(t * 1000000) AS rt", "name", "price")
    out = asof_join(left, right, "k", "rk", "t", "rt", ["name", "price"])
    row = out.head()
    # the t=20 row wins; its name is legitimately NULL and must stay NULL
    assert row["price"] == 7.0
    assert row["name"] is None


def test_asof_preserves_left_rowcount(spark):
    left = spark.range(100).selectExpr(
        "id AS k", "timestamp_micros(id * 1000000) AS t", "id AS payload"
    )
    right = spark.range(10).selectExpr(
        "id AS rk", "timestamp_micros(id * 500000) AS rt", "id * 2 AS val"
    )
    out = asof_join(left, right, "k", "rk", "t", "rt", ["val"])
    assert out.count() == 100  # left join: never drops or duplicates left rows
