"""Lloyd-codebook pin: the pinned oracle path must be byte-equivalent
to the trained (in-SQL Lloyd) oracle path (r10 verdict #1 / r11).

Above ``_LLOYD_SQL_CAP`` candidates the PQ-family callable oracles
replace the in-SQL Lloyd training chain with a literal-VALUES codebook
pinned from the Spark-trained artifact. This test forces the pin path
at fixture scale (cap monkeypatched to 0) and asserts DuckDB returns
EXACTLY the same rows for the pinned SQL as for the trained SQL, for
all five Lloyd-family oracles — so at sf10 the pinned oracle verifies
the same encode/ADC/routing/rerank semantics the trained one does.
"""

from __future__ import annotations

import pytest

from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans import (
    similarity_queries as sq,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    from scripts.check_oracle import duck_con

    con = duck_con(SF)
    yield con
    con.close()


@pytest.fixture(scope="module")
def pins(tmp_path_factory, spark):
    """Train both codebooks at sf0.01 with the cap forced to 0 so the
    pin files are written into an isolated registry dir."""
    import os

    pin_dir = str(tmp_path_factory.mktemp("pins"))
    old_env = os.environ.get("SPARK_GRAFT_MODEL_DIR")
    old_cap = sq._LLOYD_SQL_CAP
    os.environ["SPARK_GRAFT_MODEL_DIR"] = pin_dir
    sq._LLOYD_SQL_CAP = 0
    try:
        sq._pq_lloyd_codebook(spark, SF)  # writes the raw pin
        sq._ivfpq_residual_shortlist_df(spark, SF, 64)  # residual pin
        raw = sq._read_codebook_pin(SF, "raw")
        res = sq._read_codebook_pin(SF, "residual")
    finally:
        sq._LLOYD_SQL_CAP = old_cap
        if old_env is None:
            os.environ.pop("SPARK_GRAFT_MODEL_DIR", None)
        else:
            os.environ["SPARK_GRAFT_MODEL_DIR"] = old_env
    assert raw and res, "pin files were not written"
    # shape: k x 8 subspaces rows of 8 int coordinates
    assert len(raw) == 64 * 8 and len(res) == 64 * 8
    assert all(len(carr) == 8 for _, _, carr in raw)
    return {"raw": raw, "residual": res}


N_CAND = 497  # sf0.01 candidates (500 embeddings, vec_id >= 3)
SL = sq._pq_lloyd_shortlist_depth(N_CAND)


@pytest.mark.parametrize(
    "kind,build",
    [
        ("raw", lambda p: "WITH " + sq._pq_lloyd_ctes(SL, pinned=p)
         + ",\nx AS (SELECT * FROM shortlist WHERE arank <= 5)\n"
           "SELECT query_id, neighbor_id, adc_d, arank FROM x"),
        ("raw", lambda p: "WITH " + sq._ivfpq_ctes(SL, pinned=p)
         + ",\nx AS (SELECT * FROM slst WHERE arank <= 5)\n"
           "SELECT query_id, neighbor_id, adc_d, arank FROM x"),
        ("residual", lambda p: "WITH "
         + sq._ivfpq_residual_base_ctes(pinned=p)
         + ",\nx AS (SELECT * FROM rslst WHERE arank <= 5)\n"
           "SELECT query_id, neighbor_id, adc_d, arank FROM x"),
    ],
    ids=["lloyd-shortlist", "ivfpq-slst", "residual-rslst"],
)
def test_pinned_sql_equals_trained_sql(duck, pins, kind, build):
    trained = sorted(duck.execute(build(None)).fetchall())
    pinned = sorted(duck.execute(build(pins[kind])).fetchall())
    assert trained == pinned


def test_pin_roundtrip_is_exact(pins):
    """The JSON pin stores exact int64 micro-unit coordinates — no
    float round-trip loss is possible by construction."""
    for rows in pins.values():
        for s, cid, carr in rows:
            assert isinstance(s, int) and isinstance(cid, int)
            assert all(isinstance(x, int) for x in carr)


def test_oracle_falls_back_rows_only_without_pin(tmp_path, monkeypatch):
    """Above the cap with NO pin on disk, every Lloyd-family callable
    oracle returns None (rows-only contract) instead of emitting an
    infeasible in-SQL Lloyd."""
    monkeypatch.setenv("SPARK_GRAFT_MODEL_DIR", str(tmp_path))
    monkeypatch.setattr(sq, "_LLOYD_SQL_CAP", 0)
    for fn in (
        sq._pq_lloyd_recall_oracle,
        sq._ivfpq_topk_oracle,
        sq._ivfpq_recall_oracle,
        sq._ivfpq_residual_topk_oracle,
        sq._ivfpq_residual_recall_oracle,
    ):
        assert fn(SF) is None
