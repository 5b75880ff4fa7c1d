"""Property tests for the consolidated scale dials (r10 verdict #4).

Three invariants per dial, plus exact committed-fixture pins:

- **monotone**: more data never loosens a dial;
- **fixture no-op**: every committed fixture size resolves to the
  historical constant, so sf0.001..sf1 plans and hashes are frozen;
- **slab-edge continuity**: crossing a boundary moves the dial by the
  smallest step the formula allows (no cliffs).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.dials import (
    _DOC_PAIR_CAP,
    _HEAVY_PAIR_CAP,
    _PAIRWISE_CAP,
    _doc_cap_mod,
    _emb_heavy_cap_mod,
    _event_user_cap_mod,
    _fuzzy_block_len,
    _heavy_pair_cap_mod,
    _text_corpus_cap_mod,
    _lsh_bits,
    _pair_cap_mod,
    _semdedup_k,
)

# committed fixture sizes: (embeddings rows, documents rows, customer
# rows) per corpus — sf0.001/sf0.01 share 500/500; sf0.1 = 2k/5k;
# testdata_sf1 = 20k/50k; customer counts grow to 150k at sf1.
FIXTURE_EMB = [500, 500, 2_000, 20_480]
FIXTURE_DOCS = [500, 500, 5_000, 50_000]
FIXTURE_CUST = [150, 1_500, 15_000, 150_000]
FIXTURE_EVENTS = [1_000, 10_000, 100_000, 1_000_000]

N = st.integers(min_value=1, max_value=10**12)


# ---- fixture no-op pins (hash stability: these exact values froze the
# ---- committed sf0.001..sf1 result hashes) --------------------------------


def test_fixture_pins():
    assert all(_pair_cap_mod(n) == 1 for n in FIXTURE_EMB)
    assert all(_doc_cap_mod(n) == 1 for n in FIXTURE_DOCS)
    # heavy-pair cap (r12): no-op at every fixture AND at sf10 (the
    # scale whose hashes r11 froze) - first active corpus is sf100
    assert all(_heavy_pair_cap_mod(n) == 1 for n in FIXTURE_DOCS + [500_000])
    assert all(_emb_heavy_cap_mod(n) == 1 for n in FIXTURE_EMB + [200_000])
    # event-session user-slab cap (r13): no-op at every fixture AND at
    # sf10 (10M events, hashes frozen r11) - first active corpus is sf100
    assert all(_event_user_cap_mod(n) == 1 for n in FIXTURE_EVENTS + [10_000_000])
    # text-family oracle cap (r13): same slab as the heavy-pair cap
    assert all(_text_corpus_cap_mod(n) == 1 for n in FIXTURE_DOCS + [500_000])
    assert all(_lsh_bits(n) == 8 for n in FIXTURE_EMB)
    assert all(_semdedup_k(n) == 16 for n in FIXTURE_EMB)
    assert all(_fuzzy_block_len(n) == 3 for n in FIXTURE_CUST)


def test_scale_points():
    """The measured non-fixture points the r10 datasheet recorded."""
    assert _pair_cap_mod(200_000) == 10  # sf10 embeddings
    assert _doc_cap_mod(500_000) == 10  # sf10 documents
    assert _heavy_pair_cap_mod(500_000) == 1  # sf10: heavy cap still off
    assert _heavy_pair_cap_mod(5_000_000) == 10  # sf100 documents
    assert _emb_heavy_cap_mod(2_000_000) == 10  # sf100 embeddings
    assert _event_user_cap_mod(100_000_000) == 10  # sf100 events
    assert _text_corpus_cap_mod(5_000_000) == 10  # sf100 documents
    assert _semdedup_k(200_000) == 160
    assert _fuzzy_block_len(1_500_000) == 4
    assert _lsh_bits(200_000) == 12 and _lsh_bits(2_000_000) == 15


# ---- monotone in n --------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(a=N, b=N)
def test_monotone(a, b):
    lo, hi = sorted((a, b))
    assert _pair_cap_mod(lo) <= _pair_cap_mod(hi)
    assert _doc_cap_mod(lo) <= _doc_cap_mod(hi)
    assert _heavy_pair_cap_mod(lo) <= _heavy_pair_cap_mod(hi)
    assert _emb_heavy_cap_mod(lo) <= _emb_heavy_cap_mod(hi)
    assert _event_user_cap_mod(lo) <= _event_user_cap_mod(hi)
    assert _text_corpus_cap_mod(lo) <= _text_corpus_cap_mod(hi)
    assert _lsh_bits(lo) <= _lsh_bits(hi)
    assert _semdedup_k(lo) <= _semdedup_k(hi)
    assert _fuzzy_block_len(lo) <= _fuzzy_block_len(hi)


# ---- slab-edge continuity: stepping n by 1 moves each dial by at most
# ---- its smallest formula step --------------------------------------------


@settings(max_examples=300, deadline=None)
@given(n=st.integers(min_value=1, max_value=10**9))
def test_slab_edge_continuity(n):
    assert _pair_cap_mod(n + 1) - _pair_cap_mod(n) in (0, 1)
    assert _doc_cap_mod(n + 1) - _doc_cap_mod(n) in (0, 1)
    assert _heavy_pair_cap_mod(n + 1) - _heavy_pair_cap_mod(n) in (0, 1)
    assert _emb_heavy_cap_mod(n + 1) - _emb_heavy_cap_mod(n) in (0, 1)
    assert _event_user_cap_mod(n + 1) - _event_user_cap_mod(n) in (0, 1)
    assert _text_corpus_cap_mod(n + 1) - _text_corpus_cap_mod(n) in (0, 1)
    assert _lsh_bits(n + 1) - _lsh_bits(n) in (0, 1)
    assert _semdedup_k(n + 1) - _semdedup_k(n) in (0, 16)
    assert _fuzzy_block_len(n + 1) - _fuzzy_block_len(n) in (0, 1)


def test_exact_slab_edges():
    """The boundary rows themselves: last no-op n and first active n."""
    assert _pair_cap_mod(_PAIRWISE_CAP) == 1
    assert _pair_cap_mod(_PAIRWISE_CAP + 1) == 2
    assert _doc_cap_mod(_DOC_PAIR_CAP) == 1
    assert _doc_cap_mod(_DOC_PAIR_CAP + 1) == 2
    assert _heavy_pair_cap_mod(_HEAVY_PAIR_CAP) == 1
    assert _heavy_pair_cap_mod(_HEAVY_PAIR_CAP + 1) == 2
    assert _fuzzy_block_len(200_000) == 3
    assert _fuzzy_block_len(200_001) == 4


# ---- sampled-corpus lower bounds: an active cap never restricts below
# ---- the cap target (the sample stays at evaluation scale) ----------------


@settings(max_examples=200, deadline=None)
@given(n=st.integers(min_value=1, max_value=10**12))
def test_cap_keeps_evaluation_scale(n):
    # ceil semantics: n / M  is within [cap/2, cap] once active
    m = _pair_cap_mod(n)
    assert n / m <= _PAIRWISE_CAP
    if m > 1:
        assert n / m > _PAIRWISE_CAP / 2
    md = _doc_cap_mod(n)
    assert n / md <= _DOC_PAIR_CAP
    if md > 1:
        assert n / md > _DOC_PAIR_CAP / 2
    mh = _heavy_pair_cap_mod(n)
    assert n / mh <= _HEAVY_PAIR_CAP
    if mh > 1:
        assert n / mh > _HEAVY_PAIR_CAP / 2


# ---- forced-cap equivalence: the r12 heavy-pair capped code paths
# ---- (capped kept recompute / band filter / corpus filter) must equal
# ---- their oracle renderings with the same predicate, proven at
# ---- fixture scale by forcing m > 1 --------------------------------------


def test_heavy_cap_mirrors_oracle_when_forced(monkeypatch):
    """Force the heavy-pair cap active (m=5) at sf0.001 and compare
    each capped query against its capped oracle SQL via DuckDB — the
    exact mirroring the sf100 probe relies on, testable without a 5M
    doc corpus."""
    import duckdb
    import pytest

    spark = pytest.importorskip(
        "real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark"
    ).get_spark()
    import real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.dedup_queries as dq

    SF = "/root/testdata/sf0.001"
    M = 5
    monkeypatch.setattr(dq, "_heavy_cap_mod_for", lambda s, d: M)
    monkeypatch.setattr(
        dq,
        "_heavy_cap_where",
        lambda d: f" WHERE (doc_id % 1000000) % {M} = 0",
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )

    for name in (
        "ngram_jaccard_pairs",
        "minhash_lsh_pairs",
        "winnowing_fingerprint_pairs",
        "simhash_recall_eval",
        "simhash64_recall_eval",
    ):
        from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans import (
            REGISTRY,
        )

        q = REGISTRY[name]
        got = sorted(
            tuple(round(v, 4) if isinstance(v, float) else v for v in r)
            for r in q.fn(spark, SF).collect()
        )
        sql = q.oracle(SF) if callable(q.oracle) else q.oracle
        exp = sorted(
            tuple(round(v, 4) if isinstance(v, float) else v for v in r)
            for r in con.execute(sql).fetchall()
        )
        assert got == exp, f"{name}: capped Spark != capped oracle"
        assert got, f"{name}: forced cap produced an empty result"


def test_emb_heavy_cap_mirrors_oracle_when_forced(monkeypatch):
    """Force the embeddings-side heavy cap active (M=4) at sf0.001 and
    compare semantic_dedup against its capped oracle — proving the
    vec_id % M restriction, the capped-count K resolution, and the
    first-K-capped-ids centroid selection mirror exactly."""
    import duckdb
    import pytest

    spark = pytest.importorskip(
        "real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark"
    ).get_spark()
    import real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.dials as dials
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans import (
        REGISTRY,
    )

    SF = "/root/testdata/sf0.001"
    monkeypatch.setattr(dials, "_emb_heavy_cap_mod", lambda n: 4)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF}/embeddings.parquet')"
    )
    q = REGISTRY["semantic_dedup"]
    got = sorted(
        tuple(r) for r in q.fn(spark, SF).collect()
    )
    sql = q.oracle(SF)
    exp = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == exp
    assert got, "forced emb cap produced an empty result"


def test_event_user_cap_mirrors_oracle_when_forced(monkeypatch):
    """Force the r13 sessionization user-slab cap active (M=3) at
    sf0.001 and compare event_sessions against its capped oracle — the
    exact mirroring the sf100 run relies on. Also pins the exactness
    argument: the capped result must equal the UNCAPPED result
    restricted to kept users (sessionization is windowed per user, so
    the slab changes which users appear, never their sessions)."""
    import duckdb
    import pytest

    spark = pytest.importorskip(
        "real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark"
    ).get_spark()
    import real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.dials as dials
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans import (
        REGISTRY,
    )

    SF = "/root/testdata/sf0.001"
    q = REGISTRY["event_sessions"]
    uncapped = {tuple(r) for r in q.fn(spark, SF).collect()}

    monkeypatch.setattr(dials, "_event_user_cap_mod", lambda n: 3)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF}/events.parquet')"
    )
    got = sorted(tuple(r) for r in q.fn(spark, SF).collect())
    sql = q.oracle(SF)
    assert "user_id % 3 = 0" in sql
    exp = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == exp, "capped Spark != capped oracle"
    assert got, "forced event cap produced an empty result"
    assert set(got) == {r for r in uncapped if r[0] % 3 == 0}


def test_text_corpus_cap_mirrors_oracle_when_forced(monkeypatch):
    """Force the r13 text-family oracle-feasibility cap active (M=3)
    at sf0.001 and compare lang_id_trigram against its capped oracle —
    capped semantics are self-consistent (train/test split + profiles
    recompute over the slab on both engines)."""
    import duckdb
    import pytest

    spark = pytest.importorskip(
        "real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark"
    ).get_spark()
    import real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.dials as dials
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans import (
        REGISTRY,
    )

    SF = "/root/testdata/sf0.001"
    monkeypatch.setattr(dials, "_text_corpus_cap_mod", lambda n: 3)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    q = REGISTRY["lang_id_trigram"]
    got = sorted(tuple(r) for r in q.fn(spark, SF).collect())
    sql = q.oracle(SF)
    assert "doc_id % 3 = 0" in sql
    exp = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == exp, "capped Spark != capped oracle"
    assert got, "forced text cap produced an empty result"
