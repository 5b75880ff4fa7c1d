"""Unit tests for the expression library — one per SURVEY §2 semantic,
including the reference's edge cases (§5.2 layer 1)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.functions.sentiment import (
    classify_expr,
    confidence_expr,
    polarity_expr,
    score_text,
    score_text_expr,
)
from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.functions.text import (
    clean_text,
    stable_fingerprint,
    token_hash60,
    tokens,
)


def one(spark, value):
    return spark.createDataFrame([Row(v=value)], "v string")


class TestCleanText:
    """F1: lower(regexp_replace(col, '[^a-zA-Z\\s]', '')) — work.py:230-235."""

    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("Hello, World! 123", "hello world "),
            ("UPPER", "upper"),
            ("a\tb\nc", "a\tb\nc"),  # whitespace survives the regex
            ("1234!?", ""),
            ("", ""),
        ],
    )
    def test_values(self, spark, raw, expected):
        got = one(spark, raw).select(clean_text("v").alias("c")).head()["c"]
        assert got == expected

    def test_null_passthrough(self, spark):
        assert one(spark, None).select(clean_text("v").alias("c")).head()["c"] is None

    def test_idempotent(self, spark):
        df = one(spark, "MiXeD 42 ca$e!")
        once = df.select(clean_text("v").alias("c"))
        twice = once.select(clean_text("c").alias("c"))
        assert once.head()["c"] == twice.head()["c"]


class TestTokens:
    def test_drops_empty_tokens(self, spark):
        got = one(spark, "a  b, !! c").select(tokens("v").alias("t")).head()["t"]
        assert got == ["a", "b", "c"]

    def test_null_gives_null(self, spark):
        assert one(spark, None).select(tokens("v").alias("t")).head()["t"] is None


class TestClassify:
    """F2: thresholds +-0.1 EXCLUSIVE, null -> Neutral (work.py:96-105)."""

    @pytest.mark.parametrize(
        "p,expected",
        [
            (0.5, "Positive"),
            (0.10001, "Positive"),
            (0.1, "Neutral"),  # boundary is exclusive
            (0.0, "Neutral"),
            (-0.1, "Neutral"),
            (-0.10001, "Negative"),
            (-1.0, "Negative"),
            (None, "Neutral"),
        ],
    )
    def test_thresholds(self, spark, p, expected):
        df = spark.createDataFrame([Row(p=p)], "p double")
        assert df.select(classify_expr("p").alias("s")).head()["s"] == expected


class TestConfidence:
    """F3: |p| > 0.5 High, > 0.2 Medium, else Low (streaming_pipeline.py:146-151)."""

    @pytest.mark.parametrize(
        "p,expected",
        [
            (0.9, "High"),
            (-0.9, "High"),
            (0.5, "Medium"),  # boundary exclusive
            (0.3, "Medium"),
            (0.2, "Low"),
            (0.0, "Low"),
            (None, "Low"),
        ],
    )
    def test_buckets(self, spark, p, expected):
        df = spark.createDataFrame([Row(p=p)], "p double")
        assert df.select(confidence_expr("p").alias("c")).head()["c"] == expected


class TestPolarity:
    def test_known_average(self, spark):
        # fast(+80) + slow(-80) + the(unmatched) -> 0/200 = 0.0
        # fast + fast + big -> (80+80+50)/300 = 0.7
        df = spark.createDataFrame(
            [Row(v="fast slow the"), Row(v="fast fast big")], "v string"
        )
        got = [r["p"] for r in df.select(polarity_expr("v").alias("p")).collect()]
        assert got == [0.0, pytest.approx(0.7)]

    def test_no_match_defaults_zero(self, spark):
        assert one(spark, "the unmatched words").select(
            polarity_expr("v").alias("p")
        ).head()["p"] == 0.0

    def test_null_defaults_zero(self, spark):
        assert one(spark, None).select(polarity_expr("v").alias("p")).head()["p"] == 0.0

    def test_join_scorer_matches_expr_scorer(self, spark):
        """The broadcast-join scorer and the zero-shuffle expression
        scorer are numerically identical (same integer math)."""
        docs = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(
                ["fast slow merge", "spark spark dup", "nothing here", "", "slow slow slow"]
            )],
            "doc_id bigint, text string",
        )
        a = {
            r["doc_id"]: (r["polarity"], r["sentiment"])
            for r in score_text(docs, "doc_id", "text", spark).collect()
        }
        b = {
            r["doc_id"]: (r["polarity"], r["sentiment"])
            for r in score_text_expr(docs, "text").collect()
        }
        assert a == b


class TestHashing:
    def test_token_hash60_matches_duckdb(self, spark):
        import duckdb

        words = ["hello", "spark", "dedup", ""]
        df = spark.createDataFrame([Row(v=w) for w in words], "v string")
        got = dict(
            df.select("v", token_hash60("v").alias("h")).collect()
        )
        con = duckdb.connect()
        for w in words:
            expected = con.execute(
                "SELECT ('0x' || substr(md5(?), 18, 15))::BIGINT", [w]
            ).fetchone()[0]
            assert got[w] == expected, w

    def test_fingerprint_order_insensitive(self, spark):
        df = spark.createDataFrame(
            [Row(v="alpha beta gamma"), Row(v="gamma alpha beta beta")], "v string"
        )
        fps = [r["f"] for r in df.select(stable_fingerprint("v").alias("f")).collect()]
        assert fps[0] == fps[1]  # same distinct token set -> same fingerprint


def test_bpe_merge_train_matches_reference_implementation(spark, tmp_path):
    """The relational greedy-merge loop must reproduce a plain-Python
    BPE trainer (Sennrich-style: count adjacent pairs weighted by word
    freq, argmax with (count desc, pair asc) ties, greedy left-to-right
    apply) on a corpus crafted to exercise the L == R overlap-run case
    ('aaaa' runs) and multi-char merged symbols."""
    import pandas as pd

    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.text_queries import (
        _BPE_MERGE_ITERS,
        bpe_merge_train,
    )

    texts = [
        "aaaa aaaa banana bananas",
        "low lower lowest low low",
        "aaa abab abab cccc",
        "banana low aaaa",
    ]
    sf = tmp_path / "bpe_corpus"
    sf.mkdir()
    pd.DataFrame({"doc_id": range(len(texts)), "text": texts}).to_parquet(
        sf / "documents.parquet"
    )

    def ref_bpe(words, iters):
        vocab = {}
        for w in words:
            vocab[w] = vocab.get(w, 0) + 1
        seqs = {w: list(w) for w in vocab}
        rules = []
        for _ in range(iters):
            counts = {}
            for w, syms in seqs.items():
                for i in range(len(syms) - 1):
                    counts[(syms[i], syms[i + 1])] = (
                        counts.get((syms[i], syms[i + 1]), 0) + vocab[w]
                    )
            if not counts:
                break
            (l, r), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            rules.append((l, r, cnt))
            for w, syms in seqs.items():
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                seqs[w] = out
        return rules

    import re

    words = [t for s in texts for t in re.findall(r"[a-z]+", s.lower())]
    expected = ref_bpe(words, _BPE_MERGE_ITERS)
    got = sorted(
        (r["it"], r["left_sym"], r["right_sym"], r["n_occurrences"])
        for r in bpe_merge_train(spark, str(sf)).collect()
    )
    assert got == [
        (i + 1, l, r, c) for i, (l, r, c) in enumerate(expected)
    ], (got, expected)
