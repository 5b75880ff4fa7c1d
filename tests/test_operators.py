"""Operator-level tests: registry integrity, multimodal Arrow path,
dedup family geometry, and property-based checks (SURVEY §5.2 layers
1/5)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import Row, functions as F

from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.functions.sentiment import (
    classify_expr,
    polarity_expr,
)
from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.functions.text import (
    clean_text,
)
from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.operators.multimodal import (
    extract_features,
    payload_table,
)
from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans import (
    REGISTRY,
)

SF = "/root/testdata/sf0.001"


class TestRegistry:
    def test_every_query_has_unique_name_and_doc(self):
        assert len(REGISTRY) >= 36
        for q in REGISTRY.values():
            assert q.doc.strip(), f"{q.name} lacks a docstring"

    def test_flagship_present_with_oracle(self):
        assert REGISTRY["sentiment_summary"].oracle is not None

    @pytest.mark.parametrize(
        "name",
        ["pricing_summary", "sentiment_summary", "dedup_exact", "cosine_knn_topk"],
    )
    def test_representative_queries_run(self, spark, name):
        df = REGISTRY[name].fn(spark, SF)
        assert df.count() > 0


class TestMultimodal:
    def test_features_match_expression_ground_truth(self, spark):
        """The Python decode stub must agree with byte math computed
        JVM-side — catches Arrow schema/encoding drift."""
        feats = {r["doc_id"]: r for r in extract_features(spark, SF).collect()}
        truth = {
            r["doc_id"]: r
            for r in payload_table(spark, SF)
            .select(
                "doc_id",
                F.octet_length("payload").alias("payload_bytes"),
                F.ascii(F.expr("substring(cast(payload as string), 1, 1)")).alias("first_byte"),
            )
            .collect()
        }
        assert set(feats) == set(truth)
        for doc_id, t in truth.items():
            assert feats[doc_id]["payload_bytes"] == t["payload_bytes"]
            assert feats[doc_id]["first_byte"] == t["first_byte"]

    def test_payload_is_binary(self, spark):
        schema = dict(payload_table(spark, SF).dtypes)
        assert schema["payload"] == "binary"

    def test_resize_kernel_matches_python_reference(self, spark):
        """The Arrow resize kernel must agree with a per-row python
        rendering of the same nearest-neighbor formula, including the
        short-payload (upsample) and empty-payload edges."""
        from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.operators.multimodal import (
            RESIZE_TARGET,
            resize_payloads,
        )

        got = {r["doc_id"]: r for r in resize_payloads(spark, SF).collect()}
        payloads = {
            r["doc_id"]: bytes(r["payload"])
            for r in payload_table(spark, SF).collect()
        }
        assert set(got) == set(payloads)
        for doc_id, v in payloads.items():
            if not v:
                assert got[doc_id]["resized_bytes"] == 0
                continue
            ref = bytes(v[(i * len(v)) // RESIZE_TARGET] for i in range(RESIZE_TARGET))
            assert bytes(got[doc_id]["resized"]) == ref
            assert got[doc_id]["resized_checksum"] == sum(ref)

    def test_frame_sample_counts(self, spark):
        """ceil(frames/stride) sampled frames; partial tail frame
        dropped; signature = sum of sampled frames' leading bytes."""
        from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.operators.multimodal import (
            FRAME_BYTES,
            FRAME_STRIDE,
        )
        from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans import (
            REGISTRY,
        )

        rows = {
            r["source"]: r
            for r in REGISTRY["multimodal_frame_sample"].fn(spark, SF).collect()
        }
        payloads = [
            (r["source"], bytes(r["payload"]))
            for r in payload_table(spark, SF).collect()
        ]
        from collections import defaultdict

        frames = defaultdict(int)
        sampled = defaultdict(int)
        sig = defaultdict(int)
        for src, v in payloads:
            nf = len(v) // FRAME_BYTES
            frames[src] += nf
            if nf:
                keep = range(0, nf, FRAME_STRIDE)
                sampled[src] += len(keep)
                sig[src] += sum(v[f * FRAME_BYTES] for f in keep)
        for src, r in rows.items():
            assert r["total_frames"] == frames[src]
            assert r["total_sampled"] == sampled[src]
            assert r["sum_signature"] == sig[src]


class TestDedupGeometry:
    def test_minhash_finds_planted_near_dups(self, spark):
        """Every planted (doc, truncated-doc) pair has shingle Jaccard
        ~0.9; LSH with 4x4 bands must recover the vast majority."""
        pairs = REGISTRY["minhash_lsh_pairs"].fn(spark, SF).collect()
        planted = {(r["doc_a"], r["doc_b"]) for r in pairs if r["doc_b"] == r["doc_a"] + 1000000}
        n_docs = 500
        assert len(planted) > 0.9 * n_docs
        for r in pairs:
            assert 0.5 <= r["jaccard"] <= 1.0

    def test_exact_jaccard_superset_of_minhash(self, spark):
        """MinHash+LSH is approximate candidate generation; after exact
        verification at the same threshold its pairs must be a subset of
        the exhaustive shingle-blocked Jaccard pairs."""
        exact = {
            (r["doc_a"], r["doc_b"])
            for r in REGISTRY["ngram_jaccard_pairs"].fn(spark, SF).collect()
        }
        lsh = {
            (r["doc_a"], r["doc_b"])
            for r in REGISTRY["minhash_lsh_pairs"].fn(spark, SF).collect()
        }
        assert lsh <= exact
        assert len(lsh) >= 0.85 * len(exact)

    def test_dedup_exact_counts(self, spark):
        row = REGISTRY["dedup_exact"].fn(spark, SF).head()
        assert row["n_rows"] == 2 * row["n_unique"]
        assert row["n_duplicates_removed"] == row["n_unique"]

    def test_incremental_probe_finds_planted_originals(self, spark):
        """Every delta doc (re-crawl copy, id >= 1e6) is a planted
        near-dup of its original; the incremental index probe must
        recover the vast majority, and every match must carry a valid
        verified jaccard."""
        rows = REGISTRY["incremental_near_dup"].fn(spark, SF).collect()
        planted = {
            r["new_doc_id"]
            for r in rows
            if r["new_doc_id"] == r["dup_of"] + 1000000
        }
        assert len(planted) > 0.9 * 500
        for r in rows:
            assert r["new_doc_id"] >= 1000000 and r["dup_of"] < 1000000
            assert 0.5 <= r["jaccard"] <= 1.0


class TestSimilarity:
    def test_knn_self_similarity_excluded_and_sorted(self, spark):
        rows = REGISTRY["cosine_knn_topk"].fn(spark, SF).collect()
        by_q = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append(r)
        for q, rs in by_q.items():
            rs.sort(key=lambda r: r["rank"])
            sims = [r["cos_sim"] for r in rs]
            assert sims == sorted(sims, reverse=True)
            assert all(r["neighbor_id"] != q for r in rs)
            assert len(rs) == 5


# ---------------------------------------------------------------------------
# property-based (hypothesis): the pipeline never throws, outputs stay
# in-domain, clean is idempotent — over adversarial strings.
# ---------------------------------------------------------------------------

text_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200
)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.one_of(st.none(), text_strategy), min_size=1, max_size=8))
def test_pipeline_total_on_arbitrary_text(spark_global, texts):
    spark = spark_global
    df = spark.createDataFrame([Row(v=t) for t in texts], "v string")
    out = df.select(
        clean_text("v").alias("c"),
        polarity_expr("v").alias("p"),
    ).withColumn("s", classify_expr("p"))
    rows = out.collect()
    for r in rows:
        if r["p"] is not None:
            assert -1.0 <= r["p"] <= 1.0
        assert r["s"] in {"Positive", "Negative", "Neutral"}
        if r["c"] is not None:
            assert r["c"] == r["c"].lower()


@pytest.fixture(scope="session")
def spark_global(spark):
    return spark


def test_clean_idempotent_on_unicode(spark):
    samples = ["héllo wörld", "ＡＢＣ", "emoji 🙂 txt", "tab\tsep", "ĄĆĘ"]
    df = spark.createDataFrame([Row(v=s) for s in samples], "v string")
    once = [r["c"] for r in df.select(clean_text("v").alias("c")).collect()]
    df2 = spark.createDataFrame([Row(c=c) for c in once], "c string")
    twice = [r["d"] for r in df2.select(clean_text("c").alias("d")).collect()]
    assert once == twice


class TestConnectedComponents:
    def test_chain_converges_logarithmically(self, spark):
        """A 64-node path graph (diameter 63) must collapse to one
        component labeled 0 in far fewer than 63 rounds — the pointer-
        halving guarantee. max_rounds=10 would fail plain propagation."""
        from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.operators.graph import (
            connected_components,
        )

        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(63)], "s bigint, d bigint"
        )
        labels = connected_components(edges, max_rounds=10)
        rows = {r["v"]: r["lbl"] for r in labels.collect()}
        assert len(rows) == 64
        assert set(rows.values()) == {0}

    def test_two_components_and_isolated_edge(self, spark):
        from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.operators.graph import (
            connected_components,
        )

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11), (20, 21), (21, 20)],
            "s bigint, d bigint",
        )
        labels = connected_components(edges)
        comp = {r["v"]: r["lbl"] for r in labels.collect()}
        assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}


# property-based: connected_components matches a union-find reference on
# random edge lists (pointer halving must not change the fixpoint).
# Parametrized over both execution paths: the small-graph fast path
# (default cutoff) and the iterative contraction + pointer-halving loop
# (small_cutoff=0 forces it even on tiny graphs).
@pytest.mark.parametrize("small_cutoff", [4_000_000, 0])
@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=30), st.integers(min_value=0, max_value=30)),
        min_size=1,
        max_size=25,
    )
)
def test_connected_components_matches_union_find(spark_global, small_cutoff, edges):
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.operators.graph import (
        connected_components,
    )

    spark = spark_global
    parent: dict[int, int] = {}

    def find(v):
        parent.setdefault(v, v)
        while parent[v] != v:
            parent[v] = parent[parent[v]]
            v = parent[v]
        return v

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    expected = {v: find(v) for v in parent}

    df = spark.createDataFrame(edges, "s bigint, d bigint")
    got = {
        r["v"]: r["lbl"]
        for r in connected_components(df, small_cutoff=small_cutoff).collect()
    }
    assert got == expected


class TestConnectedComponentsModes:
    def test_reliable_checkpoint_dir(self, spark, tmp_path):
        """checkpoint_dir switches lineage truncation to reliable
        storage — files must actually land under the directory and the
        labels must be unchanged."""
        from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.operators.graph import (
            connected_components,
        )

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "s bigint, d bigint"
        )
        ckpt = str(tmp_path / "cc_ckpt")
        labels = connected_components(edges, checkpoint_dir=ckpt)
        comp = {r["v"]: r["lbl"] for r in labels.collect()}
        assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
        import os

        assert any(files for _, _, files in os.walk(ckpt)), "no checkpoint files written"

    def test_phase2_fallback_on_contraction_stall(self, spark, monkeypatch):
        """With tiny contraction partitions a long path stalls the
        union-of-forests phase (star count stops shrinking while the
        partition count is already minimal), which must hand off to the
        pointer-halving phase and still converge to one component."""
        import real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.operators.graph as g

        monkeypatch.setattr(g, "_EDGES_PER_PART", 4)
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(63)], "s bigint, d bigint"
        )
        labels = g.connected_components(edges, max_rounds=25)
        rows = {r["v"]: r["lbl"] for r in labels.collect()}
        assert len(rows) == 64
        assert set(rows.values()) == {0}

    def test_self_loop_only_vertex_keeps_own_label(self, spark):
        from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.operators.graph import (
            connected_components,
        )

        edges = spark.createDataFrame([(5, 5), (1, 2)], "s bigint, d bigint")
        comp = {r["v"]: r["lbl"] for r in connected_components(edges).collect()}
        assert comp == {5: 5, 1: 1, 2: 1}


class TestStopShinglePrefilter:
    def test_hot_shingle_contributes_no_pairs(self, spark):
        """Docs sharing ONLY a hot (above-cutoff) shingle must not pair;
        docs sharing rare shingles still do, with Jaccard computed over
        the kept shingle sets on both sides."""
        from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.dedup_queries import (
            _jaccard_pairs_from_shingles,
        )

        rows = []
        # hot shingle across 40 docs (df=40 > cutoff=2)
        for d in range(40):
            rows.append((d, "the quick fox"))
        # docs 0 and 1 additionally share two rare shingles
        rows += [(0, "rare pair one"), (1, "rare pair one")]
        rows += [(0, "rare pair two"), (1, "rare pair two")]
        sh = spark.createDataFrame(rows, "doc_id bigint, shingle string")
        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in _jaccard_pairs_from_shingles(sh, cutoff=2).collect()
        }
        # only (0, 1) pairs — via the two rare shingles; jaccard over the
        # KEPT sets is 2/2 = 1.0 (the hot shingle is excluded from sizes)
        assert got == {(0, 1): 1.0}

    def test_cutoff_noop_below_df(self, spark):
        """With the cutoff above every df the prefilter must be a no-op
        (the sf0.01 golden-stability argument)."""
        from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.dedup_queries import (
            _jaccard_pairs_from_shingles,
        )

        rows = [(0, "a b c"), (1, "a b c"), (0, "d e f"), (1, "d e f"), (2, "x y z")]
        sh = spark.createDataFrame(rows, "doc_id bigint, shingle string")
        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in _jaccard_pairs_from_shingles(sh, cutoff=100).collect()
        }
        assert got == {(0, 1): 1.0}

    def test_prefix_filter_matches_bruteforce_random(self, spark):
        """The prefix filter is LOSSLESS for J >= t: on a randomized
        dense corpus (tiny shingle alphabet forces heavy sharing, so the
        prefix join actually prunes), the result must equal the python
        all-pairs brute force — same pair set, same Jaccard values."""
        import random

        from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.dedup_queries import (
            _jaccard_pairs_from_shingles,
        )

        rng = random.Random(42)
        alphabet = [f"sh{i}" for i in range(10)]
        sets: dict[int, set] = {}
        rows = []
        for doc in range(40):
            sets[doc] = set(rng.sample(alphabet, rng.randint(1, 6)))
            rows += [(doc, s) for s in sets[doc]]
        sh = spark.createDataFrame(rows, "doc_id bigint, shingle string")
        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in _jaccard_pairs_from_shingles(sh, cutoff=1000).collect()
        }
        expect = {}
        docs = sorted(sets)
        for i, a in enumerate(docs):
            for b in docs[i + 1 :]:
                inter = len(sets[a] & sets[b])
                if inter:
                    j = inter / (len(sets[a]) + len(sets[b]) - inter)
                    if round(j, 4) >= 0.5:
                        expect[(a, b)] = j
        assert set(got) == set(expect)
        for k, v in expect.items():
            assert abs(got[k] - v) < 5e-5

    def test_prefix_bound_exact_threshold_pair(self, spark):
        """A pair at EXACTLY J = t (2 shared of 3+3 shingles -> 0.5)
        sits on the prefix bound's boundary — the bound guarantees a
        shared shingle within each doc's first |X|-ceil(t|X|)+1 = 2
        shingles, so the pair must be found whatever the md5 order."""
        from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.dedup_queries import (
            _jaccard_pairs_from_shingles,
        )

        rows = [(0, s) for s in ("p p p", "q q q", "r r r")] + [
            (1, s) for s in ("p p p", "q q q", "s s s")
        ]
        sh = spark.createDataFrame(rows, "doc_id bigint, shingle string")
        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in _jaccard_pairs_from_shingles(sh, cutoff=100).collect()
        }
        assert got == {(0, 1): 0.5}


class TestMergeUpsert:
    def test_update_insert_keep(self, spark):
        from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.operators.merge import (
            merge_upsert,
        )

        base = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, v string, p double"
        )
        changes = spark.createDataFrame(
            [(2, "B", 25.0), (9, "z", 90.0)], "k int, v string, p double"
        )
        got = {r["k"]: r for r in merge_upsert(base, changes, "k").collect()}
        assert len(got) == 4
        assert got[1]["_merge_action"] == "keep" and got[1]["v"] == "a"
        assert got[2]["_merge_action"] == "update" and got[2]["v"] == "B" and got[2]["p"] == 25.0
        assert got[3]["_merge_action"] == "keep"
        assert got[9]["_merge_action"] == "insert" and got[9]["v"] == "z"

    def test_schema_mismatch_rejected(self, spark):
        from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.operators.merge import (
            merge_upsert,
        )
        import pytest as _pytest

        base = spark.createDataFrame([(1, "a")], "k int, v string")
        changes = spark.createDataFrame([(1,)], "k int")
        with _pytest.raises(ValueError):
            merge_upsert(base, changes, "k")

    def test_update_path_broadcasts_base_never_shuffled_wide(self, spark):
        """The scale claim: the update join is a BroadcastHashJoin (build
        side = changes), so the base relation reaches it without an
        Exchange."""
        from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.operators.merge import (
            merge_upsert,
        )

        base = spark.range(1000).selectExpr("id AS k", "CAST(id AS STRING) AS v")
        changes = spark.range(10).selectExpr("id * 7 AS k", "'x' AS v")
        plan = (
            merge_upsert(base, changes, "k")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan or "LeftAnti" in plan

    def test_large_changes_batch_skips_broadcast(self, spark):
        """Size-aware broadcast: a changes batch above the threshold must
        NOT carry the broadcast hint — at 100 TB a backfill batch would
        blow the 8 GB broadcast wall, so the plan has to fall back to a
        shuffled join on the key."""
        from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.operators.merge import (
            merge_upsert,
        )

        base = spark.range(1000).selectExpr("id AS k", "CAST(id AS STRING) AS v")
        changes = spark.range(500).selectExpr("id * 2 AS k", "'x' AS v")
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = (
                merge_upsert(base, changes, "k", broadcast_max_rows=100)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        assert "BroadcastHashJoin" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan

    def test_small_changes_batch_still_broadcasts(self, spark):
        """Below the threshold the hint stays even with auto-broadcast
        disabled — the probe, not Spark's size estimate, decides."""
        from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.operators.merge import (
            merge_upsert,
        )

        base = spark.range(1000).selectExpr("id AS k", "CAST(id AS STRING) AS v")
        changes = spark.range(10).selectExpr("id * 7 AS k", "'x' AS v")
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = (
                merge_upsert(base, changes, "k", broadcast_max_rows=100)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        assert "BroadcastHashJoin" in plan


class TestScd2Apply:
    def test_close_open_passthrough(self, spark):
        from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.operators.scd import (
            scd2_apply,
        )

        hist = spark.createDataFrame(
            [
                (1, "a", "2020-01-01", None),          # current, will be revised
                (1, "a0", "2019-01-01", "2020-01-01"),  # closed history, untouched
                (2, "b", "2020-01-01", None),          # current, unchanged key
            ],
            "k int, v string, valid_from string, valid_to string",
        )
        changes = spark.createDataFrame([(1, "A")], "k int, v string")
        rows = scd2_apply(hist, changes, "k", "2025-06-01").collect()
        assert len(rows) == 4
        by = {(r["k"], r["valid_from"]): r for r in rows}
        # revised key: old current row closed at effective date
        assert by[(1, "2020-01-01")]["valid_to"] == "2025-06-01"
        # closed history untouched
        assert by[(1, "2019-01-01")]["valid_to"] == "2020-01-01"
        # unchanged key stays current
        assert by[(2, "2020-01-01")]["valid_to"] is None
        # new current row opened with revised attributes
        assert by[(1, "2025-06-01")]["valid_to"] is None
        assert by[(1, "2025-06-01")]["v"] == "A"

    def test_schema_mismatch_rejected(self, spark):
        from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.operators.scd import (
            scd2_apply,
        )
        import pytest as _pytest

        hist = spark.createDataFrame(
            [(1, "a", "2020-01-01", None)],
            "k int, v string, valid_from string, valid_to string",
        )
        changes = spark.createDataFrame([(1,)], "k int")
        with _pytest.raises(ValueError):
            scd2_apply(hist, changes, "k", "2025-06-01")

    def test_history_not_shuffled(self, spark):
        """Scale claim: closing rows is a broadcast left join — the
        history side reaches the join without an Exchange."""
        from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.operators.scd import (
            scd2_apply,
        )

        hist = spark.range(1000).selectExpr(
            "id AS k", "CAST(id AS STRING) AS v",
            "'2020-01-01' AS valid_from", "CAST(NULL AS STRING) AS valid_to",
        )
        changes = spark.range(10).selectExpr("id * 7 AS k", "'x' AS v")
        plan = (
            scd2_apply(hist, changes, "k", "2025-06-01")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_large_changes_batch_skips_broadcast(self, spark):
        """scd2 twin of the merge size-aware test: an over-threshold
        changes batch must reach the close join without a broadcast hint."""
        from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.operators.scd import (
            scd2_apply,
        )

        hist = spark.range(1000).selectExpr(
            "id AS k", "CAST(id AS STRING) AS v",
            "'2020-01-01' AS valid_from", "CAST(NULL AS STRING) AS valid_to",
        )
        changes = spark.range(500).selectExpr("id * 2 AS k", "'x' AS v")
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = (
                scd2_apply(hist, changes, "k", "2025-06-01", broadcast_max_rows=100)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        assert "BroadcastHashJoin" not in plan


class TestDebounce:
    def test_chained_suppression_not_session_gap(self, spark):
        """Events at 0 / 1.5h / 3h with a 2h threshold: debounce keeps
        {0, 3h} (clock restarts on KEPT rows), while a session-gap
        rendering would keep only {0} — this case is the proof the
        operator is not window/session-expressible."""
        from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.operators.debounce import (
            debounce,
        )

        rows = [
            (1, 7, "2025-01-01 00:00:00"),
            (2, 7, "2025-01-01 01:30:00"),
            (3, 7, "2025-01-01 03:00:00"),
        ]
        df = spark.createDataFrame(
            rows, "event_id bigint, user_id bigint, ts string"
        ).selectExpr("event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts")
        kept = debounce(
            df, key_cols=["user_id"], ts_col="ts", threshold_seconds=7200.0,
            tiebreak_col="event_id",
        )
        assert sorted(r["event_id"] for r in kept.collect()) == [1, 3]

    def test_exact_threshold_is_strict(self, spark):
        """A row exactly AT threshold distance is still suppressed
        (strict >), matching the oracle's ts > last + INTERVAL."""
        from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.operators.debounce import (
            debounce,
        )

        rows = [
            (1, 7, "2025-01-01 00:00:00"),
            (2, 7, "2025-01-01 02:00:00"),   # exactly 2h -> dropped
            (3, 7, "2025-01-01 02:00:01"),   # 2h1s after e1 -> kept
        ]
        df = spark.createDataFrame(
            rows, "event_id bigint, user_id bigint, ts string"
        ).selectExpr("event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts")
        kept = debounce(
            df, key_cols=["user_id"], ts_col="ts", threshold_seconds=7200.0,
            tiebreak_col="event_id",
        )
        assert sorted(r["event_id"] for r in kept.collect()) == [1, 3]

    def test_timestamp_ties_deterministic(self, spark):
        """Identical timestamps: the lower tiebreak id is the kept one."""
        from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.operators.debounce import (
            debounce,
        )

        rows = [
            (9, 7, "2025-01-01 00:00:00"),
            (2, 7, "2025-01-01 00:00:00"),
        ]
        df = spark.createDataFrame(
            rows, "event_id bigint, user_id bigint, ts string"
        ).selectExpr("event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts")
        kept = debounce(
            df, key_cols=["user_id"], ts_col="ts", threshold_seconds=7200.0,
            tiebreak_col="event_id",
        )
        assert [r["event_id"] for r in kept.collect()] == [2]


# the two exact-Jaccard kernels (PPJoin prefix+verify vs co-shingle
# count-aggregate) are interchangeable renderings of the same operator —
# they must agree pair-for-pair on any stop-free input (both registered
# consumers assume it: ngram_jaccard_pairs uses count, the recall eval's
# ground truth uses prefix).
@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=12),
        min_size=2,
        max_size=12,
    )
)
def test_jaccard_kernels_agree(spark_global, docs):
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.dedup_queries import (
        _jaccard_pairs_by_count,
        _jaccard_pairs_from_arrays,
    )

    spark = spark_global
    rows = [(i, sorted({f"s{t}" for t in toks})) for i, toks in enumerate(docs)]
    arr = spark.createDataFrame(rows, "doc_id bigint, sh_arr array<string>").filter(
        F.size("sh_arr") > 0
    )
    by_count = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in _jaccard_pairs_by_count(arr, threshold=0.5).collect()
    }
    # cutoff above any possible df so the generic path's stop filter is a
    # no-op and both kernels see identical sets
    by_prefix = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in _jaccard_pairs_from_arrays(
            arr, cutoff=1000, threshold=0.5
        ).collect()
    }
    assert by_count == by_prefix


def test_ivf_recall_gradient_on_hard_fixture(spark):
    import os
    """The nprobe dial must DISCRIMINATE (r7 verdict #4): on the
    committed isotropic+planted fixture, nprobe=1 loses cross-cell
    true neighbors and nprobe=4 recovers a strictly larger slice.
    Also pins the r8 eval fix — queries disjoint from centroids —
    without which recall reads 1.0 on any geometry."""
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.similarity_queries import (
        ivf_recall_eval,
    )

    hard = os.path.join(os.path.dirname(os.path.dirname(__file__)), "testdata_hard")
    if not os.path.isdir(os.path.join(hard, "embeddings.parquet")):
        pytest.skip("hard fixture not generated (gen_scale_testdata --hard-embeddings)")
    rows = {
        r["nprobe"]: r["recall"]
        for r in ivf_recall_eval(spark, hard).collect()
    }
    assert set(rows) == {1, 2, 4}
    assert rows[1] < 1.0, "nprobe=1 must lose some cross-cell neighbors"
    assert rows[1] <= rows[2] <= rows[4], f"not monotone: {rows}"
    assert rows[4] > rows[1], f"dial must move: {rows}"


def test_exact_span_dedup_finds_planted_twins(spark):
    """Every planted twin (original minus last 5 tokens) shares all its
    rolling SPAN_K windows with its original whenever the twin still
    has >= SPAN_K tokens; the span-dedup pairs must recover nearly all
    eligible twins, and shared-span counts must be positive."""
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.dedup_queries import (
        SPAN_K,
        spark_toks,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    eligible = docs.selectExpr(
        f"size({spark_toks('text')}) AS n"
    ).filter(F.col("n") - 5 >= SPAN_K).count()
    rows = REGISTRY["exact_span_dedup"].fn(spark, SF).collect()
    planted = {
        (r["doc_a"], r["doc_b"])
        for r in rows
        if r["doc_b"] == r["doc_a"] + 1000000
    }
    assert len(planted) >= 0.9 * eligible, (len(planted), eligible)
    assert all(r["n_shared_spans"] >= 1 for r in rows)


def test_semantic_dedup_matches_numpy_bruteforce(spark):
    """SemDeDup per-cell summary equals an independent numpy replay of
    the whole pipeline (assign to nearest of 16 fixed centroids with
    the rounded-sim/centroid-id tiebreak, drop any vector dominated by
    a smaller-id same-cell vector at cos >= 0.35), and the radius
    actually fires on this corpus."""
    import numpy as np

    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.similarity_queries import (
        _SEMDEDUP_K,
        _SEMDEDUP_TAU,
    )

    rows = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows])
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    cent = xn[ids < _SEMDEDUP_K]
    sims_to_cent = np.round(xn @ cent.T, 6)
    # argmax with (sim DESC, centroid_id ASC) tiebreak
    cell = np.array(
        [max(range(_SEMDEDUP_K), key=lambda c: (s[c], -c)) for s in sims_to_cent]
    )
    expected = {}
    for c in range(_SEMDEDUP_K):
        members = np.nonzero(cell == c)[0]  # ascending vec_id order
        sims = np.round(xn[members] @ xn[members].T, 6)
        mask = np.triu(sims >= _SEMDEDUP_TAU, k=1)
        dropped = int(mask.any(axis=0).sum())
        expected[c] = (len(members), dropped, len(members) - dropped)

    got = {
        r["centroid_id"]: (r["n_vectors"], r["n_dup_dropped"], r["n_kept"])
        for r in REGISTRY["semantic_dedup"].fn(spark, SF).collect()
    }
    assert got == {c: v for c, v in expected.items() if v[0] > 0}
    assert sum(v[1] for v in got.values()) > 0  # the radius fires


def test_bpe_pair_counts_matches_python_reference(spark):
    """The BPE pair table equals a pure-Python recount (regex words,
    adjacent bigrams) — including the one-letter-word guard: Spark's
    sequence(1, 0) is descending, so an unguarded implementation emits
    bogus 1-char pairs."""
    import re
    from collections import Counter

    texts = [
        r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").select("text").collect()
        if r["text"] is not None
    ]
    counts = Counter()
    for t in texts:
        for w in re.findall(r"[a-z]+", t.lower()):
            for i in range(len(w) - 1):
                counts[w[i : i + 2]] += 1
    expected = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]

    got = [
        (r["pair"], r["n_occurrences"])
        for r in REGISTRY["bpe_pair_counts"].fn(spark, SF)
        .orderBy("rank")
        .collect()
    ]
    assert got == expected
    assert all(len(p) == 2 for p, _ in got)


def test_weighted_doc_sample_matches_python_es(spark):
    """Efraimidis-Spirakis weighted sample replayed in pure Python
    (hashlib md5 -> uniform -> ln(u)/weight -> top-50) — the engine's
    sample must be the exact same doc set in the exact same order."""
    import hashlib
    import math

    rows = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "n_chars")
        .collect()
    )
    keyed = []
    for r in rows:
        if r["n_chars"] <= 0:
            continue
        h = int(hashlib.md5(f"wds_{r['doc_id']}".encode()).hexdigest()[:8], 16)
        u = (h + 1) / 4294967296.0
        keyed.append((round(math.log(u) / r["n_chars"], 9), r["doc_id"]))
    expected = [
        doc for key, doc in sorted(keyed, key=lambda kv: (-kv[0], kv[1]))[:50]
    ]

    got = [
        r["doc_id"]
        for r in REGISTRY["weighted_doc_sample"].fn(spark, SF).orderBy("rank").collect()
    ]
    assert got == expected


def test_nation_trade_pagerank_is_probability_like(spark):
    """PageRank sanity pins: one row per nation, a valid rank
    permutation, every score at least the teleport floor, and total
    mass in (floor, 1] (mass leaks through out-edge-free nodes by the
    documented contract, so strictly 1.0 only without leaks)."""
    rows = REGISTRY["nation_trade_pagerank"].fn(spark, SF).collect()
    n = len(rows)
    assert n == 25
    assert sorted(r["rank"] for r in rows) == list(range(1, n + 1))
    floor = 0.15 / n
    assert all(r["pagerank"] >= floor - 1e-6 for r in rows)
    total = sum(r["pagerank"] for r in rows)
    assert floor * n - 1e-6 < total <= 1.0 + 1e-6
    # the graph must actually spread mass: not all scores equal
    assert len({r["pagerank"] for r in rows}) > 1


def test_audio_envelope_matches_python_reference(spark):
    """The int16-PCM envelope audit equals a per-doc pure-Python replay
    (little-endian signed samples, (i*n)//16 nearest-neighbor indices,
    squared energies) summed per source."""
    import struct

    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.operators.multimodal import (
        ENVELOPE_POINTS,
    )

    rows = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("source", "text")
        .collect()
    )
    agg = {}
    for r in rows:
        payload = (r["text"] or "").encode("utf-8")
        n = len(payload) // 2
        if n == 0:
            env_sum = peak = 0
        else:
            samples = struct.unpack(f"<{n}h", payload[: 2 * n])
            env = [
                samples[(i * n) // ENVELOPE_POINTS] ** 2
                for i in range(ENVELOPE_POINTS)
            ]
            env_sum, peak = sum(env), max(env)
        cur = agg.setdefault(r["source"], [0, 0, 0])
        cur[0] += n
        cur[1] += env_sum
        cur[2] = max(cur[2], peak)

    got = {
        r["source"]: [
            r["total_samples"],
            r["total_envelope_energy"],
            r["max_peak_energy"],
        ]
        for r in REGISTRY["multimodal_audio_envelope"].fn(spark, SF).collect()
    }
    assert got == {k: list(v) for k, v in agg.items()}


def test_wav_container_roundtrip(spark):
    """The WAV path writes GENUINE RIFF containers and decodes them with
    a real parser: per-doc frames/rate/validity match a pure-Python
    stdlib-wave replay of the same payload bytes, corrupted docs
    (doc_id % WAV_CORRUPT_MOD == 0) are rejected not sliced, and the
    container bytes carry the canonical RIFF/WAVE magic."""
    import struct

    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.operators.multimodal import (
        ENVELOPE_POINTS,
        WAV_CORRUPT_MOD,
        _wav_rate,
        wav_decoded,
    )

    src = {
        r["doc_id"]: (r["text"] or "").encode("utf-8")
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    got = {r["doc_id"]: r for r in wav_decoded(spark, SF).collect()}
    assert set(got) == set(src)
    saw_corrupt = saw_valid = False
    for doc_id, payload in src.items():
        r = got[doc_id]
        if doc_id % WAV_CORRUPT_MOD == 0:
            saw_corrupt = True
            assert (r["valid"], r["n_frames"], r["framerate"]) == (0, 0, 0)
            continue
        saw_valid = True
        n = len(payload) // 2
        assert r["valid"] == 1
        assert r["n_frames"] == n  # data chunk framing (odd tail dropped)
        assert r["framerate"] == _wav_rate(doc_id)  # fmt chunk round-trip
        if n:
            samples = struct.unpack(f"<{n}h", payload[: 2 * n])
            expect = sum(
                samples[(i * n) // ENVELOPE_POINTS]
                for i in range(ENVELOPE_POINTS)
            )
        else:
            expect = 0
        assert r["pcm_checksum"] == expect
    assert saw_corrupt and saw_valid


def test_wav_encoder_emits_canonical_riff():
    """Encoder kernel output is a real WAV file: RIFF/WAVE magic, and
    the stdlib parser reads back exactly the PCM bytes written."""
    import io
    import wave

    import pandas as pd

    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.operators.multimodal import (
        _wav_encode_kernel,
        _wav_rate,
    )

    payload = bytes(range(100))  # 50 int16 samples
    pdf = pd.DataFrame(
        {"doc_id": [1, 7], "source": ["a", "a"], "payload": [payload, payload]}
    )
    out = next(_wav_encode_kernel(iter([pdf])))
    good, corrupt = bytes(out["wav"][0]), bytes(out["wav"][1])
    assert good[:4] == b"RIFF" and good[8:12] == b"WAVE"
    assert not corrupt.startswith(b"RIFF")
    with wave.open(io.BytesIO(good)) as w:
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        assert w.getframerate() == _wav_rate(1)
        assert w.readframes(w.getnframes()) == payload


def test_png_container_roundtrip(spark):
    """The PNG path writes GENUINE containers and decodes them with a
    real parser: per-doc width/height/validity/pixel-checksum match a
    pure-Python replay of the original payload bytes, and corrupted
    docs (doc_id % PNG_CORRUPT_MOD == 0) are rejected not sliced."""
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.operators.multimodal import (
        PNG_CORRUPT_MOD,
        PNG_SAMPLE_POINTS,
        _png_width,
        png_decoded,
    )

    src = {
        r["doc_id"]: (r["text"] or "").encode("utf-8")
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    got = {r["doc_id"]: r for r in png_decoded(spark, SF).collect()}
    assert set(got) == set(src)
    saw_corrupt = saw_valid = False
    for doc_id, payload in src.items():
        r = got[doc_id]
        if doc_id % PNG_CORRUPT_MOD == 0:
            saw_corrupt = True
            assert (r["valid"], r["width"], r["height"], r["n_pixels"]) == (
                0, 0, 0, 0,
            )
            continue
        saw_valid = True
        w = _png_width(doc_id)
        h = max(1, -(-len(payload) // w))
        assert (r["valid"], r["width"], r["height"]) == (1, w, h)
        assert r["n_pixels"] == w * h
        n = w * h
        padded = payload + b"\x00" * (n - len(payload))
        expect = sum(
            padded[(i * n) // PNG_SAMPLE_POINTS]
            for i in range(PNG_SAMPLE_POINTS)
        )
        assert r["px_checksum"] == expect
    assert saw_corrupt and saw_valid


def test_png_decoder_validates_and_reconstructs():
    """The stdlib PNG parser is a real format validator: it verifies
    chunk CRCs, rejects truncation/unknown filters/non-grayscale IHDRs,
    and reconstructs ALL five standard filter types — including
    Average and Paeth, which the engine's encoder never emits (proving
    the decoder is a parser, not an inverse of one encoder)."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.operators.multimodal import (
        PngFormatError,
        _PNG_SIG,
        _png_chunk,
        _png_decode_one,
        _png_encode_one,
    )

    payload = bytes(range(200))
    good = _png_encode_one(3, payload)
    w, h, pix = _png_decode_one(good)

    # CRC tamper: flip one IDAT byte, keep the stored CRC
    idat_off = good.index(b"IDAT")
    tampered = bytearray(good)
    tampered[idat_off + 10] ^= 0xFF
    with pytest.raises(PngFormatError, match="CRC"):
        _png_decode_one(bytes(tampered))

    with pytest.raises(PngFormatError, match="signature"):
        _png_decode_one(b"JUNK" + good)
    with pytest.raises(PngFormatError, match="truncated|missing"):
        _png_decode_one(good[:-8])

    def build(wd, ht, raw, ihdr=None):
        ihdr = ihdr or struct.pack(">IIBBBBB", wd, ht, 8, 0, 0, 0, 0)
        return (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b"")
        )

    # unknown filter type 9
    with pytest.raises(PngFormatError, match="unknown filter"):
        _png_decode_one(build(4, 1, b"\x09abcd"))
    # RGB color type (unsupported by the grayscale-8 contract)
    with pytest.raises(PngFormatError, match="unsupported IHDR"):
        _png_decode_one(
            build(4, 1, b"\x00abcd", ihdr=struct.pack(">IIBBBBB", 4, 1, 8, 2, 0, 0, 0))
        )

    # hand-filtered Average(3) + Paeth(4) image, 3x4: reference image
    img = np.array(
        [[10, 200, 30, 255], [7, 0, 99, 1], [250, 250, 1, 128]], dtype=np.int64
    )
    raw = bytearray()
    # row 0: Average with prev=0 -> filt[x] = pix[x] - recon_left//2
    raw.append(3)
    a = 0
    for x in range(4):
        raw.append(int((img[0, x] - (a + 0) // 2) % 256))
        a = int(img[0, x])
    # row 1: Paeth
    raw.append(4)
    a = 0
    for x in range(4):
        b, c = int(img[0, x]), int(img[0, x - 1]) if x else 0
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        raw.append(int((img[1, x] - pred) % 256))
        a = int(img[1, x])
    # row 2: Average with a real previous row
    raw.append(3)
    a = 0
    for x in range(4):
        raw.append(int((img[2, x] - (a + int(img[1, x])) // 2) % 256))
        a = int(img[2, x])
    wd, ht, out = _png_decode_one(build(4, 3, bytes(raw)))
    assert (wd, ht) == (4, 3)
    assert (out.reshape(3, 4) == img).all()


def test_countmin_estimates_dominate_exact(spark):
    """CMS point estimates are one-sided: cms_n >= exact_n for every
    reported token (the min-over-rows can only overcount), and the
    overcount column is their exact difference."""
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans import (
        REGISTRY,
    )

    rows = REGISTRY["countmin_token_freq"].fn(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 20
    for r in rows:
        assert r.cms_n >= r.exact_n, (r.word, r.cms_n, r.exact_n)
        assert r.overcount == r.cms_n - r.exact_n


def test_bloom_contract_no_false_negatives(spark):
    """The Bloom membership grade must show zero false negatives at any
    scale — a false negative means the filter construction is broken,
    not merely lossy."""
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans import (
        REGISTRY,
    )

    (row,) = REGISTRY["bloom_filter_contract"].fn(spark, "/root/testdata/sf0.001").collect()
    assert row.n_false_negatives == 0
    assert row.n_bloom_hits >= row.n_present
    assert row.n_probes == 4000


def test_pq_lloyd_recall_clears_point_six_everywhere(spark):
    """r8 verdict #3 acceptance: at the registered dial point (k=64,
    2 Lloyd iterations, shortlist max(64, 0.9*sqrt(n))) EVERY query's
    recall@5 is >= 0.6 on the fixture corpus AND on the adversarial
    hard fixture — v1's per-label codebook read 0.0/0.2/0.6."""
    import os

    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.similarity_queries import (
        pq_lloyd_recall_eval,
    )

    for sf in [SF, os.path.join(os.path.dirname(os.path.dirname(__file__)), "testdata_hard")]:
        if not os.path.isdir(os.path.join(sf, "embeddings.parquet")) and not os.path.isfile(
            os.path.join(sf, "embeddings.parquet")
        ):
            continue
        rows = pq_lloyd_recall_eval(spark, sf).collect()
        assert len(rows) == 3
        assert all(r["recall_at_5"] >= 0.6 for r in rows), (sf, rows)


def test_ivfpq_topk_is_cell_restricted_and_reranked(spark):
    """The IVF-PQ composition returns 5 exact-cosine-ranked rows per
    query, every returned neighbor really lives in one of the query's
    nprobe routed cells, and ranks are dense 1..5."""
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.similarity_queries import (
        _IVFPQ_NPROBE,
        _coarse_cells_and_routes,
        ivfpq_topk,
    )

    rows = ivfpq_topk(spark, SF).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, rs in by_q.items():
        assert sorted(r["rank"] for r in rs) == [1, 2, 3, 4, 5]
        sims = [r["cos_sim"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert sims == sorted(sims, reverse=True)
    cells, routes = _coarse_cells_and_routes(spark, SF, _IVFPQ_NPROBE)
    allowed = {
        (r["query_id"], r["neighbor_id"])
        for r in routes.join(cells, "cell").collect()
    }
    assert all((r["query_id"], r["neighbor_id"]) in allowed for r in rows)


def test_pq_lloyd_codebook_is_integer_exact_and_stable(spark):
    """The Lloyd codebook is pure int64 micro-unit arithmetic: every
    centroid element is integral, within the corpus value envelope, and
    a second training run reproduces it bit-for-bit (determinism is
    what the cross-engine oracle contract rests on)."""
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.similarity_queries import (
        _pq_lloyd_codebook,
    )

    a = {(r["s"], r["cid"]): tuple(r["carr"]) for r in _pq_lloyd_codebook(spark, SF).collect()}
    b = {(r["s"], r["cid"]): tuple(r["carr"]) for r in _pq_lloyd_codebook(spark, SF).collect()}
    assert a == b
    assert all(len(v) == 8 for v in a.values())
    assert all(isinstance(x, int) and abs(x) < 10_000_000 for v in a.values() for x in v)


def test_lloyd_kernel_codebook_matches_relational_rendering(spark):
    """r13 optimization pin (the lsh_near_dup precedent): the streaming
    numpy Lloyd kernel must reproduce the original DataFrame loop's
    codebook BIT-FOR-BIT — same seeds, same exact int64 argmin with
    lowest-cid ties, same round(CAST(sum AS DOUBLE)/count) means — on
    both the raw-subvector and the residual training inputs."""
    from pyspark.sql import functions as F

    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.similarity_queries import (
        _IVFPQ_NPROBE,
        _PQ_LLOYD_ITERS,
        _PQ_LLOYD_K,
        _lloyd_codebook_on,
        _lloyd_codebook_on_relational,
        _residual_subs,
        _sub_e6,
    )

    def rows_of(df):
        return {(r["s"], r["cid"]): tuple(r["carr"]) for r in df.collect()}

    raw = _sub_e6(spark, SF).filter(F.col("vec_id") >= 3)
    assert rows_of(
        _lloyd_codebook_on(raw, _PQ_LLOYD_K, _PQ_LLOYD_ITERS)
    ) == rows_of(
        _lloyd_codebook_on_relational(raw, _PQ_LLOYD_K, _PQ_LLOYD_ITERS)
    )
    _, _, csub, _ = _residual_subs(spark, SF, _IVFPQ_NPROBE)
    assert rows_of(
        _lloyd_codebook_on(csub, _PQ_LLOYD_K, _PQ_LLOYD_ITERS)
    ) == rows_of(
        _lloyd_codebook_on_relational(csub, _PQ_LLOYD_K, _PQ_LLOYD_ITERS)
    )


def test_lsh_near_dup_kernel_matches_join_rendering(spark):
    """r8 verdict #4: the bucket-grouped Arrow-kernel rendering of
    lsh_near_dup_pairs must return EXACTLY the pair set of the
    reference join+zip_with rendering (same buckets, same verify
    threshold) — the re-render changed the physical plan, not the
    semantics. Also pins the bits dial: inactive at fixture sizes
    (8 bits up to n=20480), stepping up beyond."""
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.similarity_queries import (
        _emb_n,
        _lsh_bits,
        _lsh_buckets,
        _sim,
        lsh_near_dup_pairs,
    )
    from pyspark.sql import functions as F

    got = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in lsh_near_dup_pairs(spark, SF).collect()
    }
    bk = _lsh_buckets(spark, SF)
    en = _emb_n(spark, SF).join(bk, "vec_id")
    a = en.select(
        "bucket",
        F.col("vec_id").alias("vec_a"),
        F.col("emb").alias("ea"),
        F.col("norm").alias("na"),
    )
    b = en.select(
        "bucket",
        F.col("vec_id").alias("vec_b"),
        F.col("emb").alias("eb"),
        F.col("norm").alias("nb"),
    )
    ref = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            _sim(F.col("ea"), F.col("na"), F.col("eb"), F.col("nb")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.3)
        .collect()
    }
    assert set(got) == set(ref)
    assert all(abs(got[k] - ref[k]) < 1e-9 for k in got)
    assert _lsh_bits(500) == 8 and _lsh_bits(20000) == 8
    assert _lsh_bits(200_000) == 12 and _lsh_bits(2_000_000) == 15


def test_kmeans_kernel_centroids_match_relational_rendering(spark):
    """r14 optimization pin (the Lloyd-PQ precedent): the streaming
    numpy k-means training kernel (full vector as one width-64
    subspace) must reproduce the original DataFrame loop's centroids
    BIT-FOR-BIT — same k-lowest-vec_id seeding, same exact int64 argmin
    with lowest-cid ties, same round(CAST(sum AS DOUBLE)/count) means —
    and the streaming assignment kernel must reproduce the broadcast
    crossJoin argmin's (vec_id, cid, d) rows exactly."""
    from pyspark.sql import functions as F

    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.similarity_queries import (
        _emb_e6,
        _kmeans_assign_kernel,
        _kmeans_centroids,
        _kmeans_centroids_relational,
        _kmeans_model,
        _l2_int,
    )

    a = {
        int(r["cid"]): tuple(int(x) for x in r["carr"])
        for r in _kmeans_centroids(spark, SF).collect()
    }
    b = {
        int(r["cid"]): tuple(int(x) for x in r["carr"])
        for r in _kmeans_centroids_relational(spark, SF).collect()
    }
    assert a == b

    ev = _emb_e6(spark, SF)
    cent_by_s, cids_by_s = _kmeans_model(spark, SF)
    got = {
        (int(r["vec_id"])): (int(r["cid"]), int(r["d"]))
        for r in ev.select("vec_id", "label", "v")
        .mapInPandas(
            _kmeans_assign_kernel(cent_by_s[0], cids_by_s[0]),
            "vec_id long, label int, cid long, d long",
        )
        .collect()
    }
    cent = _kmeans_centroids_relational(spark, SF)
    ref = {
        int(r["vec_id"]): (int(r["m"]["cid"]), int(r["m"]["d"]))
        for r in ev.crossJoin(F.broadcast(cent))
        .select(
            "vec_id", "cid", _l2_int(F.col("v"), F.col("carr")).alias("d")
        )
        .groupBy("vec_id")
        .agg(F.min(F.struct("d", "cid")).alias("m"))
        .collect()
    }
    assert got == ref


def test_langid_kernel_matches_relational_rendering(spark):
    """r14 optimization pin: the numpy trigram kernels (UTF-32
    code-point windows, packed-uint64 counting, in-kernel argmax) must
    reproduce the relational explode/join/window rendering's confusion
    matrix EXACTLY — same trigram unit (code points), same top-40
    tie-break, same inner-join row-dropping for zero-hit docs."""
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.text_queries import (
        _lang_id_trigram_relational,
        lang_id_trigram,
    )

    got = {
        (r["actual_lang"], r["pred_lang"]): int(r["n_docs"])
        for r in lang_id_trigram(spark, SF).collect()
    }
    ref = {
        (r["actual_lang"], r["pred_lang"]): int(r["n_docs"])
        for r in _lang_id_trigram_relational(spark, SF).collect()
    }
    assert got == ref and got


def test_kmeans_doc_clusters_partitions_corpus(spark):
    """k-means invariants: exactly k clusters, cluster sizes partition
    the corpus (every vector assigned exactly once), majority-label
    counts bounded by cluster size, and a second run reproduces the
    table bit-for-bit (the cross-engine oracle rests on integer-exact
    determinism)."""
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.similarity_queries import (
        _KMEANS_K,
        _emb,
        kmeans_doc_clusters,
    )

    rows = kmeans_doc_clusters(spark, SF).collect()
    assert len(rows) == _KMEANS_K
    n = _emb(spark, SF).count()
    assert sum(r["n_vecs"] for r in rows) == n
    assert all(1 <= r["top_label_n"] <= r["n_vecs"] for r in rows)
    assert all(r["mean_sqdist"] >= 0 for r in rows)
    again = kmeans_doc_clusters(spark, SF).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_dsir_top_weights_prefer_target_lang(spark):
    """The importance ranking must actually select for the target
    distribution: every top-ranked doc scores positive (closer to the
    en LM than the raw mixture) and the top-25 is overwhelmingly the
    target language; ranks are dense 1..25 on a deterministic order."""
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.text_queries import (
        _DSIR_TARGET_LANG,
        _DSIR_TOPK,
        dsir_importance_weights,
    )

    rows = dsir_importance_weights(spark, SF).collect()
    assert [r["rank"] for r in rows] == list(range(1, _DSIR_TOPK + 1)) or sorted(
        r["rank"] for r in rows
    ) == list(range(1, _DSIR_TOPK + 1))
    n_target = sum(1 for r in rows if r["lang"] == _DSIR_TARGET_LANG)
    assert n_target >= int(0.8 * _DSIR_TOPK), [(r["lang"], r["dsir_logweight"]) for r in rows]
    assert all(r["dsir_logweight"] > 0 for r in rows)


def test_training_shard_manifest_partitions_and_fingerprints(spark):
    """Manifest invariants: the 16 shards partition the corpus exactly
    (doc counts, token and char budgets sum to the corpus totals), the
    fingerprint is order-insensitive content identity (two runs agree
    bit-for-bit), and no shard is empty at fixture size."""
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.text_queries import (
        _N_SHARDS,
        training_shard_manifest,
    )
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.sources.tables import (
        table,
    )

    rows = training_shard_manifest(spark, SF).collect()
    assert len(rows) == _N_SHARDS
    d = table(spark, SF, "documents")
    n, chars = d.count(), d.agg({"n_chars": "sum"}).first()[0]
    assert sum(r["n_docs"] for r in rows) == n
    assert sum(r["total_chars"] for r in rows) == chars
    assert all(r["n_docs"] >= 1 for r in rows)
    again = {r["shard"]: r["shard_fingerprint"] for r in training_shard_manifest(spark, SF).collect()}
    assert again == {r["shard"]: r["shard_fingerprint"] for r in rows}


def test_quality_classifier_train_is_exact_and_consistent(spark):
    """GD training invariants: one row per language, doc counts sum to
    the corpus, predicted-target counts and correctness bounded by the
    group size, mean probability strictly inside (0, 1e6) micro-units,
    and a second training run reproduces the table bit-for-bit (the
    unrolled-CTE oracle rests on integer-exact determinism)."""
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.text_queries import (
        quality_classifier_train,
    )
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.sources.tables import (
        table,
    )

    rows = quality_classifier_train(spark, SF).collect()
    d = table(spark, SF, "documents")
    assert len(rows) == d.select("lang").distinct().count()
    assert sum(r["n_docs"] for r in rows) == d.count()
    for r in rows:
        assert 0 <= r["n_predicted_target"] <= r["n_docs"]
        assert 0 <= r["n_correct"] <= r["n_docs"]
        assert 0 < r["mean_p6"] < 1_000_000
    again = quality_classifier_train(spark, SF).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_bpe_compression_curve_is_monotone(spark):
    """Merges only ever shrink the corpus: total tokens and fertility
    are non-increasing across the 11 curve points, iteration 0 equals
    the raw character count, and the symbol vocabulary never shrinks
    by more than it grows (each merge adds one symbol; sources may
    disappear when fully consumed)."""
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.text_queries import (
        _BPE_MERGE_ITERS,
        bpe_compression_curve,
    )

    rows = sorted(bpe_compression_curve(spark, SF).collect(), key=lambda r: r["it"])
    assert [r["it"] for r in rows] == list(range(_BPE_MERGE_ITERS + 1))
    toks = [r["total_tokens"] for r in rows]
    assert all(a >= b for a, b in zip(toks, toks[1:]))
    assert toks[0] > toks[-1]
    tpw = [r["tokens_per_word"] for r in rows]
    assert all(a >= b for a, b in zip(tpw, tpw[1:]))
    assert all(r["n_distinct_symbols"] >= 1 for r in rows)
