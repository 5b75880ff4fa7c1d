"""Streaming near-duplicate suppression against a persisted LSH index.

The reference dedups only within one in-memory frame
(/root/reference/streamlit_app.py:147, ``drop_duplicates`` on title).
At scale, the production question is different: "is this INCOMING
article a near-copy of anything already in the corpus?" — answered per
micro-batch against an index that outlives any batch. This operator is
that answer for Structured Streaming: inside ``foreachBatch``, the
batch pays MinHash signatures for ITS OWN rows only and probes the
materialized shingle store's banded index (``dedup_queries.
build_shingle_artifact``); candidates are exact-verified at the family
threshold and matching rows are dropped before they reach the sink.

Work per batch: tokenize/shingle/signature over |batch| rows (narrow),
one (band, sig)-keyed probe join into the index, one verify join over
candidates, one anti join — nothing rescans or re-signatures the
corpus, mirroring ``plans.dedup_queries.incremental_near_dup`` (the
registered, oracle-checked batch twin of this operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# 3-token shingle assembly over an arbitrary text column — identical
# semantics to the dedup family's corpus build (clean -> split ->
# 3-gram -> distinct), parameterized by column name.
_TOKS_TMPL = (
    "filter(split(lower(regexp_replace({col}, '[^a-zA-Z\\\\s]', '')), ' '), "
    "x -> x != '')"
)


def shingle_arrays_of(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, sh_arr): per-row distinct 3-token shingle arrays for an
    arbitrary (id, text) relation — the generic form of the dedup
    corpus build, one narrow map, no shuffle."""
    toks = _TOKS_TMPL.format(col=text_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(
            f"array_distinct(if(size({toks}) < 3, array(), "
            f"transform(sequence(1, size({toks}) - 2), "
            f"i -> concat_ws(' ', {toks}[i-1], {toks}[i], {toks}[i+1]))))"
        ).alias("sh_arr"),
    )


def near_dup_matches(
    batch_df: DataFrame,
    store: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """(doc_id, dup_of, jaccard) for every batch row that is a verified
    near-duplicate of an indexed corpus doc. ``store`` is the dict from
    ``dedup_queries._shingle_store`` (needs ``bands`` + ``arrays``)."""
    from ..plans.dedup_queries import _minhash_bands_from_hashes

    arr = shingle_arrays_of(batch_df, id_col, text_col)
    hashes = arr.select(
        "doc_id", F.explode("sh_arr").alias("shingle")
    ).withColumn(
        "h32",
        F.conv(F.substring(F.md5("shingle"), 25, 8), 16, 10).cast("bigint"),
    ).select("doc_id", "h32")
    delta_bands = _minhash_bands_from_hashes(hashes)
    cand = (
        delta_bands.alias("d")
        .join(
            store["bands"].alias("c"),
            (F.col("d.band") == F.col("c.band"))
            & (F.col("d.sig") == F.col("c.sig")),
        )
        .select(F.col("d.doc_id").alias("doc_id"), F.col("c.doc_id").alias("dup_of"))
        .distinct()
    )
    a = arr.select(
        "doc_id", F.col("sh_arr").alias("arr_a"), F.size("sh_arr").alias("sz_a")
    )
    b = store["arrays"].select(
        F.col("doc_id").alias("dup_of"),
        F.col("sh_arr").alias("arr_b"),
        F.size("sh_arr").alias("sz_b"),
    )
    jac = (
        cand.join(a, "doc_id")
        .join(b, "dup_of")
        .withColumn("n_inter", F.size(F.array_intersect("arr_a", "arr_b")))
        .select(
            "doc_id",
            "dup_of",
            F.round(
                F.col("n_inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")).cast("double"),
                4,
            ).alias("jaccard"),
        )
    )
    return jac.filter(F.col("jaccard") >= F.lit(threshold))


def drop_near_dups(
    batch_df: DataFrame,
    store: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """The ``foreachBatch`` building block: batch rows minus verified
    near-duplicates of the indexed corpus. Anti join on the id keeps the
    batch's own columns untouched; a batch row matching several corpus
    docs is dropped once."""
    matches = near_dup_matches(batch_df, store, id_col, text_col, threshold)
    return batch_df.join(
        matches.select(F.col("doc_id").alias(id_col)).distinct(),
        id_col,
        "left_anti",
    )
