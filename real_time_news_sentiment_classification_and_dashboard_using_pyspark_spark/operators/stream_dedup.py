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

Every definition that must agree with the persisted store bit-for-bit
is IMPORTED from ``plans.dedup_queries``, never re-implemented:
tokenize + shingle assembly (``shingle_arrays_of``), the 32-bit hash
(``h32_expr``), banded signatures (``_minhash_bands_from_hashes``),
and exact verification (``verify_jaccard_pairs``). A semantics change
on the build side therefore changes the prober in the same commit, or
the store's params-keyed path orphans the old artifact — either way
the two sides cannot silently diverge.

Work per batch: tokenize/shingle/signature over |batch| rows (narrow),
one (band, sig)-keyed probe join into the index, one verify join over
candidates, one anti join — nothing rescans or re-signatures the
corpus, mirroring ``plans.dedup_queries.incremental_near_dup`` (the
registered, oracle-checked batch twin of this operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..plans.dedup_queries import (
    _minhash_bands_from_hashes,
    h32_expr,
    shingle_arrays_of,
    verify_jaccard_pairs,
)


def near_dup_matches(
    batch_df: DataFrame,
    store: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    exclude_self: bool = True,
) -> DataFrame:
    """(doc_id, dup_of, jaccard) for every batch row that is a verified
    near-duplicate of an indexed corpus doc. ``store`` is the dict from
    ``dedup_queries._shingle_store`` (needs ``bands`` + ``arrays``).

    ``exclude_self`` (default True) filters candidates where the batch
    row's id equals the indexed doc's id. Without it, a replayed
    micro-batch after checkpoint recovery — or a revised version of a
    doc the caller already indexed into its own sink — self-matches at
    jaccard 1.0 and is silently dropped. With at-least-once sinks that
    index their own output this default is what you want (replay is
    not a duplicate of *another* doc); pass ``exclude_self=False`` only
    when ids are known fresh and an id collision should count as a
    dup."""
    arr = shingle_arrays_of(batch_df, id_col, text_col)
    hashes = arr.select("doc_id", F.explode("sh_arr").alias("shingle")).select(
        "doc_id", h32_expr("shingle").alias("h32")
    )
    delta_bands = _minhash_bands_from_hashes(hashes)
    probe_cond = (F.col("d.band") == F.col("c.band")) & (
        F.col("d.sig") == F.col("c.sig")
    )
    if exclude_self:
        # String-compare: batch ids and index ids may differ in type
        # (article ids vs numeric corpus ids) — a raw != would implicit-
        # cast to null and silently drop EVERY candidate.
        probe_cond = probe_cond & (
            F.col("d.doc_id").cast("string") != F.col("c.doc_id").cast("string")
        )
    cand = (
        delta_bands.alias("d")
        .join(store["bands"].alias("c"), probe_cond)
        .select(F.col("d.doc_id").alias("doc_id"), F.col("c.doc_id").alias("dup_of"))
        .distinct()
    )
    return verify_jaccard_pairs(
        cand, arr, store["arrays"], "doc_id", "dup_of", threshold
    )


def drop_near_dups(
    batch_df: DataFrame,
    store: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    exclude_self: bool = True,
) -> DataFrame:
    """The ``foreachBatch`` building block: batch rows minus verified
    near-duplicates of the indexed corpus. Anti join on the id keeps the
    batch's own columns untouched; a batch row matching several corpus
    docs is dropped once. ``exclude_self`` (default True) keeps a
    replayed micro-batch (at-least-once recovery over a self-indexing
    sink) from being swallowed by its own earlier index entry — see
    ``near_dup_matches``."""
    matches = near_dup_matches(
        batch_df, store, id_col, text_col, threshold, exclude_self
    )
    return batch_df.join(
        matches.select(F.col("doc_id").alias(id_col)).distinct(),
        id_col,
        "left_anti",
    )
