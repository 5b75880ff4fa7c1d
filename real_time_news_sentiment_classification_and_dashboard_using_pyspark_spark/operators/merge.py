"""Delta-style MERGE (upsert) as a composition of DataFrame ops.

The reference has no mutation surface at all (its sinks are
append-only); every production pipeline eventually needs "apply this
changes batch to the base table" — update matched keys, insert new
ones. Table formats (Delta/Iceberg) implement MERGE natively; this is
the same semantics expressed with joins, usable on plain parquet.

Scale shape — deliberately NOT one full-outer join: a full-outer
shuffles the ENTIRE base table full-width. Instead:

1. updates: ``base LEFT JOIN broadcast(changes)`` — the base never
   shuffles; matched rows pick the changed values via coalesce.
2. inserts: ``changes LEFT ANTI join base-keys`` — shuffles only the
   narrow key projection of base plus the (small) changes batch.

Total shuffled bytes are O(|changes| + |base keys|), not O(|base|) —
the difference between a nightly upsert that rewrites 100 TB of
shuffle and one that streams the base straight to the writer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def merge_upsert(base: DataFrame, changes: DataFrame, key: str) -> DataFrame:
    """Upsert ``changes`` into ``base`` on ``key`` (both sides share a
    schema; ``changes`` must have at most one row per key). Returns the
    merged relation plus a ``_merge_action`` column
    (``update``/``insert``/``keep``) so callers can audit the batch —
    drop it before writing."""
    cols = base.columns
    if changes.columns != cols:
        raise ValueError(f"schema mismatch: {changes.columns} vs {cols}")
    b = base.alias("b")
    c = changes.alias("c")

    updated = b.join(F.broadcast(c), F.col(f"b.{key}") == F.col(f"c.{key}"), "left").select(
        *[F.coalesce(F.col(f"c.{x}"), F.col(f"b.{x}")).alias(x) for x in cols],
        F.when(F.col(f"c.{key}").isNotNull(), "update")
        .otherwise("keep")
        .alias("_merge_action"),
    )
    inserts = changes.join(
        base.select(key), key, "left_anti"
    ).withColumn("_merge_action", F.lit("insert"))
    return updated.unionByName(inserts)
