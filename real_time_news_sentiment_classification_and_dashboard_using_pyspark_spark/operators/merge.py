"""Delta-style MERGE (upsert) as a composition of DataFrame ops.

The reference has no mutation surface at all (its sinks are
append-only); every production pipeline eventually needs "apply this
changes batch to the base table" — update matched keys, insert new
ones. Table formats (Delta/Iceberg) implement MERGE natively; this is
the same semantics expressed with joins, usable on plain parquet.

Scale shape — deliberately NOT one full-outer join: a full-outer
shuffles the ENTIRE base table full-width. Instead:

1. updates: ``base LEFT JOIN broadcast(changes)`` — the base never
   shuffles; matched rows pick the changed values via coalesce. The
   broadcast hint is size-aware (``maybe_broadcast``): a changes batch
   above ``broadcast_max_rows`` skips the hint so AQE picks a shuffled
   hash join instead of hitting the 8 GB broadcast wall.
2. inserts: ``changes LEFT ANTI join base-keys`` — shuffles only the
   narrow key projection of base plus the (small) changes batch.

Total shuffled bytes are O(|changes| + |base keys|), not O(|base|) —
the difference between a nightly upsert that rewrites 100 TB of
shuffle and one that streams the base straight to the writer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Above this many change rows the broadcast hint is withheld: Spark's
# broadcast has an 8 GB hard wall and materializes the whole relation on
# the driver + every executor, so a large backfill batch must go through
# a shuffled hash join (AQE picks it) instead.
DEFAULT_BROADCAST_MAX_ROWS = 1_000_000


def maybe_broadcast(changes: DataFrame, max_rows: int | None) -> DataFrame:
    """Broadcast ``changes`` only when it is provably small.

    The probe is ``limit(max_rows + 1).count()`` — bounded work no
    matter how large the batch is (the scan short-circuits after
    max_rows+1 rows), unlike a full ``count()`` which would pay a pass
    over a 100 TB backfill just to decide a join strategy.
    ``max_rows=None`` force-broadcasts (caller asserts smallness)."""
    if max_rows is None:
        return F.broadcast(changes)
    if changes.limit(max_rows + 1).count() <= max_rows:
        return F.broadcast(changes)
    return changes


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    broadcast_max_rows: int | None = DEFAULT_BROADCAST_MAX_ROWS,
) -> DataFrame:
    """Upsert ``changes`` into ``base`` on ``key`` (both sides share a
    schema; ``changes`` must have at most one row per key). Returns the
    merged relation plus a ``_merge_action`` column
    (``update``/``insert``/``keep``) so callers can audit the batch —
    drop it before writing.

    NOT a pure plan builder: the size-aware broadcast probe runs an
    eager bounded action (``limit(N+1).count()``) at call time, and an
    uncached ``changes`` lineage is then computed twice (probe + join)
    — ``persist()`` an expensive changes plan before calling. Streaming
    ``changes`` can't be counted: pass ``broadcast_max_rows=None``
    (asserts the batch is broadcast-small) to keep the call lazy."""
    cols = base.columns
    if changes.columns != cols:
        raise ValueError(f"schema mismatch: {changes.columns} vs {cols}")
    b = base.alias("b")
    c = maybe_broadcast(changes, broadcast_max_rows).alias("c")

    updated = b.join(c, F.col(f"b.{key}") == F.col(f"c.{key}"), "left").select(
        *[F.coalesce(F.col(f"c.{x}"), F.col(f"b.{x}")).alias(x) for x in cols],
        F.when(F.col(f"c.{key}").isNotNull(), "update")
        .otherwise("keep")
        .alias("_merge_action"),
    )
    inserts = changes.join(
        base.select(key), key, "left_anti"
    ).withColumn("_merge_action", F.lit("insert"))
    return updated.unionByName(inserts)
