"""SCD Type-2 (slowly-changing dimension) history maintenance.

The reference overwrites its outputs wholesale; a warehouse dimension
needs HISTORY: when an attribute changes, the current row is closed
(``valid_to`` stamped) and a new current row opens. This is the other
half of the mutation surface next to ``operators.merge`` — MERGE for
facts, SCD2 for dimensions.

Scale shape mirrors merge_upsert: the changes batch is broadcast when
provably small (``merge.maybe_broadcast`` — a large backfill batch
falls back to a shuffled join rather than the 8 GB broadcast wall);
the history table is never shuffled in the broadcast case — closing
rows is a broadcast left join + conditional column rewrite, opening
rows is a union of the (small) changes. Shuffled bytes O(|changes|),
not O(|history|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .merge import DEFAULT_BROADCAST_MAX_ROWS, maybe_broadcast


def scd2_apply(
    hist: DataFrame,
    changes: DataFrame,
    key: str,
    effective: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    broadcast_max_rows: int | None = DEFAULT_BROADCAST_MAX_ROWS,
) -> DataFrame:
    """Apply a changes batch to an SCD2 history table.

    ``hist`` carries ``from_col``/``to_col`` (``to_col`` NULL = current
    row); ``changes`` carries the dimension's natural columns (no
    validity columns, at most one row per key) and is stamped
    ``effective`` (an ISO date/timestamp string). Every current row
    whose key appears in ``changes`` is closed at ``effective``; each
    change opens as the new current row. Unchanged keys and already-
    closed history pass through untouched.

    Same eager-probe contract as ``merge_upsert``: the size-aware
    broadcast check counts a bounded prefix of ``changes`` at call time
    and an uncached changes lineage is computed twice; persist an
    expensive plan first, and pass ``broadcast_max_rows=None`` for
    streaming/force-broadcast callers."""
    dim_cols = [c for c in hist.columns if c not in (from_col, to_col)]
    if sorted(changes.columns) != sorted(dim_cols):
        raise ValueError(f"changes must carry {dim_cols}, got {changes.columns}")
    ckeys = maybe_broadcast(
        changes.select(F.col(key).alias("_ck")), broadcast_max_rows
    )
    closing = F.col(to_col).isNull() & F.col("_ck").isNotNull()
    closed = (
        hist.join(ckeys, hist[key] == F.col("_ck"), "left")
        .withColumn(to_col, F.when(closing, F.lit(effective)).otherwise(F.col(to_col)))
        .drop("_ck")
    )
    opened = changes.select(
        *dim_cols,
        F.lit(effective).alias(from_col),
        F.lit(None).cast("string").alias(to_col),
    )
    return closed.unionByName(opened)
