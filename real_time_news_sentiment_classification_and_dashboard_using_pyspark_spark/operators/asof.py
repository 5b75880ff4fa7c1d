"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks,
built as a composition of built-in ops (union + window last-ignorenulls),
NOT a range join or a per-row UDF.

Shape: for every left row (left_on, left_ts), attach the most recent
right row with right_on == left_on and right_ts <= left_ts (inclusive).

Why this rendering scales: a naive formulation is a non-equi range join
(quadratic per key) or a per-left-row subquery. The union-window
rendering is one shuffle on the key + one ordered window scan:

    union(tag right rows 0, left rows 1)
      -> window over (key ORDER BY t, tag): last(right_col, ignorenulls)
      -> keep left rows

Each partition is processed streaming in time order, carrying the
latest right values — O(n log n) for the sort, linear after, no row
explosion. Ties (left_ts == right_ts) resolve to the right row (tag 0
sorts first), matching DuckDB ASOF's inclusive >= semantics. ``right``
must be unique per (right_on, right_ts) for deterministic output —
pre-dedup with a row_number window if it is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Left as-of join; output = all left columns + ``right_cols``
    (null where no right row is <= the left timestamp)."""
    # The right payload travels as ONE struct so last(ignorenulls) picks
    # a whole right row atomically — filling each column independently
    # would back-fill a legitimately-NULL field from an older right row,
    # mixing columns across rows and breaking as-of semantics.
    r = right.select(
        F.col(right_on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_tag"),
        F.lit(None).alias("_l"),  # retyped below
        F.struct(*[F.col(c) for c in right_cols]).alias("_r"),
    )
    l = left.select(
        F.col(left_on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_tag"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
    )
    r = r.withColumn("_l", F.lit(None).cast(l.schema["_l"].dataType))
    unioned = l.unionByName(r.select(l.columns))

    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    unioned = unioned.withColumn("_r", F.last("_r", ignorenulls=True).over(w))
    return unioned.filter(F.col("_tag") == 1).select(
        F.col("_l.*"), *[F.col(f"_r.{c}").alias(c) for c in right_cols]
    )
