"""Skew mitigation: salted aggregation and salted broadcast-side join.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; these are the explicit renderings for the cases AQE can't see —
a single hot grouping key (e.g. the 3-value ``sentiment`` column at
100 TB: ~33 billion rows per key would pin three reducers).

``salted_agg``: two-phase aggregation — salt the key with a random
shard in [0, n_salts), partially aggregate on (key, salt), then finish
on the key. The first shuffle spreads each hot key over n_salts
reducers; the second moves only n_salts rows per key. Only works for
algebraic aggregates (sum/count/min/max — anything with a merge step).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column -> (phase1 aggregate over raw rows,
    phase2 aggregate over phase1 partials); e.g.
    ``{"cnt": (F.count(F.lit(1)), F.sum("cnt")),
       "total": (F.sum("value"), F.sum("total"))}``.
    """
    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    phase1 = salted.groupBy(key, "_salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return phase1.groupBy(key).agg(
        *[merge.alias(name) for name, (_, merge) in aggs.items()]
    )
