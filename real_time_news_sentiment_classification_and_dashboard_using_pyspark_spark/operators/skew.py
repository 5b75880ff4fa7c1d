"""Skew mitigation: salted aggregation and hot/cold-split salted join.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; these are the explicit renderings for the cases AQE can't see —
a single hot grouping key (e.g. the 3-value ``sentiment`` column at
100 TB: ~33 billion rows per key would pin three reducers), or a
fact-fact join whose hot key must be spread *before* the shuffle.

``salted_agg``: two-phase aggregation — salt the key with a random
shard in [0, n_salts), partially aggregate on (key, salt), then finish
on the key. The first shuffle spreads each hot key over n_salts
reducers; the second moves only n_salts rows per key. Only works for
algebraic aggregates (sum/count/min/max — anything with a merge step).

``skew_split_join``: the manual rendering of AQE's skew-join split for
a fact-fact equi-join with a few hot keys. Rows are routed two ways:
cold keys take the ordinary hash join; hot keys take a salted join —
the bigger side salted randomly over [0, n_salts), the other side
replicated once per salt — so a key holding 30 % of the table spreads
over n_salts reducers instead of pinning one. The hot-key set is tiny
by definition (it's the set of keys too big for one reducer), so both
the routing semi/anti joins and the replication broadcast it.
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


def hot_keys(df: DataFrame, key: str, min_share: float = 0.05) -> DataFrame:
    """Keys holding at least ``min_share`` of the rows — the candidates
    that would pin a reducer in a keyed shuffle. One partial-first count
    aggregate; the grand total joins back as a broadcast 1-row scalar
    (never an unpartitioned window, which would single-task the per-key
    counts — fine at 25 nations, wrong at 10^9 keys). At 100 TB run this
    over a sample or reuse table statistics instead."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("_cnt"))
    total = counts.agg(F.sum("_cnt").alias("_tot"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("_cnt") >= F.lit(min_share) * F.col("_tot"))
        .select(key)
    )


def skew_split_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    hot: DataFrame,
    n_salts: int = 16,
) -> DataFrame:
    """Fact-fact equi-join with hot keys spread over ``n_salts``
    reducers (inner join on one key column; ``hot`` is the — tiny —
    hot-key relation, e.g. from ``hot_keys``).

    Cold rows: plain hash join, untouched. Hot rows: the left side gets
    a random salt in [0, n_salts), the right side is replicated once
    per salt value (posexplode of a literal range), and the join runs
    on (key, salt) — each hot key's work lands on n_salts reducers. The
    result is the exact inner-join row multiset: each left-hot row
    joins the single replica matching its salt.

    This is what AQE's skew split does at runtime for sort-merge joins;
    the explicit rendering exists for plans AQE can't rescue (e.g. a
    skewed shuffle feeding a non-join operator, or engines/configs with
    AQE off) and as the documented fallback when one key exceeds even a
    split partition."""
    # The hot relation feeds FOUR joins (semi/anti on each side); without
    # materialization each one re-evaluates the hot-key aggregation —
    # four extra passes over the fact table at 100 TB. The set is tiny
    # by definition, so it is localCheckpoint-ed once (eager, one
    # partial-agg job) and the four joins broadcast-probe the stored
    # rows. localCheckpoint, not cache(): checkpoint blocks are released
    # by the ContextCleaner as soon as this plan is garbage-collected,
    # while cache() pins a CacheManager entry until an explicit
    # unpersist — in a long-lived session running many such joins the
    # cached hot sets would otherwise accumulate until LRU pressure.
    # Trade-off (engine-wide, applies to every localCheckpoint in this
    # package): checkpoint blocks are stored NON-reliably on executors
    # with lineage truncated, so losing an executor (or a dynamic-
    # allocation scale-down) after the checkpoint makes the downstream
    # job unrecoverable, and eager=True runs a real Spark job at
    # plan-build time. On a cluster with dynamic allocation use
    # reliable checkpoint() to a DFS dir, or cache()+unpersist with an
    # explicit lifecycle, where recomputability matters more than
    # driver-memory hygiene.
    hot = F.broadcast(hot.select(key).localCheckpoint(eager=True))
    left_hot = left.join(hot, key, "left_semi")
    left_cold = left.join(hot, key, "left_anti")
    right_hot = right.join(hot, key, "left_semi")
    right_cold = right.join(hot, key, "left_anti")

    cold = left_cold.join(right_cold, key)

    salts = F.array([F.lit(i) for i in range(n_salts)])
    lh = left_hot.withColumn("_salt", (F.rand(seed=7) * n_salts).cast("int"))
    rh = right_hot.withColumn("_salt", F.explode(salts))
    hot_joined = lh.join(rh, [key, "_salt"]).drop("_salt")
    return cold.unionByName(hot_joined)
