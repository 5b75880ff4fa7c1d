"""Distributed iterative graph operators.

The reference has no graph surface; this exists because transitive
closure over a near-duplicate pair graph ("A~B and B~C means one
cluster, keep one exemplar") is the step every dedup pipeline needs
between pairwise similarity and row dropping.

Design: driver-orchestrated LAZY rounds (the PageRank / label-
propagation execution class). The driver never holds data — only a
changed-row counter per round; ``localCheckpoint`` truncates lineage so
plan depth stays bounded regardless of round count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame, src: str = "s", dst: str = "d", max_rounds: int = 25
) -> DataFrame:
    """Min-label connected components over an UNDIRECTED edge list
    (pass each edge once in either direction; both directions are
    generated internally). Returns ``(v, lbl)`` where ``lbl`` is the
    smallest vertex id in ``v``'s component.

    Each round: (1) every vertex adopts the min label among itself and
    its neighbors (one equi-join + groupBy-min — partial aggregation
    map-side), then (2) pointer halving — adopt the label OF your label
    (one more equi-join), collapsing label chains so convergence takes
    O(log diameter) rounds instead of O(diameter). Convergence is
    detected from a flag column carried in the checkpointed result
    (a scan of materialized partitions, not an extra shuffle join).

    At 100 TB the same per-round plan holds; swap-in for the
    large-star/small-star variant is a prompt change, not a reshape —
    both are rounds of (equi-join + min-agg) over (v, lbl).
    """
    # Single scan of `edges` exploding each pair into both directions —
    # a union of two selects would evaluate the (often expensive)
    # upstream pair-producing plan twice before the cache fills.
    both = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("s"), F.col(dst).alias("d")),
                    F.struct(F.col(dst).alias("s"), F.col(src).alias("d")),
                )
            ).alias("e")
        )
        .select("e.s", "e.d")
        .cache()
    )
    labels = both.select(F.col("s").alias("v")).distinct().withColumn("lbl", F.col("v"))
    labels = labels.localCheckpoint()
    for _ in range(max_rounds):
        msgs = (
            both.join(labels, both.s == labels.v)
            .groupBy(F.col("d").alias("v2"))
            .agg(F.min("lbl").alias("nbr_min"))
        )
        gathered = labels.join(msgs, labels.v == msgs.v2, "left").select(
            "v",
            F.col("lbl").alias("old_lbl"),
            F.least(F.col("lbl"), F.coalesce(F.col("nbr_min"), F.col("lbl"))).alias("lbl"),
        )
        hop = gathered.select(F.col("v").alias("hv"), F.col("lbl").alias("hlbl"))
        new_labels = (
            gathered.join(hop, gathered.lbl == hop.hv, "left")
            .select(
                "v",
                F.least(F.col("lbl"), F.coalesce(F.col("hlbl"), F.col("lbl"))).alias("lbl"),
                (
                    F.least(F.col("lbl"), F.coalesce(F.col("hlbl"), F.col("lbl")))
                    < F.col("old_lbl")
                ).alias("chg"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("chg")).count()
        labels = new_labels.select("v", "lbl")
        if changed == 0:
            break
    else:
        raise RuntimeError(f"connected_components: no convergence in {max_rounds} rounds")
    both.unpersist()
    return labels
