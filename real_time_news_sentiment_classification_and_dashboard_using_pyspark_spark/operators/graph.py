"""Distributed iterative graph operators.

The reference has no graph surface; this exists because transitive
closure over a near-duplicate pair graph ("A~B and B~C means one
cluster, keep one exemplar") is the step every dedup pipeline needs
between pairwise similarity and row dropping.

Design: two-phase connected components —

1. **Partition-local contraction** (union-of-spanning-forests): each
   partition runs a union-find over its own edges and emits star edges
   ``(x -> component-min)``. The union of per-partition spanning forests
   preserves global connectivity (every edge's endpoints stay connected
   through their partition's forest), so the star set is an equivalent,
   usually far smaller, graph. Round 1 needs NO shuffle — it contracts
   whatever partitioning the edge producer left. Later rounds repartition
   the shrinking star set into geometrically fewer partitions so stars
   that share a vertex meet. Dense near-dup clusters (cliques) collapse
   to ``k-1`` stars in one pass — the common case at 100 TB.
2. **Min-label propagation with pointer halving** on the contracted
   graph: the O(log diameter) convergence guarantee for the adversarial
   shapes contraction shrinks slowly (long paths), now over forest-sized
   data instead of the raw pair set.

The driver never holds data — only per-round edge counts; checkpoints
truncate lineage so plan depth stays bounded regardless of round count.
``checkpoint_dir`` switches lineage truncation from ``localCheckpoint``
(executor-local, lost on executor failure) to reliable ``checkpoint``
into a fault-tolerant directory — the right mode for long 100 TB runs
where losing one executor mid-iteration must not kill the job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Target edges per contraction partition. Bounds the per-task union-find
# dict (~2x this many entries worst case); later rounds shrink partition
# count as the star set shrinks instead of fragmenting it.
_EDGES_PER_PART = 4_000_000

# Stop contracting when a round shrinks the edge set by less than this
# factor — pointer halving finishes such shapes in O(log d) rounds.
_MIN_SHRINK = 0.7

# Fast-path bound: below this many edges a SINGLE global union-find
# task beats the iterative loop's per-round driver jobs. Deliberately
# far below _EDGES_PER_PART: a one-partition union-find is *correct* up
# to 4M edges, but funneling millions of edges through one Python task
# serializes work 31 cores could share — the fast path is for the
# verified-near-dup regime (hundreds to tens of thousands of edges)
# where scheduling overhead, not union-find CPU, dominates.
_SMALL_GRAPH_EDGES = 100_000


def _uf_partition(batches):
    """Partition-local union-find; emits star edges (x, r) with r the
    component's minimum vertex, omitting roots (x == r). State is one
    dict over the vertices seen in this partition — bounded by the
    partition's edge count, which ``_EDGES_PER_PART`` caps."""
    import pandas as pd

    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:
            parent[x], x = root, parent[x]
        return root

    verts = set()
    for pdf in batches:
        for a, b in zip(pdf["a"], pdf["b"]):
            verts.add(a)
            verts.add(b)
            ra, rb = find(a), find(b)
            if ra == rb:
                continue
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    xs, rs = [], []
    for v in verts:
        r = find(v)
        if r != v:
            xs.append(v)
            rs.append(r)
    if xs:
        yield pd.DataFrame({"x": xs, "r": rs})


def connected_components(
    edges: DataFrame,
    src: str = "s",
    dst: str = "d",
    max_rounds: int = 25,
    checkpoint_dir: str | None = None,
    small_cutoff: int = _SMALL_GRAPH_EDGES,
) -> DataFrame:
    """Min-label connected components over an UNDIRECTED edge list
    (pass each edge once in either direction). Returns ``(v, lbl)``
    where ``lbl`` is the smallest vertex id in ``v``'s component; every
    vertex appearing in ``edges`` (including self-loop-only ones) gets a
    row.

    ``checkpoint_dir``: if given, per-round results are checkpointed to
    reliable storage (``SparkContext.setCheckpointDir`` + eager
    ``DataFrame.checkpoint``) so an executor loss mid-iteration replays
    from the checkpoint instead of recomputing the whole pair-producing
    lineage; default falls back to executor-local ``localCheckpoint``.

    ``small_cutoff``: an edge set at or below this many edges takes the
    SMALL-GRAPH FAST PATH — one global union-find task, zero iteration.
    A verified near-dup edge set is routinely tiny even when the corpus
    is huge (463 edges at the driver's sf0.1 corpus), and the generic
    loop's per-round driver jobs (persist + count per round) cost more
    than the entire union-find. The default (100k edges) is well below
    what one partition could HOLD (_EDGES_PER_PART = 4M) on purpose: a
    multi-million-edge single task would serialize CPU the contraction
    loop happily spreads across the cluster — the fast path targets the
    scheduling-overhead-dominated regime only. Tests pass
    ``small_cutoff=0`` to force the iterative path.
    """
    spark = edges.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def _persist(df: DataFrame) -> DataFrame:
        return df.checkpoint(eager=True) if checkpoint_dir else df.localCheckpoint()

    vtype = edges.schema[src].dataType.simpleString()

    # ONE materialization of the (possibly expensive) edge producer —
    # the vertex set, the filtered edge set, and every contraction round
    # read the truncated lineage instead of re-running the producer.
    e_all = _persist(edges.select(F.col(src).alias("a"), F.col(dst).alias("b")))
    # Every vertex (both endpoints — covers self-loops and both edge
    # orientations) belongs to the output.
    verts = e_all.select(F.explode(F.array("a", "b")).alias("v")).distinct()
    e = e_all.filter(F.col("a") != F.col("b"))
    n_edges = e.count()

    if n_edges == 0:
        return verts.withColumn("lbl", F.col("v"))

    if n_edges <= small_cutoff:
        # fast path: the whole edge set fits one contraction partition,
        # so a single union-find task IS the final answer — stars map
        # every non-root vertex to its component min; roots and
        # self-loop-only vertices keep their own id via the left join.
        stars = e.coalesce(1).mapInPandas(_uf_partition, f"x {vtype}, r {vtype}")
        m = stars.select(F.col("x").alias("v"), F.col("r"))
        return verts.join(m, "v", "left").select(
            "v", F.coalesce("r", "v").alias("lbl")
        )

    labels = _persist(verts.withColumn("lbl", F.col("v")))

    cached: list[DataFrame] = []
    try:
        # ---- phase 1: partition-local contraction ----------------------
        rounds_left = max_rounds
        while n_edges > 0 and rounds_left > 0:
            rounds_left -= 1
            exact = e.rdd.getNumPartitions() == 1
            stars = _persist(
                e.mapInPandas(_uf_partition, f"x {vtype}, r {vtype}")
            )
            n_stars = stars.count()
            # Fold this round's mapping into the global labels. A vertex
            # straddling partitions appears in several forests with
            # different roots — groupBy-min keeps the fold functional;
            # the residual r1~r2 connectivity stays in the star graph.
            m = stars.groupBy(F.col("x").alias("mx")).agg(F.min("r").alias("mr"))
            labels = _persist(
                labels.join(m, labels.lbl == m.mx, "left").select(
                    "v", F.coalesce("mr", "lbl").alias("lbl")
                )
            )
            if n_stars == 0 or exact:
                # no edges left, or the whole graph fit one partition —
                # that union-find was global, labels are final
                n_edges = 0
                break
            shrunk = n_stars <= n_edges * _MIN_SHRINK
            n_edges = n_stars
            # next round: squeeze the star set into fewer partitions so
            # stars sharing a vertex meet. Keep contracting while the
            # partition count can still drop (a squeeze round makes
            # progress even when the edge count stalled — components
            # split across partitions merge once colocated); hand the
            # true pathology (minimal partitions AND no shrink — long
            # paths wider than one partition) to pointer halving.
            e = stars.select(F.col("x").alias("a"), F.col("r").alias("b"))
            cur_parts = e.rdd.getNumPartitions()
            n_parts = max(1, -(-n_stars // _EDGES_PER_PART))
            if n_parts < cur_parts:
                e = e.repartition(n_parts, "a")
            elif not shrunk:
                break
        if n_edges == 0:
            return labels.select("v", "lbl")

        # ---- phase 2: pointer-halving min-label on the contracted graph
        both = (
            e.select(
                F.explode(
                    F.array(
                        F.struct(F.col("a").alias("s"), F.col("b").alias("d")),
                        F.struct(F.col("b").alias("s"), F.col("a").alias("d")),
                    )
                ).alias("e")
            )
            .select("e.s", "e.d")
            .cache()
        )
        cached.append(both)
        sub = _persist(both.select(F.col("s").alias("v")).distinct().withColumn("lbl", F.col("v")))
        for _ in range(rounds_left):
            msgs = (
                both.join(sub, both.s == sub.v)
                .groupBy(F.col("d").alias("v2"))
                .agg(F.min("lbl").alias("nbr_min"))
            )
            gathered = sub.join(msgs, sub.v == msgs.v2, "left").select(
                "v",
                F.col("lbl").alias("old_lbl"),
                F.least(F.col("lbl"), F.coalesce(F.col("nbr_min"), F.col("lbl"))).alias("lbl"),
            )
            hop = gathered.select(F.col("v").alias("hv"), F.col("lbl").alias("hlbl"))
            new_sub = _persist(
                gathered.join(hop, gathered.lbl == hop.hv, "left").select(
                    "v",
                    F.least(F.col("lbl"), F.coalesce(F.col("hlbl"), F.col("lbl"))).alias("lbl"),
                    (
                        F.least(F.col("lbl"), F.coalesce(F.col("hlbl"), F.col("lbl")))
                        < F.col("old_lbl")
                    ).alias("chg"),
                )
            )
            changed = new_sub.filter(F.col("chg")).count()
            sub = new_sub.select("v", "lbl")
            if changed == 0:
                break
        else:
            raise RuntimeError(f"connected_components: no convergence in {max_rounds} rounds")

        # map the overall labels through the contracted graph's labels
        m2 = sub.select(F.col("v").alias("mx"), F.col("lbl").alias("mr"))
        return labels.join(m2, labels.lbl == m2.mx, "left").select(
            "v", F.coalesce("mr", "lbl").alias("lbl")
        )
    finally:
        for df in cached:
            df.unpersist()
