"""Similarity search over the ``embeddings`` table (array<float>, 64-d).

Brute-force cosine top-K as the correctness baseline, an IVF-style
coarse-quantized variant as the scale path, plus threshold-count and
norm-statistics queries. Cosine is computed with higher-order functions
(zip_with + aggregate) — JVM-side, no Python in the loop. Embeddings are
cast float->double on both engines before any arithmetic; similarities
are rounded to 6dp before any ranking/threshold so the two engines can
never disagree on ordering.

Scale posture: brute-force is broadcast(Q) x scan(N) — linear in N and
embarrassingly parallel, correct for small Q. The IVF variant is the
100 TB path: assign vectors to coarse cells once (broadcast centroid
join), then probe only matching cells.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from ..sources.tables import table
from .registry import register


# Higher-order-function dot/cosine: fine for broadcast(Q) x N shapes
# (interpreted lambda cost is linear in N). NOT for O(n^2) pair loops —
# lambdas are CodegenFallback, and unrolling the sum into a 192-term
# expression is even slower (breaks codegen); the all-pairs kernel uses
# numpy block matmul instead (embedding_near_dup_pairs, PERF.md).
def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def _emb(spark, sf_dir) -> DataFrame:
    return table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("emb")
    )


def _emb_n(spark, sf_dir) -> DataFrame:
    """Embeddings with the vector norm precomputed once per row — pair
    similarity then needs ONE interpreted fold (the cross dot) instead
    of three. sim = dot(a,b)/(norm_a*norm_b) is the same float sequence
    as dot/(sqrt(da)*sqrt(db)), so oracle values are unchanged."""
    e = _emb(spark, sf_dir)
    return e.withColumn("norm", F.sqrt(dot(F.col("emb"), F.col("emb"))))


def _sim(qemb, qnorm, cemb, cnorm) -> Column:
    return F.round(dot(qemb, cemb) / (qnorm * cnorm), 6)


# DuckDB cosine on double-cast lists, rounded to 6dp.
def _cos_sql(a: str, b: str) -> str:
    return (
        f"round(list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
    )


_E_CTE = "e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings)"


@register(
    "cosine_knn_topk",
    oracle=f"""
WITH {_E_CTE},
j AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           {_cos_sql('q.emb', 'c.emb')} AS cos_sim
    FROM e q JOIN e c ON c.vec_id >= 3
    WHERE q.vec_id < 3
),
r AS (
    SELECT query_id, neighbor_id, cos_sim,
           CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS INTEGER) AS rank
    FROM j
)
SELECT query_id, neighbor_id, cos_sim, rank FROM r WHERE rank <= 5
""",
    tags=("similarity", "ann", "topk"),
)
def cosine_knn_topk(spark, sf_dir):
    """Brute-force cosine top-5 for 3 query vectors: broadcast the tiny
    query side against the full scan, rank per query. Ranking is on
    (rounded sim DESC, neighbor_id) — a total order, so the top-5 set is
    engine-independent. Scale: O(Q*N) with zero shuffle on the N side
    until the final per-query top-K (TakeOrdered per group). Norms are
    precomputed per row (one interpreted fold per pair, not three)."""
    e = _emb_n(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.col("norm").alias("qnorm"),
    )
    c = e.filter(F.col("vec_id") >= 3)
    j = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        _sim(F.col("qemb"), F.col("qnorm"), F.col("emb"), F.col("norm")).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


@register(
    "cosine_neighbor_counts",
    oracle=f"""
WITH {_E_CTE},
j AS (
    SELECT q.vec_id AS query_id,
           {_cos_sql('q.emb', 'c.emb')} AS cos_sim
    FROM e q JOIN e c ON q.vec_id <> c.vec_id
    WHERE q.vec_id < 10
)
SELECT query_id,
       CAST(sum(CASE WHEN cos_sim >= 0.25 THEN 1 ELSE 0 END) AS BIGINT) AS n_neighbors,
       round(max(cos_sim), 6) AS max_sim
FROM j GROUP BY query_id
""",
    tags=("similarity", "agg"),
)
def cosine_neighbor_counts(spark, sf_dir):
    """Similarity-threshold neighborhood counts for 10 query vectors —
    the radius-search primitive (count form is robust: no ranking ties
    to worry about, only the 6dp-rounded threshold comparison). Norms
    precomputed per row: one interpreted fold per pair, not three."""
    e = _emb_n(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.col("norm").alias("qnorm"),
    )
    j = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            _sim(F.col("qemb"), F.col("qnorm"), F.col("emb"), F.col("norm")).alias(
                "cos_sim"
            ),
        )
    )
    return j.groupBy("query_id").agg(
        F.sum(F.when(F.col("cos_sim") >= 0.25, 1).otherwise(0)).cast("bigint").alias("n_neighbors"),
        F.round(F.max("cos_sim"), 6).alias("max_sim"),
    )


@register(
    "ivf_cell_assignment",
    oracle=f"""
WITH {_E_CTE},
cent AS (SELECT vec_id AS centroid_id, emb AS cemb FROM e WHERE vec_id < 8),
assign AS (
    SELECT v.vec_id, c.centroid_id,
           {_cos_sql('v.emb', 'c.cemb')} AS cos_sim,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY {_cos_sql('v.emb', 'c.cemb')} DESC, c.centroid_id ASC) AS rn
    FROM e v CROSS JOIN cent c
)
SELECT centroid_id,
       count(*) AS n_vectors,
       round(avg(cos_sim), 4) AS avg_sim
FROM assign WHERE rn = 1
GROUP BY centroid_id
""",
    tags=("similarity", "ann", "ivf"),
)
def ivf_cell_assignment(spark, sf_dir):
    """IVF coarse quantization: assign every vector to its nearest of 8
    centroid vectors (broadcast), report cell occupancy. This is the
    build step of the scale-path ANN index — at query time only the
    nearest cells are probed, cutting brute-force cost by ~n_cells.
    Assignment is argmax-by-window with a deterministic tiebreak."""
    e = _emb_n(spark, sf_dir)
    cent = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("emb").alias("cemb"),
        F.col("norm").alias("cnorm"),
    )
    assign = e.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "centroid_id",
        _sim(F.col("emb"), F.col("norm"), F.col("cemb"), F.col("cnorm")).alias("cos_sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), F.asc("centroid_id"))
    return (
        assign.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("centroid_id")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("cos_sim"), 4).alias("avg_sim"),
        )
    )


@register(
    "embedding_norms_by_label",
    oracle="""
WITH e AS (SELECT label, embedding::DOUBLE[] AS emb FROM embeddings)
SELECT label,
       count(*) AS n_vectors,
       round(avg(sqrt(list_dot_product(emb, emb))), 4) AS avg_norm,
       round(min(sqrt(list_dot_product(emb, emb))), 4) AS min_norm,
       round(max(sqrt(list_dot_product(emb, emb))), 4) AS max_norm
FROM e GROUP BY label
""",
    tags=("similarity", "agg"),
)
def embedding_norms_by_label(spark, sf_dir):
    """Vector-norm statistics per label — the sanity/profiling query of
    an embedding pipeline (catches unnormalized or degenerate vectors).
    Norms are computed map-side by a higher-order expression; the only
    shuffle carries 10 label groups."""
    e = _emb(spark, sf_dir)
    norm = F.sqrt(dot(F.col("emb"), F.col("emb")))
    return (
        e.select("label", norm.alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("norm"), 4).alias("avg_norm"),
            F.round(F.min("norm"), 4).alias("min_norm"),
            F.round(F.max("norm"), 4).alias("max_norm"),
        )
    )


def _embedding_near_dup_pairs_oracle(sf_dir: str) -> str | None:
    ecte = _e_cte_capped(sf_dir)
    if ecte is None:
        return None
    return f"""
WITH {ecte},
pairs AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           {_cos_sql('a.emb', 'b.emb')} AS cos_sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cos_sim FROM pairs WHERE cos_sim >= 0.3
"""


@register(
    "embedding_near_dup_pairs",
    oracle=_embedding_near_dup_pairs_oracle,
    tags=("similarity", "dedup"),
)
def embedding_near_dup_pairs(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs — the vector-space member of
    the dedup family: all pairs above a similarity radius (exact).

    Implementation: block-grid self-join, fully distributed. Rows are
    assigned to B blocks (vec_id % B); a tiny broadcast grid enumerates
    the B*(B+1)/2 unordered block pairs; cogrouped applyInPandas runs a
    numpy block matmul per (bi, bj) group. Every unordered row pair
    lands in exactly one group (same-block pairs filtered by id order,
    cross-block pairs normalized to (min_id, max_id)), so the result is
    the exact all-pairs set with ZERO corpus-sized driver state — no
    collect(), no broadcast of the matrix. Expressions stay out of the
    kernel because Spark's higher-order aggregate is CodegenFallback
    (interpreted per pair): 86s at sf0.1 vs ~2s for BLAS.

    Scale: work is O(n^2) matmul — intrinsic to the EXACT operator —
    but it is spread over B*(B+1)/2 independent tasks whose input is
    n*(B+1)/B rows per side; B scales with cluster width, and each
    task's memory is (n/B)^2 sims, bounded by choosing B ~ n/block_rows.
    For sub-quadratic *approximate* dedup use the LSH / IVF family
    (hyperplane_lsh_buckets, ivf_topk_probe) as the candidate generator
    feeding this same kernel."""
    return _block_grid_pairs(spark, sf_dir, threshold=0.3)


def _embedding_near_dup_topk_oracle(sf_dir: str) -> str | None:
    ecte = _e_cte_capped(sf_dir)
    if ecte is None:
        return None
    return f"""
WITH {ecte},
pairs AS (
    SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
           {_cos_sql('a.emb', 'b.emb')} AS cos_sim
    FROM e a JOIN e b ON a.vec_id <> b.vec_id
),
ranked AS (
    SELECT vec_id, neighbor_id, cos_sim,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
    FROM pairs WHERE cos_sim >= 0.3
)
SELECT vec_id, neighbor_id, cos_sim, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= 3
"""


@register(
    "embedding_near_dup_topk",
    oracle=_embedding_near_dup_topk_oracle,
    tags=("similarity", "dedup", "topk"),
)
def embedding_near_dup_topk(spark, sf_dir):
    """Output-capped vector near-dup: each vector's top-3 neighbors
    above the family radius — the production rendering of the round-6
    sf1 finding that a fixed absolute threshold makes the PAIR SET
    quadratic in corpus size (`embedding_near_dup_pairs` output grew
    101x for 10x vectors, PERF.md round 6). A dedup/linking consumer
    rarely needs every pair — it needs each item's strongest matches;
    capping per-vector rank turns O(n^2) output into O(n * m) while
    keeping the decision threshold. Compute reuses the SAME cached
    block-grid matmul as the uncapped query (pairs expanded to both
    directions, per-vector window, rank <= 3); at 100 TB the candidate
    generator swaps to the LSH/IVF family and this cap is applied per
    bucket."""
    pairs = _block_grid_pairs(spark, sf_dir, threshold=0.3)
    both = pairs.select(
        F.col("vec_a").alias("vec_id"),
        F.col("vec_b").alias("neighbor_id"),
        "cos_sim",
    ).unionByName(
        pairs.select(
            F.col("vec_b").alias("vec_id"),
            F.col("vec_a").alias("neighbor_id"),
            "cos_sim",
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        both.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("vec_id", "neighbor_id", "cos_sim", "rank")
    )


_BASE_PAIR_THRESHOLD = 0.3

# Corpus cap for the intrinsically O(n^2) EXACT-pairwise family (r9
# verdict #7): above _PAIRWISE_CAP vectors, both engines restrict the
# pairwise corpus to the SAME deterministic subset (vec_id % M == 0,
# M = ceil(n / cap)) so the hash-verification contract survives scale
# instead of degrading to rows-only when the DuckDB oracle times out —
# and so the sf10 bench prices the operator at its evaluation size
# rather than stalling on a 100x matmul. This is the honest contract
# for an exact-quadratic EVALUATION operator: its production
# replacement is the LSH/IVF family, and its job at any scale is
# measuring them on a deterministic sample. Dial values and the no-op
# fixture guarantee live in plans/dials.py (r10 verdict #4).
from .dials import (  # noqa: E402 - after module constants by design
    _PAIRWISE_CAP,
    _SEMDEDUP_K,
    _lsh_bits,
    _pair_cap_mod,
    _semdedup_k,
)


def _e_cte_capped(sf_dir: str) -> str | None:
    """Oracle twin of the pairwise corpus cap: the ``e`` CTE with the
    same vec_id % M predicate the Spark block grid applies. None when
    the corpus is unreadable (rows-only fallback)."""
    n = _embeddings_total_count(sf_dir)
    if n is None:
        return None
    m = _pair_cap_mod(n)
    pred = f" WHERE vec_id % {m} = 0" if m > 1 else ""
    return (
        "e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb "
        f"FROM embeddings{pred})"
    )


def _block_grid_pairs(spark, sf_dir, threshold: float) -> DataFrame:
    """Exact all-pairs cosine >= threshold via the distributed block
    grid (see embedding_near_dup_pairs docstring); also feeds
    near_dup_clusters at its own threshold.

    The matmul kernel always materializes at the BASE threshold (0.3)
    and is cached; tighter thresholds are a filter on top. Every caller
    in one session then shares ONE O(n^2) matmul pass — Spark's cache
    manager matches the identical base plan (the same mechanism the
    dedup suite uses to share its shingle table)."""
    import numpy as np
    import pandas as pd

    if threshold < _BASE_PAIR_THRESHOLD:
        raise ValueError(f"threshold {threshold} below base {_BASE_PAIR_THRESHOLD}")

    n_blocks = 8
    cap_mod = _pair_cap_mod(
        _emb_total_n(spark, sf_dir)
    )  # % M corpus cap above _PAIRWISE_CAP vectors; M=1 at all fixtures

    # Each cogroup side gets its OWN scan + grid (fresh lineage) —
    # sharing one DataFrame across both sides of the cogroup trips
    # Spark's ambiguous-self-join detection.
    def _side(role: str) -> DataFrame:
        e = table(spark, sf_dir, "embeddings")
        if cap_mod > 1:
            e = e.filter(F.col("vec_id") % cap_mod == 0)
        e = e.select(
            "vec_id", "embedding", (F.col("vec_id") % n_blocks).cast("int").alias("blk")
        )
        grid = (
            spark.range(n_blocks).select(F.col("id").cast("int").alias("bi"))
            .crossJoin(spark.range(n_blocks).select(F.col("id").cast("int").alias("bj")))
            .filter(F.col("bi") <= F.col("bj"))
        )
        return (
            e.join(F.broadcast(grid), e.blk == grid[role])
            .select("bi", "bj", "vec_id", "embedding")
            # pin the cogroup exchange's width: the expanded rows are
            # small enough that AQE would coalesce the shuffle to one
            # partition and run all B*(B+1)/2 block matmuls serially
            # through a single Python worker (debounce rationale)
            .repartition(
                spark.sparkContext.defaultParallelism, "bi", "bj"
            )
        )

    left = _side("bi")
    right = _side("bj")

    def block_pair(key, lpdf, rpdf):
        empty = pd.DataFrame(
            {
                "vec_a": pd.Series(dtype="int64"),
                "vec_b": pd.Series(dtype="int64"),
                "cos_sim": pd.Series(dtype="float64"),
            }
        )
        if len(lpdf) == 0 or len(rpdf) == 0:
            return empty
        a = np.array(list(lpdf["embedding"]), dtype=np.float64)
        b = np.array(list(rpdf["embedding"]), dtype=np.float64)
        an = a / np.linalg.norm(a, axis=1, keepdims=True)
        bn = b / np.linalg.norm(b, axis=1, keepdims=True)
        aids = lpdf["vec_id"].to_numpy()
        bids = rpdf["vec_id"].to_numpy()
        sims = np.round(an @ bn.T, 6)
        ai, bj = np.nonzero(sims >= _BASE_PAIR_THRESHOLD)
        va, vb, s = aids[ai], bids[bj], sims[ai, bj]
        if key[0] == key[1]:
            # same block on both sides: each unordered pair appears twice
            # (plus the diagonal) — keep the id-ordered copy only
            keep = va < vb
            va, vb, s = va[keep], vb[keep], s[keep]
        else:
            # disjoint blocks: each unordered pair appears exactly once;
            # normalize orientation
            va, vb = np.minimum(va, vb), np.maximum(va, vb)
        return pd.DataFrame({"vec_a": va, "vec_b": vb, "cos_sim": s})

    base = (
        left.groupby("bi", "bj")
        .cogroup(right.groupby("bi", "bj"))
        .applyInPandas(block_pair, "vec_a bigint, vec_b bigint, cos_sim double")
        .cache()
    )
    if threshold == _BASE_PAIR_THRESHOLD:
        return base
    return base.filter(F.col("cos_sim") >= threshold)


@register(
    "ivf_topk_probe",
    oracle=f"""
WITH {_E_CTE},
cent AS (SELECT vec_id AS centroid_id, emb AS cemb FROM e WHERE vec_id < 8),
assign AS (
    SELECT v.vec_id, v.emb, c.centroid_id,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {_cos_sql('v.emb', 'c.cemb')} DESC,
                                       c.centroid_id ASC) AS rn
    FROM e v CROSS JOIN cent c
),
cells AS (SELECT vec_id, emb, centroid_id AS cell FROM assign WHERE rn = 1),
probe AS (
    SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
           {_cos_sql('q.emb', 'v.emb')} AS cos_sim
    FROM cells q JOIN cells v ON q.cell = v.cell AND q.vec_id <> v.vec_id
    WHERE q.vec_id < 5
),
ranked AS (
    SELECT query_id, neighbor_id, cos_sim,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id ASC) AS INTEGER) AS rank
    FROM probe
)
SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 3
""",
    tags=("similarity", "ann", "ivf", "topk"),
)
def ivf_topk_probe(spark, sf_dir):
    """IVF query path: assign every vector to its nearest of 8 coarse
    centroids, then answer top-3 for 5 query vectors by probing ONLY the
    query's own cell (nprobe=1). The candidate join is an equi-join on
    the cell id — work scales with cell occupancy, not corpus size;
    recall is traded via nprobe exactly as in a production IVF index."""
    e = _emb_n(spark, sf_dir)
    cent = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("emb").alias("cemb"),
        F.col("norm").alias("cnorm"),
    )
    # assignment runs on NARROW rows (no embedding through the window
    # shuffle — shipping the 64-double array through the exchange+sort
    # was the dominant cost); vectors are re-attached by a cheap id join
    assign = e.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "centroid_id",
        _sim(F.col("emb"), F.col("norm"), F.col("cemb"), F.col("cnorm")).alias("cos_sim"),
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), F.asc("centroid_id"))
    cell_of = (
        assign.withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("centroid_id").alias("cell"))
    )
    # cache: the cell assignment feeds BOTH sides of the probe join
    # localCheckpoint, not cache(): referenced by both the query and the
    # probe side of one plan, but a cache() entry would pin storage
    # until an unpersist a lazy plan-builder can never safely issue;
    # checkpoint blocks are ContextCleaner-freed with the plan.
    cells = e.join(cell_of, "vec_id").select(
        "vec_id", "emb", "norm", "cell"
    ).localCheckpoint(eager=False)  # lazy (r14): materialized by the
    # consuming action's first touch — one dedicated job fewer
    q = cells.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.col("norm").alias("qnorm"),
        "cell",
    )
    probe = (
        cells.join(q, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _sim(F.col("qemb"), F.col("qnorm"), F.col("emb"), F.col("norm")).alias("cos_sim"),
        )
    )
    w_rank = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        probe.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


# Shared md5-seeded hyperplane-LSH bucket construction (8 +-1
# hyperplanes -> 8 sign bits -> 256 buckets), identical family on both
# engines with no RNG. The dot is rounded before the sign test
# (registry convention) — an unrounded 64-term float sum near zero can
# land on opposite signs between Spark's and DuckDB's addition orders.
# Bucket width scales with the corpus via dials._lsh_bits (imported
# above): target ~80 rows per bucket, floor 8 bits.


# stat-keyed memo (r11): the full-registry sweep resolves the callable
# oracle map once per query (per-query pin re-resolution), and each of
# the ~20 callables re-read the same parquet footers every time — at
# sf10 that is thousands of redundant multi-file footer scans per leg.
# Key = (path, per-file size+mtime), so any rewrite invalidates.
_COUNT_MEMO: dict = {}


def _parquet_total_count(sf_dir: str, table_name: str) -> int | None:
    """Total row count of one fixture table from the parquet footer —
    used by CALLABLE oracles to derive the same adaptive parameters the
    Spark plan computes from its own count().

    Returns None when the parquet is missing/unreadable so a callable
    oracle can degrade that ONE query to the rows-only contract instead
    of raising through the whole oracle_sql() map (ADVICE r9, medium).
    """
    import os

    import duckdb

    path = f"{sf_dir}/{table_name}.parquet"
    try:
        files = (
            sorted(
                os.path.join(path, n)
                for n in os.listdir(path)
                if n.endswith(".parquet")
            )
            if os.path.isdir(path)
            else [path]
        )
        stat_key = tuple(
            (f, st.st_size, st.st_mtime_ns)
            for f in files
            for st in (os.stat(f),)
        )
        hit = _COUNT_MEMO.get(stat_key)
        if hit is not None:
            return hit
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        n = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{path}')"
        ).fetchone()[0]
        if len(_COUNT_MEMO) >= 64:
            _COUNT_MEMO.clear()
        _COUNT_MEMO[stat_key] = n
        return n
    except (OSError, duckdb.Error):
        return None


def _embeddings_total_count(sf_dir: str) -> int | None:
    return _parquet_total_count(sf_dir, "embeddings")


def _emb_total_n(spark, sf_dir) -> int:
    """Total embeddings rowcount from the parquet footer (the dials
    house count source — same number the callable oracles resolve),
    falling back to a Spark count only when the footer is unreadable.
    r13: several queries paid a full-scan Spark count() action here."""
    n = _embeddings_total_count(sf_dir)
    if n is None:
        n = table(spark, sf_dir, "embeddings").count()
    return n


def _emb_cand_n(spark, sf_dir) -> int:
    """Candidate (vec_id >= 3) rowcount, same footer-first contract as
    ``_emb_total_n`` — the count the Lloyd-PQ shortlist depth derives
    from, and exactly what the callable oracles use."""
    n = _embeddings_candidate_count(sf_dir)
    if n is None:
        n = _emb(spark, sf_dir).filter(F.col("vec_id") >= 3).count()
    return n


def _lsh_buckets_cte(bits: int = 8) -> str:
    return f"""
e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
pos AS (SELECT vec_id, i, emb[i + 1] AS x FROM e, range(64) t(i)),
signs AS (
    SELECT j, i,
           CASE WHEN ('0x' || substr(md5(CAST(j AS VARCHAR) || '_' || CAST(i AS VARCHAR)), 32, 1))::BIGINT % 2 = 1
                THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END AS s
    FROM range({bits}) tj(j), range(64) ti(i)
),
dots AS (
    SELECT p.vec_id, s.j, sum(p.x * s.s) AS dot
    FROM pos p JOIN signs s ON p.i = s.i
    GROUP BY p.vec_id, s.j
),
buckets AS (
    SELECT vec_id,
           CAST(sum(CASE WHEN round(dot, 6) > 0 THEN CAST(power(2, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
    FROM dots GROUP BY vec_id
)"""


_LSH_BUCKETS_CTE = _lsh_buckets_cte(8)


def _lsh_buckets(spark, sf_dir) -> DataFrame:
    """(vec_id, bucket) for every embedding — Spark twin of
    ``_LSH_BUCKETS_CTE``."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    pos = e.select("vec_id", F.posexplode("emb").alias("i", "x"))
    signs = (
        spark.range(8).select(F.col("id").alias("j"))
        .crossJoin(spark.range(64).select(F.col("id").alias("i")))
        .select(
            "j",
            "i",
            F.when(
                F.conv(
                    F.substring(F.md5(F.concat_ws("_", "j", "i")), 32, 1), 16, 10
                ).cast("bigint") % 2 == 1,
                F.lit(1.0),
            )
            .otherwise(F.lit(-1.0))
            .alias("s"),
        )
    )
    dots = (
        pos.join(F.broadcast(signs), "i")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("x") * F.col("s")).alias("dot"))
    )
    return dots.groupBy("vec_id").agg(
        F.sum(
            F.when(F.round(F.col("dot"), 6) > 0, F.pow(F.lit(2.0), F.col("j")).cast("bigint")).otherwise(0)
        )
        .cast("bigint")
        .alias("bucket")
    )


def _lsh_buckets_np(spark, sf_dir, bits: int = 8) -> DataFrame:
    """(vec_id, bucket) under the SAME single-table md5('j_i')-seeded
    family as ``_lsh_buckets``/``_lsh_buckets_cte`` but computed as ONE
    Arrow kernel (a bits x 64 sign matrix built in the worker, one
    matmul per batch) instead of the posexplode -> broadcast-join ->
    two-groupBy pipeline — the narrow-map rendering
    ``_banded_buckets_np`` already proved out. Bit = round(dot, 6) > 0;
    the 6dp round absorbs the matmul-vs-shuffle summation-order
    difference per the registry's engine-parity convention."""
    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def _kernel(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        w = np.empty((bits, 64), dtype=np.float64)
        for j in range(bits):
            for i in range(64):
                h = hashlib.md5(f"{j}_{i}".encode()).hexdigest()
                w[j, i] = 1.0 if int(h[31], 16) % 2 == 1 else -1.0
        pow2 = 2 ** np.arange(bits, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(list(pdf["embedding"]), dtype=np.float64)
            bm = np.round(x @ w.T, 6) > 0
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "bucket": bm.astype(np.int64) @ pow2,
                }
            )

    return e.mapInPandas(_kernel, "vec_id bigint, bucket bigint")


def _hyperplane_lsh_buckets_oracle(sf_dir: str) -> str | None:
    n = _embeddings_total_count(sf_dir)
    if n is None:  # unreadable corpus -> rows-only fallback
        return None
    return f"""
WITH {_lsh_buckets_cte(_lsh_bits(n))}
SELECT bucket, count(*) AS n_vectors
FROM buckets GROUP BY bucket
"""


@register(
    "hyperplane_lsh_buckets",
    oracle=_hyperplane_lsh_buckets_oracle,
    tags=("similarity", "ann", "lsh"),
)
def hyperplane_lsh_buckets(spark, sf_dir):
    """Random-hyperplane (SimHash-for-vectors) LSH: md5-seeded +-1
    hyperplanes -> sign bits -> 2^bits buckets; report occupancy. This
    is the embedding-space blocking structure: near-cosine vectors agree
    on most sign bits, so candidate pairs come from same/adjacent
    buckets instead of the O(n^2) loop. The hyperplanes are derived from
    md5 parity so both engines build the identical family with no RNG.

    Bits follow the SAME occupancy dial as ``lsh_near_dup_pairs``
    (``_lsh_bits``: 8 at every fixture <= 20,480 vectors, stepping up
    at scale), so this occupancy report always describes the dedup
    query's actual blocking structure (ADVICE r9 — previously pinned at
    8 while the pair query adapted)."""
    n = _emb_total_n(spark, sf_dir)
    return (
        _lsh_buckets_np(spark, sf_dir, _lsh_bits(n))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


def _lsh_near_dup_oracle(sf_dir: str) -> str | None:
    n = _embeddings_total_count(sf_dir)
    if n is None:  # unreadable corpus -> rows-only fallback
        return None
    bits = _lsh_bits(n)
    return f"""
WITH {_lsh_buckets_cte(bits)},
en AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM e),
cand AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 6) AS cos_sim
    FROM (SELECT en.*, bk.bucket FROM en JOIN buckets bk USING (vec_id)) a
    JOIN (SELECT en.*, bk.bucket FROM en JOIN buckets bk USING (vec_id)) b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cos_sim FROM cand WHERE cos_sim >= 0.3
"""


@register(
    "lsh_near_dup_pairs",
    oracle=_lsh_near_dup_oracle,
    tags=("similarity", "dedup", "ann", "lsh"),
)
def lsh_near_dup_pairs(spark, sf_dir):
    """Near-duplicate pairs via LSH candidate generation — the
    SUB-QUADRATIC scale path of the dedup family: candidates are only
    pairs landing in the SAME hyperplane bucket, then the exact cosine
    verifies each candidate. Compare ``embedding_near_dup_pairs``
    (exact, O(n^2) block grid): this trades recall (pairs split across
    buckets are missed — more tables/bits tune that) for bucket-keyed
    scalability; both share the verify threshold, so the result is a
    strict subset of the exact pairs.

    r8 verdict #4 (sf1 was ~12x for 10x data): two fixes. (1) The
    verify is now the bucket-grouped Arrow kernel the banded variant
    already uses — each task does one numpy matmul over ITS bucket's
    occupancy^2 sims instead of a per-candidate interpreted zip_with
    fold (CodegenFallback) through a bucket equi-join; measured sf1
    7.2 s -> ~1 s. (2) Bucket bits scale with corpus occupancy
    (``_lsh_bits``: max(8, ceil(log2(n/80))) — identical 8 bits and
    identical output at every committed fixture, so the recall
    datasheet is unchanged, while at 100 TB candidates grow
    ~n * occupancy instead of n^2/256; the sf10 fixture exercises the
    first step up). The kernel rounds dot/(norm_a*norm_b) exactly like
    the oracle (the semantic_dedup parity convention)."""
    n = _emb_total_n(spark, sf_dir)
    bits = _lsh_bits(n)
    bk = _lsh_buckets_np(spark, sf_dir, bits)
    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    side = bk.join(e, "vec_id")

    def _pair_kernel(key, pdf):
        import numpy as np
        import pandas as pd

        if len(pdf) < 2:
            return pd.DataFrame(
                {
                    "vec_a": pd.Series(dtype="int64"),
                    "vec_b": pd.Series(dtype="int64"),
                    "cos_sim": pd.Series(dtype="float64"),
                }
            )
        pdf = pdf.sort_values("vec_id")
        x = np.array(list(pdf["embedding"]), dtype=np.float64)
        ids = pdf["vec_id"].to_numpy()
        norms = np.sqrt(np.einsum("ij,ij->i", x, x))
        sims = np.round((x @ x.T) / np.outer(norms, norms), 6)
        ai, bj = np.nonzero(np.triu(sims >= 0.3, k=1))
        return pd.DataFrame(
            {"vec_a": ids[ai], "vec_b": ids[bj], "cos_sim": sims[ai, bj]}
        )

    return side.groupBy("bucket").applyInPandas(
        _pair_kernel, "vec_a bigint, vec_b bigint, cos_sim double"
    )


@register(
    "filtered_vector_search",
    oracle=f"""
WITH {_E_CTE},
cand AS (
    SELECT e.vec_id, e.emb
    FROM e JOIN documents d ON d.doc_id = e.vec_id
    WHERE d.lang = 'en'
),
j AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           {_cos_sql('q.emb', 'c.emb')} AS cos_sim
    FROM e q JOIN cand c ON c.vec_id <> q.vec_id
    WHERE q.vec_id < 3
),
r AS (
    SELECT query_id, neighbor_id, cos_sim,
           CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS INTEGER) AS rank
    FROM j
)
SELECT query_id, neighbor_id, cos_sim, rank FROM r WHERE rank <= 3
""",
    tags=("similarity", "ann", "join", "topk"),
)
def filtered_vector_search(spark, sf_dir):
    """Filtered (hybrid) vector search: top-3 by cosine among only the
    candidates passing a relational predicate (documents.lang = 'en',
    joined on doc_id = vec_id). This is the retrieval shape real
    pipelines need — predicate + ANN together — and the reason a
    DataFrame-native vector path beats a bolt-on index: the filter is
    just another join/pushdown, applied BEFORE any distance math.

    Perf: norms are precomputed once per row (``_emb_n``), so each pair
    pays ONE interpreted fold (the cross dot) instead of three — same
    float sequence as cosine(), 3x less CodegenFallback work (the r4
    regression 0.99->1.82s was this query paying three folds per pair)."""
    e = _emb_n(spark, sf_dir)
    en_docs = table(spark, sf_dir, "documents").filter(F.col("lang") == "en").select("doc_id")
    cand = e.join(en_docs, e.vec_id == en_docs.doc_id).select("vec_id", "emb", "norm")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.col("norm").alias("qnorm"),
    )
    j = (
        cand.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _sim(F.col("qemb"), F.col("qnorm"), F.col("emb"), F.col("norm")).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _lsh_recall_oracle(sf_dir: str) -> str | None:
    n = _embeddings_total_count(sf_dir)
    if n is None:  # unreadable corpus -> rows-only fallback
        return None
    m = _pair_cap_mod(n)
    pred = f" WHERE vec_id % {m} = 0" if m > 1 else ""
    # the pairwise corpus cap applies to BOTH arms (bucket values are
    # per-vector and corpus-independent, so capping is join-consistent)
    buckets_cte = _lsh_buckets_cte(8).replace(
        "FROM embeddings)", f"FROM embeddings{pred})"
    )
    return f"""
WITH {buckets_cte},
en AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM e),
exact AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 6) AS cos_sim
    FROM en a JOIN en b ON a.vec_id < b.vec_id
),
ex AS (SELECT * FROM exact WHERE cos_sim >= 0.3),
lsh AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM (SELECT en.vec_id, bk.bucket FROM en JOIN buckets bk USING (vec_id)) a
    JOIN (SELECT en.vec_id, bk.bucket FROM en JOIN buckets bk USING (vec_id)) b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
),
j AS (
    SELECT CASE WHEN ex.cos_sim >= 0.7 THEN 'high'
                WHEN ex.cos_sim >= 0.5 THEN 'mid'
                ELSE 'low' END AS sim_band,
           (lsh.vec_a IS NOT NULL) AS hit
    FROM ex LEFT JOIN lsh ON ex.vec_a = lsh.vec_a AND ex.vec_b = lsh.vec_b
)
SELECT sim_band,
       CAST(count(*) AS BIGINT) AS n_exact,
       CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_lsh,
       round(sum(CASE WHEN hit THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 4) AS recall
FROM j GROUP BY sim_band
"""


@register(
    "lsh_recall_eval",
    oracle=_lsh_recall_oracle,
    tags=("similarity", "ann", "lsh", "evaluation"),
)
def lsh_recall_eval(spark, sf_dir):
    """SELF-EVALUATING ANN: recall of the hyperplane-LSH candidate
    generator against the exact all-pairs ground truth, broken down by
    similarity band. This is the 'measure, don't guess' harness a team
    runs before trusting approximate dedup at 100 TB — high-sim pairs
    agree on more sign bits, so recall should rise with the band, and
    this query proves (or disproves) it from the data. Measured at
    sf0.01: one 8-bit table recalls ~2% of 0.3-0.5-band pairs — almost
    exactly the (1 - theta/pi)^8 collision probability — which is the
    quantified argument for banding (more tables x fewer bits, the
    trade ``minhash_lsh_pairs`` makes with 4x4). Plan: the exact side
    is the distributed block-grid kernel, the LSH side the bucket-keyed
    candidate join; the comparison joins two pair sets on their
    composite key — every stage keyed, nothing driver-side. Above
    ``_PAIRWISE_CAP`` vectors both arms (and the oracle) restrict to
    the deterministic vec_id % M sample — the exact arm is the
    intrinsically quadratic part, and an eval's job at scale is a
    sample-based measurement (r9 verdict #7)."""
    cap_mod = _pair_cap_mod(_emb_total_n(spark, sf_dir))
    exact = _block_grid_pairs(spark, sf_dir, threshold=0.3).select(
        "vec_a", "vec_b", "cos_sim"
    )
    b = _lsh_buckets(spark, sf_dir)
    if cap_mod > 1:
        b = b.filter(F.col("vec_id") % cap_mod == 0)
    left = b.select(F.col("vec_id").alias("vec_a"), "bucket")
    right = b.select(F.col("vec_id").alias("vec_b"), "bucket")
    lsh = (
        left.join(right, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", F.lit(True).alias("hit"))
    )
    j = exact.join(lsh, ["vec_a", "vec_b"], "left").select(
        F.when(F.col("cos_sim") >= 0.7, "high")
        .when(F.col("cos_sim") >= 0.5, "mid")
        .otherwise("low")
        .alias("sim_band"),
        F.coalesce(F.col("hit"), F.lit(False)).alias("hit"),
    )
    return j.groupBy("sim_band").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact"),
        F.sum(F.when(F.col("hit"), 1).otherwise(0)).cast("bigint").alias("n_lsh"),
        F.round(
            F.sum(F.when(F.col("hit"), 1).otherwise(0))
            / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("recall"),
    )


# Banded hyperplane LSH: T tables x B bits. Fewer bits per table =
# higher per-table collision probability; independent tables OR their
# candidate sets. Seeds are md5(t_j_i) parity — same family on both
# engines, no RNG.
_N_TABLES, _N_BITS = 4, 4

def _banded_e_pred(sf_dir: str) -> str | None:
    """Corpus-cap predicate for the BANDED LSH family, the same
    deterministic ``vec_id % M`` sample the exact-pairwise family uses
    (r9 verdict #7). The banded pair set is collision-bounded in WORK,
    but its OUTPUT at a fixed threshold grows ~quadratically on the
    replicated fixtures (cross-replica pairs at cos >= 0.3 — the
    measured r7 output-geometry finding), so at sf10 the verified pair
    list alone is ~66M rows: the DuckDB oracle can't hash it inside any
    budget and the compare harness can't collect it. Above
    ``_PAIRWISE_CAP`` vectors both engines restrict to the same sample;
    INACTIVE at every committed fixture (sf0.001..sf1 <= 20,480
    vectors -> empty predicate, plans and hashes unchanged). None =
    unreadable corpus (rows-only fallback)."""
    n = _embeddings_total_count(sf_dir)
    if n is None:
        return None
    m = _pair_cap_mod(n)
    return f" WHERE vec_id % {m} = 0" if m > 1 else ""


def _banded_buckets_cte(e_pred: str = "") -> str:
    """The banded-bucket oracle CTE with the corpus-cap predicate slot
    (empty at all committed fixtures; ``vec_id % M`` above the cap)."""
    return f"""
e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings{e_pred}),
-- sign VECTORS per (table, bit), not exploded sign scalars: the old
-- pos x bsigns join+group built vectors x tables x bits x 64 rows
-- (51M at sf1, the whole oracle's budget); one native
-- list_dot_product per (vector, table, bit) is vectors x 16 rows.
-- Same sums to float-order; the 6dp round below absorbs that exactly
-- as everywhere else in the registry.
bsigns AS (
    SELECT t, j,
           list_transform(range(64), i ->
               CASE WHEN ('0x' || substr(md5(CAST(t AS VARCHAR) || '_' || CAST(j AS VARCHAR) || '_' || CAST(i AS VARCHAR)), 32, 1))::BIGINT % 2 = 1
                    THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END) AS sv
    FROM range({_N_TABLES}) tt(t), range({_N_BITS}) tj(j)
),
bdots AS (
    SELECT e.vec_id, s.t, s.j, list_dot_product(e.emb, s.sv) AS dot
    FROM e, bsigns s
),
bbuckets AS (
    SELECT vec_id, t,
           CAST(sum(CASE WHEN round(dot, 6) > 0 THEN CAST(power(2, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
    FROM bdots GROUP BY vec_id, t
)"""


_BANDED_BUCKETS_CTE = _banded_buckets_cte()


def _lsh_banded_pairs_oracle(sf_dir: str) -> str | None:
    """Callable oracle: the banded pair SQL with the corpus-cap ``e``
    predicate resolved for THIS corpus (identical to the static text at
    every committed fixture)."""
    pred = _banded_e_pred(sf_dir)
    if pred is None:
        return None
    return f"""
WITH {_banded_buckets_cte(pred)},
-- bb/en MATERIALIZED: bbuckets is referenced twice (both candidate
-- sides) and plain CTEs re-inline PER REFERENCE — without this the
-- whole bdots pipeline runs twice and the sf1 leg blows the sweep's
-- 300 s oracle budget (r8: 306 s -> fits)
bb AS MATERIALIZED (SELECT vec_id, t, bucket FROM bbuckets),
-- verify on PRE-NORMALIZED fixed-size DOUBLE[64] arrays: the sf1 leg
-- carries ~46M candidate pairs, and one SIMD array_inner_product per
-- pair is ~40x cheaper than an interpreted list dot + two norm
-- multiplies (r8: verify 220 s -> ~6 s; the whole oracle now fits the
-- sweep budget with room). Same cosine to float-rounding; 6dp round
-- absorbs it per the registry convention.
en AS MATERIALIZED (
    SELECT vec_id,
           list_transform(emb, x -> x / sqrt(list_dot_product(emb, emb)))::DOUBLE[64] AS emb_n
    FROM e
),
cand AS (
    SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM bb a
    JOIN bb b
      ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id
),
v AS (
    SELECT c.vec_a, c.vec_b,
           round(array_inner_product(x.emb_n, y.emb_n), 6) AS cos_sim
    FROM cand c JOIN en x ON c.vec_a = x.vec_id JOIN en y ON c.vec_b = y.vec_id
)
SELECT vec_a, vec_b, cos_sim FROM v WHERE cos_sim >= 0.3
"""


@register(
    "lsh_banded_pairs",
    oracle=_lsh_banded_pairs_oracle,
    tags=("similarity", "dedup", "ann", "lsh", "banded"),
)
def lsh_banded_pairs(spark, sf_dir):
    """BANDED hyperplane LSH near-dup pairs — the recall fix
    ``lsh_recall_eval`` motivates: 4 independent tables of 4 sign bits
    each (vs one 8-bit table). Per-table collision for a 0.3-sim pair
    is ~0.6^4 = 0.13, OR-ed over 4 tables = ~0.43 expected recall at a
    fraction of brute force's candidate volume (measured at sf0.01:
    427/990 exact pairs = 43%, vs 19/990 for the single 8-bit table —
    the theory holds to two decimal places). Candidate pairs are
    same-(table, bucket) collisions verified by the exact cosine —
    here fused into one per-bucket Arrow kernel; work is proportional
    to bucket occupancy summed over tables, never corpus^2. The dedup
    suite's recall/cost dial: tables x bits tunes it; both engines
    build the identical md5-seeded family. Above ``_PAIRWISE_CAP``
    vectors both engines restrict to the deterministic vec_id % M
    sample (``_banded_e_pred``): the pair OUTPUT at a fixed threshold
    grows ~quadratically on the replicated fixtures, and a pair list
    nobody can hash-verify is not a contract."""
    return _banded_pairs_base(spark, sf_dir)


def _banded_buckets_np(spark, sf_dir, cap_mod: int | None = None) -> DataFrame:
    """(vec_id, t, bucket) for every embedding under the banded
    md5-seeded hyperplane family — numerically the same construction as
    ``_BANDED_BUCKETS_CTE`` (sign = md5 parity, bit = round(dot, 6) > 0)
    but computed as ONE Arrow kernel: a (T*B) x 64 sign matrix built
    deterministically inside the worker, one matmul per batch. Replaces
    a posexplode -> broadcast-join -> two-groupBy pipeline (3 shuffles,
    T*B*64 intermediate rows per vector) with a narrow map — the 6dp
    round absorbs the summation-order difference exactly as the
    registry's engine-parity convention prescribes."""

    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    if cap_mod is None:  # standalone call; _banded_pairs_base passes
        cap_mod = _pair_cap_mod(_emb_total_n(spark, sf_dir))  # (ADVICE r10: one
    if cap_mod > 1:  # count action per invocation, not two)
        e = e.filter(F.col("vec_id") % cap_mod == 0)

    def _bucket_kernel(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        w = np.empty((_N_TABLES * _N_BITS, 64), dtype=np.float64)
        for t in range(_N_TABLES):
            for j in range(_N_BITS):
                for i in range(64):
                    h = hashlib.md5(f"{t}_{j}_{i}".encode()).hexdigest()
                    w[t * _N_BITS + j, i] = 1.0 if int(h[31], 16) % 2 == 1 else -1.0
        pow2 = 2 ** np.arange(_N_BITS, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(list(pdf["embedding"]), dtype=np.float64)
            bits = np.round(x @ w.T, 6) > 0  # n x (T*B)
            ids = pdf["vec_id"].to_numpy()
            out = []
            for t in range(_N_TABLES):
                bucket = bits[:, t * _N_BITS : (t + 1) * _N_BITS].astype(np.int64) @ pow2
                out.append(
                    pd.DataFrame({"vec_id": ids, "t": np.int32(t), "bucket": bucket})
                )
            yield pd.concat(out, ignore_index=True)

    return e.mapInPandas(_bucket_kernel, "vec_id bigint, t int, bucket bigint")


_BANDED_BASE_THRESHOLD = 0.3


def _banded_pairs_base(spark, sf_dir) -> DataFrame:
    """Verified banded-LSH pair set at the base threshold (0.3), cached
    for the session: ``near_dup_clusters`` (0.4) and any tighter caller
    filter on top, so one bucket-grouped pass serves the whole family.

    Plan: bucket assignment (narrow Arrow kernel) -> join embeddings on
    vec_id -> group by (t, bucket) -> per-group numpy all-pairs cosine
    -> distinct. The (t, bucket) grouping IS the LSH-keyed shuffle: each
    task does occupancy^2 work on its own bucket, so total work tracks
    true collisions, not corpus^2. The same unordered pair colliding in
    several tables yields bit-identical (vec_a, vec_b, cos_sim) rows
    (same vectors, same float ops), so DISTINCT collapses them. Skew =
    a hot bucket; B bits is the dial (more bits -> smaller buckets)."""
    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cap_mod = _pair_cap_mod(_emb_total_n(spark, sf_dir))  # computed ONCE, passed
    bk = _banded_buckets_np(spark, sf_dir, cap_mod)  # down (ADVICE r10)
    if cap_mod > 1:  # mirror the bucket kernel's corpus cap (no-op at
        e = e.filter(F.col("vec_id") % cap_mod == 0)  # committed fixtures)
    side = bk.join(e, "vec_id")

    def _pair_kernel(key, pdf):
        import numpy as np
        import pandas as pd

        if len(pdf) < 2:
            return pd.DataFrame(
                {
                    "vec_a": pd.Series(dtype="int64"),
                    "vec_b": pd.Series(dtype="int64"),
                    "cos_sim": pd.Series(dtype="float64"),
                }
            )
        pdf = pdf.sort_values("vec_id")
        x = np.array(list(pdf["embedding"]), dtype=np.float64)
        ids = pdf["vec_id"].to_numpy()
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        sims = np.round(xn @ xn.T, 6)
        ai, bj = np.nonzero(np.triu(sims >= _BANDED_BASE_THRESHOLD, k=1))
        return pd.DataFrame(
            {"vec_a": ids[ai], "vec_b": ids[bj], "cos_sim": sims[ai, bj]}
        )

    # NOTE on exchange width: unlike debounce/grouped-OLS, this input is
    # tiny by construction (|vectors| x T narrow rows) and each bucket's
    # matmul is trivial, so AQE's coalesce-to-one costs less than 32-way
    # task overhead (measured 1.75s coalesced vs 2.36s pinned at sf0.1)
    # — no width pin here. At a corpus where the buckets carry real
    # work, the shuffle is big enough that AQE stops coalescing it.
    return (
        side.groupBy("t", "bucket")
        .applyInPandas(_pair_kernel, "vec_a bigint, vec_b bigint, cos_sim double")
        .distinct()
        .cache()
    )


@register(
    "label_centroids",
    oracle="""
WITH e AS (SELECT label, embedding::DOUBLE[] AS emb FROM embeddings),
pos AS (SELECT label, i, emb[i + 1] AS x FROM e, range(64) t(i))
SELECT label, CAST(i AS INT) AS dim, round(avg(x), 6) AS centroid_val
FROM pos
WHERE i < 4
GROUP BY label, i
""",
    tags=("similarity", "centroid", "agg"),
)
def label_centroids(spark, sf_dir):
    """Per-label centroid vectors (emitted long-format, first 4 dims for
    the oracle diff) — the k-means/IVF training step and the class-
    prototype primitive, in pure SQL: posexplode the vector, partial-avg
    per (label, dim). The shuffle carries labels x 64 partial sums, not
    vectors; at 100 TB this is exactly how you (re)train IVF coarse
    centroids in one pass. The full-width variant drops the dim filter
    and pivots back with array_agg ordered by dim."""
    e = table(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("emb")
    )
    pos = e.select("label", F.posexplode("emb").alias("i", "x"))
    return (
        pos.filter(F.col("i") < 4)
        .groupBy("label", F.col("i").cast("int").alias("dim"))
        .agg(F.round(F.avg("x"), 6).alias("centroid_val"))
    )


@register(
    "sq8_knn_rerank",
    oracle=f"""
WITH {_E_CTE},
s AS (
    SELECT 127.0 / max(list_max(list_transform(emb, x -> abs(x)))) AS scale FROM e
),
z AS (
    SELECT vec_id,
           list_transform(emb, x -> CAST(floor(x * scale + 0.5) AS BIGINT)) AS qemb
    FROM e, s
),
cand AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           CAST(list_dot_product(q.qemb, c.qemb) AS BIGINT) AS qdot
    FROM z q JOIN z c ON c.vec_id >= 3
    WHERE q.vec_id < 3
),
shortlist AS (
    SELECT query_id, neighbor_id, qdot,
           row_number() OVER (PARTITION BY query_id ORDER BY qdot DESC, neighbor_id ASC) AS arank
    FROM cand
),
rerank AS (
    SELECT sl.query_id, sl.neighbor_id, sl.qdot,
           {_cos_sql('qe.emb', 'ce.emb')} AS cos_sim
    FROM shortlist sl
    JOIN e qe ON qe.vec_id = sl.query_id
    JOIN e ce ON ce.vec_id = sl.neighbor_id
    WHERE sl.arank <= 20
)
SELECT query_id, neighbor_id, qdot, cos_sim,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS INTEGER) AS rank
FROM rerank
QUALIFY rank <= 5
""",
    tags=("similarity", "ann", "quantization", "topk"),
)
def sq8_knn_rerank(spark, sf_dir):
    """Scalar-quantized (int8-style) ANN with exact rerank — the
    memory-bound 100 TB search path. One corpus pass derives the global
    symmetric scale (127/max|x|, a broadcast scalar); every vector is
    quantized to 64 small ints (4x smaller than float32, 8x smaller than
    the double compute form); candidate generation ranks by the INTEGER
    quantized dot product (exact integer math — bit-identical on any
    engine, no float-ordering hazard); only the top-20 shortlist per
    query is then reranked with exact float cosine, and top-5 returned.
    At scale the float vectors are fetched for |shortlist| rows only —
    the scan that matters touches just the quantized corpus. Quantize
    uses floor(x*scale+0.5), not round(), so Spark/DuckDB can never
    disagree on ties (see memory: round-half divergence)."""
    e = _emb(spark, sf_dir)
    mx = e.select(
        (F.lit(127.0) / F.max(F.array_max(F.transform("emb", F.abs)))).alias("scale")
    )
    z = e.crossJoin(F.broadcast(mx)).select(
        "vec_id",
        F.transform("emb", lambda x: F.floor(x * F.col("scale") + F.lit(0.5))).alias("qemb"),
    )
    q = z.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("qemb").alias("q_qemb")
    )
    c = z.filter(F.col("vec_id") >= 3)
    idot = F.aggregate(
        F.zip_with(F.col("q_qemb"), F.col("qemb"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    cand = c.crossJoin(F.broadcast(q)).select(
        "query_id", F.col("vec_id").alias("neighbor_id"), idot.cast("long").alias("qdot")
    )
    aw = Window.partitionBy("query_id").orderBy(F.desc("qdot"), F.asc("neighbor_id"))
    shortlist = (
        cand.withColumn("arank", F.row_number().over(aw)).filter(F.col("arank") <= 20)
    )
    # Rerank: float vectors fetched ONLY for shortlist rows — broadcast
    # the tiny shortlist into the corpus scan, then attach query floats.
    qe = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_fl")
    )
    rr = (
        e.join(F.broadcast(shortlist), e.vec_id == shortlist.neighbor_id)
        .join(F.broadcast(qe), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            "qdot",
            F.round(cosine(F.col("q_fl"), F.col("emb")), 6).alias("cos_sim"),
        )
    )
    rw = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        rr.withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "qdot", "cos_sim", "rank")
    )


@register(
    "ivf_recall_eval",
    oracle=f"""
WITH {_E_CTE},
cent AS (SELECT vec_id AS centroid_id, emb AS cemb FROM e WHERE vec_id < 8),
assign AS (
    SELECT v.vec_id, v.emb, c.centroid_id,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {_cos_sql('v.emb', 'c.cemb')} DESC,
                                       c.centroid_id ASC) AS rn
    FROM e v CROSS JOIN cent c
),
cells AS (SELECT vec_id, emb, centroid_id AS cell FROM assign WHERE rn = 1),
q AS (SELECT vec_id AS query_id, emb AS qemb FROM e WHERE vec_id >= 8 AND vec_id < 13),
truth AS (
    SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, v.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY {_cos_sql('q.qemb', 'v.emb')} DESC,
                                           v.vec_id ASC) AS rnk
        FROM q CROSS JOIN e v WHERE v.vec_id <> q.query_id
    ) WHERE rnk <= 5
),
qcell AS (
    SELECT q.query_id, q.qemb, c.centroid_id AS cell,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {_cos_sql('q.qemb', 'c.cemb')} DESC,
                                       c.centroid_id ASC) AS cell_rank
    FROM q CROSS JOIN cent c
),
probes AS (SELECT unnest([1, 2, 4]) AS nprobe),
retrieved AS (
    SELECT nprobe, query_id, neighbor_id FROM (
        SELECT p.nprobe, qc.query_id, v.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY p.nprobe, qc.query_id
                                  ORDER BY {_cos_sql('qc.qemb', 'v.emb')} DESC,
                                           v.vec_id ASC) AS rnk
        FROM probes p
        JOIN qcell qc ON qc.cell_rank <= p.nprobe
        JOIN cells v ON v.cell = qc.cell AND v.vec_id <> qc.query_id
    ) WHERE rnk <= 5
),
scored AS (
    SELECT p.nprobe, t.query_id, t.neighbor_id,
           CASE WHEN r.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS hit
    FROM probes p
    CROSS JOIN truth t
    LEFT JOIN retrieved r
      ON r.nprobe = p.nprobe AND r.query_id = t.query_id
     AND r.neighbor_id = t.neighbor_id
)
SELECT CAST(nprobe AS INTEGER) AS nprobe,
       CAST(count(*) AS BIGINT) AS n_true,
       CAST(sum(hit) AS BIGINT) AS n_hit,
       round(sum(hit) / CAST(count(*) AS DOUBLE), 4) AS recall
FROM scored GROUP BY nprobe
""",
    tags=("similarity", "ann", "ivf", "evaluation"),
)
def ivf_recall_eval(spark, sf_dir):
    """SELF-EVALUATING IVF: recall@5 of the coarse-quantized probe path
    against the exact brute-force top-5 ground truth, swept over
    nprobe in {1, 2, 4} — the recall contract ``lsh_recall_eval`` gives
    the hyperplane family, now for the cell-probing family
    (``ivf_topk_probe`` runs nprobe=1; this query quantifies exactly
    what that choice costs and what each extra probed cell buys).

    Plan: assignment and query-cell ranking are the same broadcast
    centroid cross joins as ivf_topk_probe (8 centroids — the broadcast
    side is constant-size at any corpus scale); the probe join is keyed
    on the cell id so candidate work scales with probed-cell occupancy,
    never corpus^2; ground truth is broadcast(5 queries) x corpus scan,
    linear in N. Every ranking is rounded to 6dp with deterministic
    tiebreaks, so both engines retrieve the identical sets and the
    recall numbers are bit-comparable."""
    e = _emb_n(spark, sf_dir)
    cent = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("emb").alias("cemb"),
        F.col("norm").alias("cnorm"),
    )
    # cell assignment on narrow rows (ivf_topk_probe rationale: no
    # 64-double array through the window exchange), vectors re-attached
    # by id join
    assign = e.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "centroid_id",
        _sim(F.col("emb"), F.col("norm"), F.col("cemb"), F.col("cnorm")).alias("cos_sim"),
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), F.asc("centroid_id"))
    cell_of = (
        assign.withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("centroid_id").alias("cell"))
    )
    # localCheckpoint, not cache(): referenced by both the query and the
    # probe side of one plan, but a cache() entry would pin storage
    # until an unpersist a lazy plan-builder can never safely issue;
    # checkpoint blocks are ContextCleaner-freed with the plan.
    cells = e.join(cell_of, "vec_id").select(
        "vec_id", "emb", "norm", "cell"
    ).localCheckpoint(eager=False)  # lazy (r14): materialized by the
    # consuming action's first touch — one dedicated job fewer
    # queries DISJOINT from the centroid set (r7 verdict #4): with
    # queries ⊂ centroids, a query IS its own cell's center, its true
    # neighbors align with its own cell on ANY geometry, and the
    # recall dial cannot fail — the r7 saturation was this, not just
    # corpus clustering
    q = e.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 13)).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.col("norm").alias("qnorm"),
    )
    # exact ground truth: broadcast(5 queries) x corpus scan, top-5/query
    tw = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    truth = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _sim(F.col("qemb"), F.col("qnorm"), F.col("emb"), F.col("norm")).alias("cos_sim"),
        )
        .withColumn("rnk", F.row_number().over(tw))
        .filter(F.col("rnk") <= 5)
        .select("query_id", "neighbor_id")
    )
    # rank every cell per query; nprobe sweep takes the top-n cells
    cw = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("centroid_id"))
    qcell = (
        q.crossJoin(F.broadcast(cent))
        .select(
            "query_id",
            "qemb",
            "qnorm",
            "centroid_id",
            _sim(F.col("qemb"), F.col("qnorm"), F.col("cemb"), F.col("cnorm")).alias("cos_sim"),
        )
        .withColumn("cell_rank", F.row_number().over(cw))
        .select("query_id", "qemb", "qnorm", F.col("centroid_id").alias("cell"), "cell_rank")
    )
    probes = spark.range(1).select(
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(4))).alias("nprobe")
    )
    probe_cells = qcell.crossJoin(F.broadcast(probes)).filter(
        F.col("cell_rank") <= F.col("nprobe")
    )
    rw = Window.partitionBy("nprobe", "query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    retrieved = (
        cells.join(probe_cells, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "nprobe",
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _sim(F.col("qemb"), F.col("qnorm"), F.col("emb"), F.col("norm")).alias("cos_sim"),
        )
        .withColumn("rnk", F.row_number().over(rw))
        .filter(F.col("rnk") <= 5)
        .select("nprobe", "query_id", "neighbor_id", F.lit(1).alias("hit"))
    )
    scored = (
        truth.crossJoin(F.broadcast(probes))
        .join(retrieved, ["nprobe", "query_id", "neighbor_id"], "left")
        .select("nprobe", F.coalesce(F.col("hit"), F.lit(0)).alias("hit"))
    )
    return scored.groupBy(F.col("nprobe").cast("int").alias("nprobe")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true"),
        F.sum("hit").cast("bigint").alias("n_hit"),
        F.round(F.sum("hit") / F.count(F.lit(1)).cast("double"), 4).alias("recall"),
    )


@register(
    "embedding_dimension_profile",
    oracle=f"""
WITH {_E_CTE},
pos AS (SELECT vec_id, i, emb[i + 1] AS x FROM e, range(64) t(i))
SELECT CAST(i AS INTEGER) AS dim,
       CAST(count(*) AS BIGINT) AS n,
       round(avg(x), 4) AS avg_val,
       round(min(x), 4) AS min_val,
       round(max(x), 4) AS max_val,
       round(sqrt(avg(x * x)), 4) AS rms,
       round(sum(CASE WHEN x = 0 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 4)
           AS frac_zero
FROM pos GROUP BY i
""",
    tags=("similarity", "profile", "agg"),
)
def embedding_dimension_profile(spark, sf_dir):
    """Per-DIMENSION health profile of the embedding column: mean, range,
    RMS energy, and dead-unit fraction for each of the 64 coordinates —
    the sanity sweep an embedding pipeline runs to catch collapsed or
    exploding dimensions before they poison similarity search
    (a dim with rms ~0 is dead; one with rms >> others dominates every
    cosine). posexplode is a narrow map; the single shuffle carries 64
    groups with partial aggregation, so the profile costs one pass at
    any corpus size. Aggregates are rounded to 4dp (house float-sum
    convention; the integer counts are exact)."""
    e = _emb(spark, sf_dir)
    pos = e.select(F.posexplode("emb").alias("dim", "x"))
    return pos.groupBy(F.col("dim").cast("int").alias("dim")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.avg("x"), 4).alias("avg_val"),
        F.round(F.min("x"), 4).alias("min_val"),
        F.round(F.max("x"), 4).alias("max_val"),
        F.round(F.sqrt(F.avg(F.col("x") * F.col("x"))), 4).alias("rms"),
        F.round(
            F.sum(F.when(F.col("x") == 0, 1).otherwise(0))
            / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("frac_zero"),
    )


@register(
    "ivf_build_probe",
    oracle=f"""
WITH {_E_CTE},
pos AS (SELECT label, vec_id, i, emb[i + 1] AS x FROM e, range(64) t(i)),
centd AS (SELECT label, i, round(avg(x), 6) AS c FROM pos GROUP BY label, i),
cent AS (
    SELECT label AS centroid_label, array_agg(c ORDER BY i) AS cemb
    FROM centd GROUP BY label
),
assign AS (
    SELECT v.vec_id, v.emb, c.centroid_label,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {_cos_sql('v.emb', 'c.cemb')} DESC,
                                       c.centroid_label ASC) AS rn
    FROM e v CROSS JOIN cent c
),
cells AS (SELECT vec_id, emb, centroid_label AS cell FROM assign WHERE rn = 1),
probe AS (
    SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
           {_cos_sql('q.emb', 'v.emb')} AS cos_sim
    FROM cells q JOIN cells v ON q.cell = v.cell AND q.vec_id <> v.vec_id
    WHERE q.vec_id < 5
),
ranked AS (
    SELECT query_id, neighbor_id, cos_sim,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id ASC) AS INTEGER) AS rank
    FROM probe
)
SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 3
""",
    tags=("similarity", "ann", "ivf", "build", "topk"),
)
def ivf_build_probe(spark, sf_dir):
    """The FULL IVF LIFECYCLE as one lazy plan (r6 verdict #5): TRAIN
    coarse centroids (per-label mean vectors — the ``label_centroids``
    build step at full 64-dim width), ASSIGN every vector to its
    nearest trained centroid, PROBE top-3 neighbors for 5 query vectors
    inside their own cell (nprobe=1). Unlike ``ivf_topk_probe`` (which
    anchors cells on 8 arbitrary corpus vectors so the oracle stays
    cheap), this is the production index shape: learned prototypes,
    data-adaptive cells.

    Plan: centroid training is posexplode -> (label, dim) partial avg
    (the shuffle carries labels x 64 partial sums, never vectors) ->
    per-label array reassembly via the array_sort(collect_list(struct))
    house pattern; centroids broadcast into the assignment cross join
    on NARROW rows (no 64-double array through the window exchange);
    the probe join is keyed on the cell id so candidate work scales
    with cell occupancy. Centroid dims are rounded to 6dp on both
    engines before any cosine (float-sum order differs per engine;
    rounding absorbs it — same convention as ``label_centroids``)."""
    e = _emb_n(spark, sf_dir)
    pos = e.select("label", F.posexplode("emb").alias("i", "x"))
    centd = pos.groupBy("label", "i").agg(F.round(F.avg("x"), 6).alias("c"))
    cent = (
        centd.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("i", "c"))).alias("karr"))
        .select(F.col("label").alias("centroid_label"), F.col("karr.c").alias("cemb"))
        .withColumn("cnorm", F.sqrt(dot(F.col("cemb"), F.col("cemb"))))
    )
    assign = e.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "centroid_label",
        _sim(F.col("emb"), F.col("norm"), F.col("cemb"), F.col("cnorm")).alias("cos_sim"),
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("cos_sim"), F.asc("centroid_label")
    )
    cell_of = (
        assign.withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("centroid_label").alias("cell"))
    )
    # localCheckpoint, not cache(): referenced by both the query and the
    # probe side of one plan, but a cache() entry would pin storage
    # until an unpersist a lazy plan-builder can never safely issue;
    # checkpoint blocks are ContextCleaner-freed with the plan.
    cells = e.join(cell_of, "vec_id").select(
        "vec_id", "emb", "norm", "cell"
    ).localCheckpoint(eager=False)  # lazy (r14): materialized by the
    # consuming action's first touch — one dedicated job fewer
    q = cells.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.col("norm").alias("qnorm"),
        "cell",
    )
    probe = (
        cells.join(q, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _sim(F.col("qemb"), F.col("qnorm"), F.col("emb"), F.col("norm")).alias("cos_sim"),
        )
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        probe.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


_SEMDEDUP_TAU = 0.35
# cell count scales with the corpus via dials._semdedup_k (imported
# above): K = 16 per _PAIRWISE_CAP-sized slab, target cell occupancy
# ~1.3k vectors.


def _semantic_dedup_oracle(sf_dir: str) -> str | None:
    """Callable oracle: resolves the corpus-adaptive cell count K for
    THIS corpus (identical to the former static SQL at every committed
    fixture). None = unreadable corpus (rows-only fallback).

    r12: above the embeddings-side heavy cap (sf100+) both engines
    restrict to the deterministic ``vec_id % M`` sub-corpus FIRST and
    resolve K from the capped count — without this, constant-occupancy
    cells make the assignment stage n x K ~ n² (3.1G-row sort at
    sf100, disk-exhausting). Centroids are the first K capped ids,
    i.e. ``vec_id < K*M`` among ``vec_id % M = 0``."""
    from .dials import _emb_heavy_cap_mod

    n = _embeddings_total_count(sf_dir)
    if n is None:
        return None
    mh = _emb_heavy_cap_mod(n)
    n_eff = (n + mh - 1) // mh  # capped-corpus size (ids contiguous)
    k = _semdedup_k(n_eff)
    pred = f" WHERE vec_id % {mh} = 0" if mh > 1 else ""
    return f"""
WITH e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings{pred}),
cent AS MATERIALIZED (
    SELECT vec_id AS centroid_id, emb AS cemb FROM e WHERE vec_id < {k * mh}
),
assign AS MATERIALIZED (
    SELECT v.vec_id, v.emb, c.centroid_id,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {_cos_sql('v.emb', 'c.cemb')} DESC,
                                       c.centroid_id ASC) AS rn
    FROM e v CROSS JOIN cent c
),
cells AS MATERIALIZED (
    SELECT centroid_id AS cell, vec_id, emb,
           sqrt(list_dot_product(emb, emb)) AS norm
    FROM assign WHERE rn = 1
),
drops AS MATERIALIZED (
    SELECT DISTINCT b.vec_id
    FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.emb, b.emb) / (a.norm * b.norm), 6) >= {_SEMDEDUP_TAU}
)
SELECT c.cell AS centroid_id,
       CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(sum(CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_dropped,
       CAST(sum(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM cells c LEFT JOIN drops d USING (vec_id)
GROUP BY c.cell
"""


@register(
    "semantic_dedup",
    oracle=_semantic_dedup_oracle,
    tags=("similarity", "dedup", "semdedup"),
)
def semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
    the embedding space coarsely, then deduplicate WITHIN each cluster —
    a vector v is dropped iff some same-cell vector with a smaller id is
    within the similarity radius (cos >= 0.35). Clustering makes the
    quadratic step local: all-pairs cost falls from O(n^2) to
    O(sum cell_i^2), and each cell is an independent task.

    Plan shape: assignment is one broadcast-centroid pass + per-vector
    argmax (the ivf_cell_assignment kernel; deterministic first-K
    centroids so the callable oracle can replay it at the same
    corpus-adaptive K — ``_semdedup_k``); the within-cell dedup runs as ONE Arrow
    applyInPandas kernel per cell — a numpy matmul over the cell's
    matrix, emitting only the 4-column per-cell summary, so nothing
    pair-shaped ever shuffles. Scale posture: K scales with corpus size
    (K ~ n / target_cell_rows) keeping per-task memory (cell_rows)^2
    bounded; the kernel is the same BLAS shape as the block-grid
    all-pairs kernel but restricted to cells, which is exactly the
    SemDeDup trick."""
    import numpy as np
    import pandas as pd

    from .dials import _emb_heavy_cap_mod

    e = _emb_n(spark, sf_dir)
    n = _embeddings_total_count(sf_dir)
    if n is None:
        n = e.count()
    mh = _emb_heavy_cap_mod(n)
    if mh > 1:  # r12 embeddings-side heavy cap (sf100+): restrict the
        # corpus before assignment — constant-occupancy cells otherwise
        # make the assignment stage n x K ~ n² (see the oracle)
        e = e.filter(F.col("vec_id") % mh == 0)
    n_eff = (n + mh - 1) // mh
    k = _semdedup_k(n_eff)  # corpus-adaptive cell count (16 at
    cent = e.filter(F.col("vec_id") < k * mh).select(  # committed fixtures)
        F.col("vec_id").alias("centroid_id"),
        F.col("emb").alias("cemb"),
        F.col("norm").alias("cnorm"),
    )
    assign = e.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "emb",
        "centroid_id",
        _sim(F.col("emb"), F.col("norm"), F.col("cemb"), F.col("cnorm")).alias("cos_sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), F.asc("centroid_id"))
    cells = (
        assign.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("centroid_id").alias("cell"), "vec_id", "emb")
    )

    def cell_dedup(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")
        x = np.array(list(pdf["emb"]), dtype=np.float64)
        # dot / (norm_a * norm_b), NOT normalize-then-dot: this replays
        # the oracle's float sequence (round(dot / (na * nb), 6)) so a
        # pair landing exactly on a 6dp rounding boundary cannot flip
        # dropped/kept between engines.
        norms = np.sqrt(np.einsum("ij,ij->i", x, x))
        sims = np.round((x @ x.T) / np.outer(norms, norms), 6)
        # strict upper triangle by ascending id: mask[i, j] == True means
        # the earlier vector i puts j inside the dedup radius
        mask = np.triu(sims >= _SEMDEDUP_TAU, k=1)
        dropped = int(mask.any(axis=0).sum())
        n = len(pdf)
        return pd.DataFrame(
            {
                "centroid_id": [int(pdf["cell"].iloc[0])],
                "n_vectors": [n],
                "n_dup_dropped": [dropped],
                "n_kept": [n - dropped],
            }
        )

    return cells.groupBy("cell").applyInPandas(
        cell_dedup,
        "centroid_id bigint, n_vectors bigint, n_dup_dropped bigint, n_kept bigint",
    )


# The PQ train -> encode -> ADC -> shortlist pipeline as a shared CTE
# block: ``pq_knn_rerank`` reranks the shortlist, ``pq_recall_eval``
# grades it against exact brute force.
_PQ_SHORTLIST_CTES = f"""{_E_CTE},
sub AS (
    SELECT vec_id, CAST(s AS BIGINT) AS s, list_slice(emb, s * 8 + 1, s * 8 + 8) AS subv
    FROM e, range(8) t(s)
),
centd AS (
    SELECT label, i, round(avg(x), 6) AS c
    FROM (SELECT label, i, emb[i + 1] AS x FROM e, range(64) t(i))
    GROUP BY label, i
),
cent AS (
    SELECT label, CAST(i // 8 AS BIGINT) AS s, array_agg(c ORDER BY i) AS carr
    FROM centd GROUP BY label, i // 8
),
dist AS (
    SELECT v.vec_id, v.s, c.label,
           CAST(round(list_sum(list_transform(range(8),
                    j -> (v.subv[j + 1] - c.carr[j + 1])
                         * (v.subv[j + 1] - c.carr[j + 1]))) * 1000000) AS BIGINT) AS d_e6
    FROM sub v JOIN cent c ON c.s = v.s
),
code AS (
    SELECT vec_id, s, label AS code_label FROM (
        SELECT vec_id, s, label,
               row_number() OVER (PARTITION BY vec_id, s
                                  ORDER BY d_e6 ASC, label ASC) AS rn
        FROM dist
    ) WHERE rn = 1
),
adc AS (
    SELECT qd.vec_id AS query_id, cv.vec_id AS neighbor_id,
           CAST(sum(qd.d_e6) AS BIGINT) AS adc_e6
    FROM code cv JOIN dist qd ON qd.s = cv.s AND qd.label = cv.code_label
    WHERE qd.vec_id < 3 AND cv.vec_id >= 3
    GROUP BY 1, 2
),
shortlist AS (
    SELECT query_id, neighbor_id, adc_e6,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY adc_e6 ASC, neighbor_id ASC) AS arank
    FROM adc
)"""


def _pq_adc_shortlist(spark, sf_dir):
    """(query_id, neighbor_id, adc_e6, arank <= 20) — the Spark twin of
    ``_PQ_SHORTLIST_CTES``; see ``pq_knn_rerank`` for the plan notes."""
    e = _emb(spark, sf_dir)
    sub = e.select(
        "vec_id",
        F.explode(
            F.expr("transform(sequence(0, 7), s -> struct(CAST(s AS BIGINT) AS s, slice(emb, s * 8 + 1, 8) AS subv))")
        ).alias("t"),
    ).select("vec_id", "t.s", "t.subv")
    pos = e.select("label", F.posexplode("emb").alias("i", "x"))
    centd = pos.groupBy("label", "i").agg(F.round(F.avg("x"), 6).alias("c"))
    cent = (
        centd.groupBy("label", F.expr("CAST(i div 8 AS BIGINT)").alias("s"))
        .agg(F.sort_array(F.collect_list(F.struct("i", "c"))).alias("ic"))
        .select("label", "s", F.expr("transform(ic, t -> t.c)").alias("carr"))
    )
    l2 = F.aggregate(
        F.zip_with(F.col("subv"), F.col("carr"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    dist = sub.join(F.broadcast(cent), "s").select(
        "vec_id", "s", "label", F.round(l2 * F.lit(1000000.0)).cast("bigint").alias("d_e6")
    )
    cw = Window.partitionBy("vec_id", "s").orderBy(F.asc("d_e6"), F.asc("label"))
    code = (
        dist.withColumn("rn", F.row_number().over(cw))
        .filter((F.col("rn") == 1) & (F.col("vec_id") >= 3))
        .select(F.col("vec_id").alias("neighbor_id"), "s", F.col("label").alias("code_label"))
    )
    qdist = dist.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "s", F.col("label").alias("code_label"), "d_e6"
    )
    adc = (
        code.join(F.broadcast(qdist), ["s", "code_label"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d_e6").cast("bigint").alias("adc_e6"))
    )
    aw = Window.partitionBy("query_id").orderBy(F.asc("adc_e6"), F.asc("neighbor_id"))
    return adc.withColumn("arank", F.row_number().over(aw)).filter(F.col("arank") <= 20)


@register(
    "pq_knn_rerank",
    oracle=f"""
WITH {_PQ_SHORTLIST_CTES},
rerank AS (
    SELECT sl.query_id, sl.neighbor_id, sl.adc_e6,
           {_cos_sql('qe.emb', 'ce.emb')} AS cos_sim
    FROM shortlist sl
    JOIN e qe ON qe.vec_id = sl.query_id
    JOIN e ce ON ce.vec_id = sl.neighbor_id
    WHERE sl.arank <= 20
)
SELECT query_id, neighbor_id, adc_e6, cos_sim,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id ASC) AS INTEGER) AS rank
FROM rerank QUALIFY rank <= 5
""",
    tags=("similarity", "ann", "quantization", "pq", "topk"),
)
def pq_knn_rerank(spark, sf_dir):
    """Product-quantization ANN (Jegou et al. 2011) with exact rerank —
    the third compression point on the family's memory/recall dial
    (float < SQ8 < PQ: 64 doubles -> 8 one-byte codes per vector).
    The codebook is trained deterministically like ``ivf_build_probe``:
    8 subspaces x (per-label subvector average) centroids, from one
    posexplode partial-average pass whose shuffle carries labels x 64
    partial sums, never vectors. Every vector is encoded to its argmin-
    L2 centroid per subspace; queries score candidates by ADC
    (asymmetric distance: sum over subspaces of the query-to-centroid
    table entry for the candidate's code) in EXACT micro-unit integer
    math, so the shortlist order is bit-identical on any engine; the
    top-20 shortlist per query is reranked with exact float cosine and
    top-5 returned.

    Scale posture: the codebook (labels x 8 x 8 doubles) and the
    per-query ADC lookup table (queries x 8 x labels ints) are both
    broadcast; candidate scoring reads ONLY the 8-code representation
    of the corpus — at 100 TB the float vectors are fetched for the
    |shortlist| rows alone, everything else is a map-side lookup-sum
    with partial aggregation over (query, neighbor)."""
    e = _emb(spark, sf_dir)
    shortlist = _pq_adc_shortlist(spark, sf_dir)
    qe = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_fl")
    )
    rr = (
        e.join(F.broadcast(shortlist), e.vec_id == shortlist.neighbor_id)
        .join(F.broadcast(qe), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            "adc_e6",
            F.round(cosine(F.col("q_fl"), F.col("emb")), 6).alias("cos_sim"),
        )
    )
    rw = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        rr.withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "adc_e6", "cos_sim", F.col("rank").cast("int").alias("rank"))
    )


@register(
    "mrl_truncation_eval",
    oracle=f"""
WITH {_E_CTE},
et AS (SELECT vec_id, emb, emb[1:16] AS emb16 FROM e),
fullr AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {_cos_sql('q.emb', 'c.emb')} DESC,
                                       c.vec_id ASC) AS rk
    FROM et q JOIN et c ON q.vec_id < 5 AND c.vec_id >= 5
),
truncr AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {_cos_sql('q.emb16', 'c.emb16')} DESC,
                                       c.vec_id ASC) AS rk
    FROM et q JOIN et c ON q.vec_id < 5 AND c.vec_id >= 5
)
SELECT f.query_id,
       CAST(count(t.neighbor_id) AS BIGINT) AS overlap_at_10
FROM (SELECT query_id, neighbor_id FROM fullr WHERE rk <= 10) f
LEFT JOIN (SELECT query_id, neighbor_id FROM truncr WHERE rk <= 10) t
  ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
GROUP BY f.query_id
""",
    tags=("similarity", "eval", "truncation", "topk"),
)
def mrl_truncation_eval(spark, sf_dir):
    """Matryoshka-truncation retrieval eval (Kusupati et al. 2022):
    how much of each query's float top-10 survives when vectors are
    truncated to their first 16 of 64 dimensions — the measurement a
    pipeline runs before shipping truncated embeddings to cut index
    memory 4x. Reports overlap@10 per query between the full-width and
    truncated rankings (both rankings 6dp-rounded with a neighbor-id
    tiebreak, so the sets are engine-exact).

    Scale: both rankings are the brute-force kernel shape — the 5-row
    query side broadcasts into the corpus scan twice (once per width;
    the truncated pass reads the SAME column and slices in-expression,
    no second materialized index), each per-query top-10 compiles to
    window-rank over a broadcast-partitioned stream, and the overlap
    join touches <= 50 rows per arm."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.slice(F.col("emb"), 1, 16).alias("qemb16"),
    )
    c = e.filter(F.col("vec_id") >= 5).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("emb").alias("cemb"),
        F.slice(F.col("emb"), 1, 16).alias("cemb16"),
    )
    joined = c.crossJoin(F.broadcast(q))
    w = Window.partitionBy("query_id")

    def topk(sim_col, k=10):
        return (
            joined.select(
                "query_id", "neighbor_id", F.round(sim_col, 6).alias("cos_sim")
            )
            .withColumn(
                "rk",
                F.row_number().over(
                    w.orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
                ),
            )
            .filter(F.col("rk") <= k)
            .select("query_id", "neighbor_id")
        )

    fullr = topk(cosine(F.col("qemb"), F.col("cemb")))
    truncr = topk(cosine(F.col("qemb16"), F.col("cemb16")))
    t = truncr.withColumn("hit", F.lit(1))
    return (
        fullr.join(t, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.count("hit").cast("bigint").alias("overlap_at_10"))
    )


@register(
    "pq_recall_eval",
    oracle=f"""
WITH {_PQ_SHORTLIST_CTES},
exact5 AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {_cos_sql('q.emb', 'c.emb')} DESC,
                                       c.vec_id ASC) AS rk
    FROM e q JOIN e c ON q.vec_id < 3 AND c.vec_id >= 3
)
SELECT f.query_id,
       CAST(count(s.neighbor_id) AS BIGINT) AS hits_at_5,
       round(count(s.neighbor_id) / 5.0, 4) AS recall_at_5
FROM (SELECT query_id, neighbor_id FROM exact5 WHERE rk <= 5) f
LEFT JOIN (SELECT query_id, neighbor_id FROM shortlist WHERE arank <= 20) s
  ON s.query_id = f.query_id AND s.neighbor_id = f.neighbor_id
GROUP BY f.query_id
""",
    tags=("similarity", "ann", "quantization", "pq", "eval"),
)
def pq_recall_eval(spark, sf_dir):
    """PQ's row on the family recall datasheet (LSH / SimHash / IVF all
    have one): how many of each query's exact cosine top-5 survive into
    the 20-deep ADC shortlist — the ceiling on what ``pq_knn_rerank``'s
    exact rerank can return. 8x8 per-label codebooks are coarse by
    construction, so this dial is where the compression/recall trade
    becomes a number instead of a claim.

    Scale: the shortlist arm is the shared integer-ADC pipeline
    (broadcast codebook + lookup table); the exact arm is the
    brute-force kernel with the 3-row query side broadcast; the grading
    join touches <= 15 exact rows vs <= 60 shortlist rows."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    c = e.filter(F.col("vec_id") >= 3).select(
        F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("cemb")
    )
    ew = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(cosine(F.col("qemb"), F.col("cemb")), 6)), F.asc("neighbor_id")
    )
    exact5 = (
        c.crossJoin(F.broadcast(q))
        .withColumn("rk", F.row_number().over(ew))
        .filter(F.col("rk") <= 5)
        .select("query_id", "neighbor_id")
    )
    hits = _pq_adc_shortlist(spark, sf_dir).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        exact5.join(hits, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("hit").cast("bigint").alias("hits_at_5"),
            F.round(F.count("hit") / F.lit(5.0), 4).alias("recall_at_5"),
        )
    )


# ---------------------------------------------------------------------------
# Lloyd-trained PQ codebook + IVF-PQ composition (r8 verdict #2/#3)
#
# The v1 PQ family above keys its codebook on the 10 corpus labels, so
# same-label candidates collapse to one code and ADC cannot rank within
# a label (measured recall@5 0.0/0.2/0.6). The v2 codebook decouples k
# from labels (k=64 centroids per subspace), trains with deterministic
# Lloyd iterations, and scales the ADC shortlist with corpus size —
# recall@5 >= 0.6 for every query on every fixture (PERF.md dial table).
#
# Cross-engine exactness: every subvector element is quantized ONCE to
# integer micro-units (round(x*1e6) as int64); from there the entire
# train/encode/ADC pipeline is exact int64 arithmetic, so Spark and
# DuckDB agree BIT-FOR-BIT with no float-sequence replay needed. That
# exactness is what lets the oracle use DuckDB's vectorized
# array_inner_product expansion (|v|^2+|c|^2-2<v,c>) while Spark runs a
# zip_with difference-square fold — different evaluation orders, same
# integers (all intermediates stay below 2^53, so even the DOUBLE-typed
# oracle path is exact; bounds audited in the CTE builder docstring).
# Cluster means round at integer precision: round(sum/count) where sum
# is exact — the one float division per centroid dim, identical on both
# engines. Empty clusters keep their previous centroid.
# ---------------------------------------------------------------------------

_PQ_LLOYD_K = 64
_PQ_LLOYD_ITERS = 2
_IVFPQ_NPROBE = 3


def _pq_lloyd_shortlist_depth(n_candidates: int) -> int:
    """ADC shortlist depth for the Lloyd-PQ family: max(64,
    ceil(0.9*sqrt(n))). Measured dial (PERF.md): 64 at n<=5k and
    ~0.9*sqrt(n) beyond keeps recall@5 >= 0.6 for every query at every
    fixture while the exact-rerank cost stays O(sl) vector fetches."""
    import math

    return max(64, math.ceil(0.9 * math.sqrt(max(n_candidates, 1))))


def _embeddings_candidate_count(sf_dir: str) -> int | None:
    """Candidate-row count (vec_id >= 3) straight from the parquet
    footer statistics — used by the CALLABLE oracles to derive the same
    shortlist depth the Spark plan computes from its own count().

    Returns None on missing/unreadable parquet (rows-only fallback for
    that one query; see _embeddings_total_count)."""
    import os

    import duckdb

    path = f"{sf_dir}/embeddings.parquet"
    try:
        files = (
            sorted(
                os.path.join(path, n)
                for n in os.listdir(path)
                if n.endswith(".parquet")
            )
            if os.path.isdir(path)
            else [path]
        )
        stat_key = (
            "cand",
            tuple(
                (f, st.st_size, st.st_mtime_ns)
                for f in files
                for st in (os.stat(f),)
            ),
        )
        hit = _COUNT_MEMO.get(stat_key)
        if hit is not None:
            return hit
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        n = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{path}') WHERE vec_id >= 3"
        ).fetchone()[0]
        if len(_COUNT_MEMO) >= 64:
            _COUNT_MEMO.clear()
        _COUNT_MEMO[stat_key] = n
        return n
    except (OSError, duckdb.Error):
        return None


# ---------------------------------------------------------------------------
# Lloyd-codebook pinning (r10 verdict #1 / r11): above _LLOYD_SQL_CAP
# candidates the in-SQL Lloyd twin is infeasible in DuckDB (the sf10
# sweep timed out three PQ-family oracles at a 300 s budget while the
# Spark side answered in seconds) — the same resolution as the MLlib
# prediction pin: the Spark-trained codebook (k x 8 rows of 8 int64
# micro-unit coordinates, deterministic integer-exact Lloyd) is
# persisted as a per-corpus committed artifact, and the callable
# oracle inlines it as a literal-VALUES ``cent{iters}`` table,
# independently verifying everything DOWNSTREAM of training (encode,
# ADC, routing, shortlist, rerank, exact arm) in SQL. Training itself
# stays independently verified at every committed fixture scale
# (n <= _LLOYD_SQL_CAP runs the full in-SQL Lloyd, byte-identical to
# the pre-r11 oracles).
# ---------------------------------------------------------------------------

_LLOYD_SQL_CAP = 20480


def _codebook_pin_path(sf_dir: str, kind: str) -> str:
    """Per-corpus pin file, keyed like the MLlib model registry:
    corpus label + CONTENT fingerprint of the embeddings table, so a
    regenerated corpus can never resolve a stale codebook."""
    import os

    from ..sources.tables import data_fingerprint

    label = os.path.basename(os.path.abspath(sf_dir).rstrip(os.sep))
    fp = data_fingerprint(os.path.join(sf_dir, "embeddings.parquet"))
    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    base = os.environ.get(
        "SPARK_GRAFT_MODEL_DIR", os.path.join(repo_root, "models")
    )
    return os.path.join(base, f"pq_codebook_{kind}_{label}_{fp}.json")


def _write_codebook_pin(
    cent: DataFrame, sf_dir: str, kind: str, n_candidates: int
) -> None:
    """Persist the trained (s, cid, carr) codebook when an oracle will
    need it (n above _LLOYD_SQL_CAP; smaller corpora recompute Lloyd
    in SQL, so no pin is written and fixture checkouts stay clean).
    Bounded collect: k x 8 = 512 rows off an eager localCheckpoint.
    Atomic tmp+rename, write-once per corpus fingerprint."""
    import json
    import os

    if n_candidates <= _LLOYD_SQL_CAP:
        return
    path = _codebook_pin_path(sf_dir, kind)
    if os.path.exists(path):
        return
    rows = sorted(
        (int(r["s"]), int(r["cid"]), [int(x) for x in r["carr"]])
        for r in cent.collect()
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump({"kind": kind, "rows": rows}, fh)
    os.replace(tmp, path)


def _read_codebook_pin(sf_dir: str, kind: str):
    """The committed codebook rows for this corpus, or None (no pin
    yet / unreadable) -> the caller falls back to the rows-only
    contract until the first Spark run writes it (the sweep harness
    re-resolves callable oracles after each query's run)."""
    import json
    import os

    try:
        path = _codebook_pin_path(sf_dir, kind)
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            pin = json.load(fh)
    except (OSError, ValueError):
        return None
    rows = pin.get("rows")
    return rows or None


def _pinned_cent_cte(name: str, rows) -> str:
    """Literal-VALUES rendering of a pinned codebook, shaped exactly
    like the trained ``cent{iters}``/``rcent{iters}`` CTEs (s, cid,
    carr DOUBLE[], carrf DOUBLE[8], ipc)."""
    vals = ",\n        ".join(
        f"({s}, {cid}, [{', '.join(str(x) for x in carr)}]::DOUBLE[])"
        for s, cid, carr in rows
    )
    return f"""
{name} AS MATERIALIZED (
    SELECT CAST(s AS BIGINT) AS s, CAST(cid AS BIGINT) AS cid, carr,
           carr::DOUBLE[8] AS carrf,
           array_inner_product(carr::DOUBLE[8], carr::DOUBLE[8]) AS ipc
    FROM (VALUES
        {vals}) t(s, cid, carr)
)"""


def _sub_e6(spark, sf_dir) -> DataFrame:
    """(vec_id, s, subv) with subv = the s-th 8-dim subvector quantized
    to int64 micro-units — the single float->int boundary of the
    Lloyd-PQ pipeline.

    NOT cached or checkpointed here (the r13 docstring claimed a cache
    that never existed — ADVICE r13): each call builds a fresh plan and
    every consumer action re-runs the columnar scan + quantize. A
    shared lazy localCheckpoint of this relation was tried in r14 and
    REVERTED — serializing/rereading the array<long> row blocks
    measured slower than recomputing (ivfpq_topk 3.6->5.8 s), the same
    array-payload lesson as the r13 kmeans cache attempts."""
    e = _emb(spark, sf_dir)
    return (
        e.select(
            "vec_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, 7), s -> struct(CAST(s AS BIGINT) AS s,"
                    " transform(slice(emb, s * 8 + 1, 8),"
                    " x -> CAST(round(x * 1000000) AS BIGINT)) AS subv))"
                )
            ).alias("t"),
        )
        .select("vec_id", "t.s", "t.subv")
    )


def _l2_int(a: Column, b: Column) -> Column:
    """Exact int64 squared L2 between two bigint arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _pq_lloyd_codebook(
    spark, sf_dir, k: int = _PQ_LLOYD_K, iters: int = _PQ_LLOYD_ITERS, sub=None
) -> DataFrame:
    """Train the (s, cid, carr) codebook: seed from the k lowest
    candidate vec_ids (cid IS the seed vec_id — any deterministic total
    order works for tie-breaks, so no row_number window is needed),
    then `iters` Lloyd rounds of exact-integer argmin assignment +
    round(sum/count) means. Each round's centroid relation (k*8 rows)
    is localCheckpoint-ed: it feeds the next round's broadcast join
    twice, the blocks are ContextCleaner-freed, and lineage stays flat
    — the same iterative-loop pattern as nation_trade_pagerank.

    Scale: per round ONE broadcast join (n*8 x k rows, map-side) + one
    (vec_id, s)-keyed partial-agg argmin + one (s, cid, j)-keyed mean —
    nothing larger than the corpus ever shuffles, and the codebook
    itself is k x 8 rows.

    ``sub``: optionally a pre-built (possibly checkpoint-shared)
    ``_sub_e6`` relation, so a composition that also encodes pays the
    quantize explode once (r14)."""
    if sub is None:
        sub = _sub_e6(spark, sf_dir)
    cent = _lloyd_codebook_on(sub.filter(F.col("vec_id") >= 3), k, iters)
    if k == _PQ_LLOYD_K and iters == _PQ_LLOYD_ITERS:
        # persist the registry-parameter codebook for the pinned
        # oracle path (no-op below _LLOYD_SQL_CAP / when already pinned)
        n = _embeddings_candidate_count(sf_dir)
        if n is not None:
            _write_codebook_pin(cent, sf_dir, "raw", n)
    return cent


def _lloyd_codebook_on_relational(cand: DataFrame, k: int, iters: int) -> DataFrame:
    """The original DataFrame rendering of the Lloyd loop — kept as the
    reference arm for tests/test_operators.py's kernel-equality pin
    (the r8 lsh_near_dup precedent: a physical re-render must prove the
    pair/row set unchanged). Semantics and exactness per
    ``_pq_lloyd_codebook``'s docstring."""
    seed_ids = cand.select("vec_id").distinct().orderBy("vec_id").limit(k)
    cent = (
        cand.join(F.broadcast(seed_ids), "vec_id")
        .select(F.col("vec_id").alias("cid"), "s", F.col("subv").alias("carr"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        dist = cand.join(F.broadcast(cent), "s").select(
            "vec_id", "s", "cid", _l2_int(F.col("subv"), F.col("carr")).alias("d")
        )
        asg = (
            dist.groupBy("vec_id", "s")
            .agg(F.min(F.struct("d", "cid")).alias("m"))
            .select("vec_id", "s", F.col("m.cid").alias("cid"))
        )
        means = (
            asg.join(cand, ["vec_id", "s"])
            .select("s", "cid", F.posexplode("subv").alias("j", "x"))
            .groupBy("s", "cid", "j")
            .agg(
                F.round(F.sum("x").cast("double") / F.count(F.lit(1)))
                .cast("bigint")
                .alias("c")
            )
            .groupBy("s", "cid")
            .agg(F.array_sort(F.collect_list(F.struct("j", "c"))).alias("jc"))
            .select("s", "cid", F.col("jc.c").alias("marr"))
        )
        cent = (
            cent.join(means, ["s", "cid"], "left")
            .select("s", "cid", F.coalesce(F.col("marr"), F.col("carr")).alias("carr"))
            .localCheckpoint(eager=True)
        )
    return cent


def _round_half_up_like_spark(total: int, count: int) -> int:
    """round(CAST(sum AS DOUBLE) / count) with Spark's exact semantics:
    IEEE double division, then HALF_UP on the shortest-decimal
    rendering of the double (Spark's Round goes through
    BigDecimal.valueOf = Double.toString). Python's repr() is the same
    shortest round-trip decimal, and any faithful decimal rendering of
    a double rounds to the same integer (an x.5 boundary is itself a
    representable double, so a non-boundary quotient sits a full ULP
    away while faithful renderings stay within half a ULP)."""
    from decimal import ROUND_HALF_UP, Decimal

    d = float(total) / float(count)
    return int(Decimal(repr(d)).quantize(Decimal("1"), rounding=ROUND_HALF_UP))


def _lloyd_partials_kernel(cent_by_s: dict, cids_by_s: dict, width: int = 8):
    """mapInPandas kernel: assign each (vec_id, s, subv) row to its
    nearest centroid of subspace s (exact int64 d = ipv + ipc - 2<v,c>,
    ties to the LOWEST cid — cids are passed ascending and argmin takes
    the first minimum) and emit per-batch per-cluster partial sums.
    Streaming and bounded: one Arrow batch in flight, k x width int64
    state — safe at any corpus size. ``width`` is the subvector
    dimensionality (8 for the PQ families, 64 for full-vector
    k-means)."""

    def fn(batches):
        import numpy as np
        import pandas as pd

        cent = {s: np.asarray(m, dtype=np.int64) for s, m in cent_by_s.items()}
        cids = {s: np.asarray(v, dtype=np.int64) for s, v in cids_by_s.items()}
        cols = ["s", "cid", "n"] + [f"x{j}" for j in range(width)]
        for pdf in batches:
            if pdf.empty:
                continue
            svals = pdf["s"].to_numpy()
            X = np.stack(pdf["subv"].to_numpy()).astype(np.int64, copy=False)
            rows = []
            for s in np.unique(svals):
                C = cent[int(s)]
                Xs = X[svals == s]
                ipv = np.einsum("ij,ij->i", Xs, Xs)
                ipc = np.einsum("ij,ij->i", C, C)
                d = ipv[:, None] + ipc[None, :] - 2 * (Xs @ C.T)
                a = np.argmin(d, axis=1)
                sums = np.zeros((C.shape[0], width), dtype=np.int64)
                np.add.at(sums, a, Xs)
                cnts = np.bincount(a, minlength=C.shape[0])
                for i in np.nonzero(cnts)[0]:
                    rows.append(
                        (int(s), int(cids[int(s)][i]), int(cnts[i]))
                        + tuple(int(v) for v in sums[i])
                    )
            yield pd.DataFrame(rows, columns=cols)

    return fn


def _lloyd_partials_schema(width: int = 8) -> str:
    return "s long, cid long, n long, " + ", ".join(
        f"x{j} long" for j in range(width)
    )


_LLOYD_PARTIALS_SCHEMA = _lloyd_partials_schema(8)


def _cent_df_from_rows(spark, rows) -> DataFrame:
    """(s, cid, carr) DataFrame from driver-side codebook rows — a
    VALUES LocalRelation (JVM-side; createDataFrame's Python-RDD path
    costs ~0.7 s per call here)."""
    vals = ", ".join(
        f"({int(s)}, {int(cid)}, array({', '.join(str(int(x)) for x in carr)}))"
        for s, cid, carr in rows
    )
    return spark.sql(
        "SELECT CAST(s AS BIGINT) AS s, CAST(cid AS BIGINT) AS cid, "
        "CAST(carr AS ARRAY<BIGINT>) AS carr "
        f"FROM (VALUES {vals}) AS t(s, cid, carr)"
    )


def _lloyd_codebook_rows(
    cand: DataFrame, k: int, iters: int, width: int = 8, nsub: int = 8
):
    """Driver-paced Lloyd: seeds from one bounded TakeOrdered (the k
    lowest vec_ids' 8 subvectors = k*8 rows), then per round ONE
    streaming mapInPandas pass emitting per-batch cluster partials,
    folded by a (s, cid)-keyed aggregate whose k*8-row result is
    collected and turned into the next round's literal centroids.

    Why (r13): the DataFrame loop paid per round a broadcast join that
    expanded the corpus k-fold through the INTERPRETED zip_with/
    aggregate L2 lambda (n x 8 x k evaluations — measured ~70% of every
    Lloyd-family query), two keyed shuffles, a join back to the
    corpus, and an eager localCheckpoint. The kernel does the same
    int64 arithmetic vectorized (numpy einsum/matmul — exact, no
    floats), ties still break to the lowest cid, and the coordinate
    means replicate Spark's round(CAST(sum AS DOUBLE)/count) exactly
    (``_round_half_up_like_spark``). Bit-equality with the relational
    arm is pinned by tests/test_operators.py at two fixtures.

    Scale posture: strictly better than the loop it replaces — per
    round one map-side-reduced pass (partials are k x 8 rows per
    batch), driver state k x 8 ints, no corpus-sized shuffle at all."""
    spark = cand.sparkSession
    seed_rows = cand.orderBy("vec_id", "s").limit(k * nsub).collect()
    # The bounded TakeOrdered seeding assumes every vec_id contributes
    # exactly one row per subspace (``nsub``) — true for every current
    # caller (_sub_e6 / _residual_subs emit dense s=0..7 per vec_id;
    # the k-means adapter emits a single s=0 row). A future source with
    # missing subspaces would silently seed from >k vec_ids and diverge
    # from the relational arm's distinct-vec_id seeding, so fail loudly
    # instead (ADVICE r13).
    seed_ids = {int(r["vec_id"]) for r in seed_rows}
    if seed_rows and not (
        len(seed_ids) <= k and len(seed_rows) == nsub * len(seed_ids)
    ):
        raise AssertionError(
            f"Lloyd seeding expected {k} vec_ids x {nsub} subspaces, got "
            f"{len(seed_rows)} rows over {len(seed_ids)} vec_ids"
        )
    cent: dict[int, list] = {}
    cids: dict[int, list] = {}
    for r in sorted(seed_rows, key=lambda r: (int(r["s"]), int(r["vec_id"]))):
        s, cid = int(r["s"]), int(r["vec_id"])
        cent.setdefault(s, []).append([int(x) for x in r["subv"]])
        cids.setdefault(s, []).append(cid)
    for _ in range(iters):
        part = (
            cand.mapInPandas(
                _lloyd_partials_kernel(cent, cids, width),
                _lloyd_partials_schema(width),
            )
            .groupBy("s", "cid")
            .agg(
                F.sum("n").alias("n"),
                *[F.sum(f"x{j}").alias(f"x{j}") for j in range(width)],
            )
            .collect()
        )
        new = {
            (int(r["s"]), int(r["cid"])): [
                _round_half_up_like_spark(int(r[f"x{j}"]), int(r["n"]))
                for j in range(width)
            ]
            for r in part
        }
        for s in cent:
            cent[s] = [
                new.get((s, cids[s][i]), cent[s][i]) for i in range(len(cids[s]))
            ]
    return [
        (s, cids[s][i], cent[s][i])
        for s in sorted(cent)
        for i in range(len(cids[s]))
    ]


def _lloyd_codebook_on(cand: DataFrame, k: int, iters: int) -> DataFrame:
    """The Lloyd loop over any (vec_id, s, subv:int64[8]) source —
    shared by the raw-vector PQ family and the residual IVF-PQ family.
    r13: trains via the streaming numpy kernel (``_lloyd_codebook_rows``)
    and returns the codebook as a VALUES LocalRelation; values are
    bit-identical to ``_lloyd_codebook_on_relational`` (pinned by
    test)."""
    spark = cand.sparkSession
    rows = _lloyd_codebook_rows(cand, k, iters)
    if not rows:  # degenerate zero-candidate corpus
        return spark.range(0).select(
            F.col("id").alias("s"),
            F.col("id").alias("cid"),
            F.array(F.lit(0).cast("bigint")).alias("carr"),
        )
    return _cent_df_from_rows(spark, rows)


def _lloyd_encode_kernel(cent_by_s: dict, cids_by_s: dict, out_col: str):
    """mapInPandas kernel: argmin-encode each (vec_id, s, subv) row
    against subspace s's centroids — the same exact int64 distance and
    lowest-cid tie-break as ``_lloyd_partials_kernel``, one streaming
    pass, no k-fold join expansion."""

    def fn(batches):
        import numpy as np
        import pandas as pd

        cent = {s: np.asarray(m, dtype=np.int64) for s, m in cent_by_s.items()}
        cids = {s: np.asarray(v, dtype=np.int64) for s, v in cids_by_s.items()}
        for pdf in batches:
            if pdf.empty:
                continue
            svals = pdf["s"].to_numpy()
            vids = pdf["vec_id"].to_numpy()
            X = np.stack(pdf["subv"].to_numpy()).astype(np.int64, copy=False)
            out_v = np.empty(len(pdf), dtype=np.int64)
            out_s = np.empty(len(pdf), dtype=np.int64)
            out_c = np.empty(len(pdf), dtype=np.int64)
            pos = 0
            for s in np.unique(svals):
                mask = svals == s
                C = cent[int(s)]
                Xs = X[mask]
                ipv = np.einsum("ij,ij->i", Xs, Xs)
                ipc = np.einsum("ij,ij->i", C, C)
                d = ipv[:, None] + ipc[None, :] - 2 * (Xs @ C.T)
                a = np.argmin(d, axis=1)
                n = int(mask.sum())
                out_v[pos : pos + n] = vids[mask]
                out_s[pos : pos + n] = s
                out_c[pos : pos + n] = cids[int(s)][a]
                pos += n
            yield pd.DataFrame(
                {out_col: out_v[:pos], "s": out_s[:pos], "cid": out_c[:pos]}
            )

    return fn


def _cent_maps(rows):
    """[(s, cid, carr)] -> ({s: [carr...]}, {s: [cid...]}) with cids
    ascending per s (the argmin tie-break contract)."""
    cent_by_s: dict[int, list] = {}
    cids_by_s: dict[int, list] = {}
    for s, cid, carr in sorted(rows):
        cent_by_s.setdefault(int(s), []).append([int(x) for x in carr])
        cids_by_s.setdefault(int(s), []).append(int(cid))
    return cent_by_s, cids_by_s


def _pq_lloyd_codes_qdist(
    spark, sf_dir, cent, sub=None
) -> tuple[DataFrame, DataFrame]:
    """Encode candidates against the final codebook and build the
    per-query ADC lookup table.

    r13 rendering: the candidate encode is ONE streaming mapInPandas
    argmin pass (the old broadcast join expanded the corpus k-fold
    through the interpreted zip_with L2 — the same cost the training
    kernel removed); the per-query table is computed DRIVER-SIDE from
    a bounded collect (queries are vec_id < 3 → at most 3 x 8 subvector
    rows) in exact Python ints and shipped back as a VALUES
    LocalRelation. Values bit-identical to the old join rendering:
    same int64 distances, same lowest-cid tie-break."""
    cent_rows = [
        (int(r["s"]), int(r["cid"]), [int(x) for x in r["carr"]])
        for r in cent.collect()
    ]
    cent_by_s, cids_by_s = _cent_maps(cent_rows)
    if sub is None:
        sub = _sub_e6(spark, sf_dir)
    codes = sub.filter(F.col("vec_id") >= 3).mapInPandas(
        _lloyd_encode_kernel(cent_by_s, cids_by_s, "neighbor_id"),
        "neighbor_id long, s long, cid long",
    )
    qrows = sub.filter(F.col("vec_id") < 3).collect()
    qvals = ", ".join(
        f"({int(q['vec_id'])}, {s}, {cid}, "
        f"{sum((int(x) - int(c)) ** 2 for x, c in zip(q['subv'], carr))})"
        for q in qrows
        for s, cid, carr in cent_rows
        if int(q["s"]) == s
    )
    if not qvals:  # degenerate: no query vectors in the corpus
        qdist = spark.range(0).select(
            F.col("id").alias("query_id"),
            F.col("id").alias("s"),
            F.col("id").alias("cid"),
            F.col("id").alias("d"),
        )
    else:
        qdist = spark.sql(
            "SELECT CAST(query_id AS BIGINT) AS query_id, "
            "CAST(s AS BIGINT) AS s, CAST(cid AS BIGINT) AS cid, "
            "CAST(d AS BIGINT) AS d "
            f"FROM (VALUES {qvals}) AS t(query_id, s, cid, d)"
        )
    return codes, qdist


def _pq_lloyd_shortlist_df(spark, sf_dir) -> DataFrame:
    """(query_id, neighbor_id, adc_d, arank <= sl) over the FULL
    candidate set — the Lloyd-PQ twin of ``_pq_adc_shortlist``."""
    n_cand = _emb_cand_n(spark, sf_dir)
    sl = _pq_lloyd_shortlist_depth(n_cand)
    # NOT checkpoint-shared (r14, measured): a lazily-checkpointed
    # shared quantize pass REGRESSED the family (ivfpq_topk 3.6->5.8,
    # pq_knn_rerank +28% in the mid-round bench on a faster host) —
    # serializing/rereading the array<long> rows costs more than
    # re-running the columnar scan + quantize per action, the same
    # array-payload lesson as the r13 kmeans cache attempts. Each
    # consumer recomputes the cheap scan+quantize instead.
    sub = _sub_e6(spark, sf_dir)
    cent = _pq_lloyd_codebook(spark, sf_dir, sub=sub)
    codes, qdist = _pq_lloyd_codes_qdist(spark, sf_dir, cent, sub=sub)
    adc = (
        codes.join(F.broadcast(qdist), ["s", "cid"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d").cast("bigint").alias("adc_d"))
    )
    aw = Window.partitionBy("query_id").orderBy(F.asc("adc_d"), F.asc("neighbor_id"))
    return adc.withColumn("arank", F.row_number().over(aw)).filter(
        F.col("arank") <= sl
    )


def _pq_lloyd_base_ctes(
    k: int = _PQ_LLOYD_K, iters: int = _PQ_LLOYD_ITERS, pinned=None
) -> str:
    """DuckDB CTE block ending in ``codes``/``qdist`` — the bit-exact
    oracle twin of the Spark Lloyd-PQ pipeline above, via the
    vectorized inner-product expansion. With ``pinned`` (the committed
    codebook rows for a corpus above _LLOYD_SQL_CAP), the training
    chain (seeds/cent0/asg/cm/cent) is replaced by one literal-VALUES
    ``cent{iters}`` and the oracle verifies encode + ADC downstream.

    Exactness audit (int64-valued DOUBLEs stay exact below 2^53):
    element |x| <= ~6e6 micro-units, ipv = sum of 8 squares <= 2.9e14,
    d = ipv+ipc-2<v,c> <= 1.2e15, all < 9e15; the ADC sum over 8
    subspaces runs in BIGINT after the cast."""
    parts = [
        _E_CTE.replace("e AS (", "e AS MATERIALIZED (") + ",",
        """
subx AS MATERIALIZED (
    SELECT vec_id, CAST(s AS BIGINT) AS s,
           list_transform(list_slice(emb, s * 8 + 1, s * 8 + 8),
                          x -> round(x * 1000000))::DOUBLE[8] AS subv
    FROM e, range(8) t(s)
),
subi AS MATERIALIZED (
    SELECT vec_id, s, subv, array_inner_product(subv, subv) AS ipv FROM subx
),""",
    ]
    if pinned is not None:
        parts.append(_pinned_cent_cte(f"cent{iters}", pinned) + ",")
    else:
        parts.append(
            f"""
seeds AS (SELECT DISTINCT vec_id FROM e WHERE vec_id >= 3 ORDER BY vec_id LIMIT {k}),
cent0 AS MATERIALIZED (
    -- carr: LIST copy for the empty-cluster coalesce (DuckDB cannot
    -- CASE/COALESCE fixed arrays); carrf: DOUBLE[8] for inner products
    SELECT v.vec_id AS cid, v.s, v.subv::DOUBLE[] AS carr, v.subv AS carrf,
           v.ipv AS ipc
    FROM subi v JOIN seeds sd ON sd.vec_id = v.vec_id
),"""
        )
    for t in range(1, iters + 1) if pinned is None else ():
        parts.append(
            f"""
asg{t} AS MATERIALIZED (
    SELECT vec_id, s, cid FROM (
        SELECT v.vec_id, v.s, c.cid,
               row_number() OVER (PARTITION BY v.vec_id, v.s
                   ORDER BY CAST(v.ipv + c.ipc
                             - 2 * array_inner_product(v.subv, c.carrf) AS BIGINT) ASC,
                            c.cid ASC) AS rn
        FROM subi v JOIN cent{t - 1} c ON c.s = v.s
        WHERE v.vec_id >= 3)
    WHERE rn = 1
),
cm{t} AS MATERIALIZED (
    SELECT a.s, a.cid, j.j,
           round(CAST(sum(v.subv[j.j + 1]) AS DOUBLE) / count(*)) AS c
    FROM asg{t} a JOIN subi v USING (vec_id, s), range(8) j(j)
    GROUP BY 1, 2, 3
),
cent{t} AS MATERIALIZED (
    SELECT s, cid, carr, carr::DOUBLE[8] AS carrf,
           array_inner_product(carr::DOUBLE[8], carr::DOUBLE[8]) AS ipc FROM (
        SELECT p.s, p.cid, coalesce(m.carr, p.carr) AS carr
        FROM cent{t - 1} p LEFT JOIN (
            SELECT s, cid, array_agg(c ORDER BY j) AS carr
            FROM cm{t} GROUP BY s, cid) m USING (s, cid))
),""",
        )
    # codes: STREAMING argmin, not a materialized dist + window. The
    # old ``dist AS MATERIALIZED`` was candidates x codebook rows (1G
    # at sf100 — 50-80 GB of DuckDB temp, disk-exhausting); a plain
    # min over the exact composite key d * 2^31 + cid (d >= 0 exact
    # integer micro-units <= 1.2e15, cid a vec_id < 2^31; product fits
    # int128) pipelines the join into a 16M-group hash aggregate with
    # no sort and no temp. Identical results: min of the composite ==
    # argmin by (d ASC, cid ASC).
    parts.append(
        f"""
codes AS MATERIALIZED (
    SELECT v.vec_id AS neighbor_id, v.s,
           CAST(min(CAST(CAST(v.ipv + c.ipc - 2 * array_inner_product(v.subv, c.carrf) AS BIGINT) AS HUGEINT)
                    * 2147483648 + c.cid) % 2147483648 AS BIGINT) AS cid
    FROM subi v JOIN cent{iters} c ON c.s = v.s
    WHERE v.vec_id >= 3
    GROUP BY v.vec_id, v.s
),
qdist AS MATERIALIZED (
    SELECT v.vec_id AS query_id, v.s, c.cid,
           CAST(v.ipv + c.ipc - 2 * array_inner_product(v.subv, c.carrf) AS BIGINT) AS d
    FROM subi v JOIN cent{iters} c ON c.s = v.s
    WHERE v.vec_id < 3
)""",
    )
    return "".join(parts)


def _pq_lloyd_ctes(
    sl: int, k: int = _PQ_LLOYD_K, iters: int = _PQ_LLOYD_ITERS, pinned=None
) -> str:
    """Base CTEs + full-candidate ADC shortlist (the Lloyd twin of
    ``_PQ_SHORTLIST_CTES``'s tail)."""
    return (
        _pq_lloyd_base_ctes(k, iters, pinned=pinned)
        + f""",
adc AS MATERIALIZED (
    SELECT qd.query_id, cv.neighbor_id, CAST(sum(qd.d) AS BIGINT) AS adc_d
    FROM codes cv JOIN qdist qd ON qd.s = cv.s AND qd.cid = cv.cid
    GROUP BY 1, 2
),
shortlist AS MATERIALIZED (
    SELECT query_id, neighbor_id, adc_d,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY adc_d ASC, neighbor_id ASC) AS arank
    FROM adc
)
-- shortlist depth {sl}
"""
    )


def _pinned_or_none(n: int, kind: str, sf_dir: str):
    """Resolve the pinned-oracle decision shared by the five
    Lloyd-family callable oracles: below the cap run the full in-SQL
    Lloyd (pinned=None, byte-identical to pre-r11); above it require
    the committed codebook pin. Returns (use_pin, rows) where
    use_pin=True with rows=None means "no pin yet" -> the caller
    degrades to rows-only until the first Spark run writes it."""
    if n <= _LLOYD_SQL_CAP:
        return False, None
    return True, _read_codebook_pin(sf_dir, kind)


def _pq_lloyd_recall_oracle(sf_dir: str) -> str | None:
    n = _embeddings_candidate_count(sf_dir)
    if n is None:  # unreadable corpus -> rows-only fallback
        return None
    use_pin, pinned = _pinned_or_none(n, "raw", sf_dir)
    if use_pin and pinned is None:
        return None  # no pin yet for this large corpus -> rows-only
    sl = _pq_lloyd_shortlist_depth(n)
    return (
        "WITH "
        + _pq_lloyd_ctes(sl, pinned=pinned)
        + f""",
exact5 AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY round({_cos_sql('q.emb', 'c.emb')}, 6) DESC,
                                       c.vec_id ASC) AS rk
    FROM e q JOIN e c ON q.vec_id < 3 AND c.vec_id >= 3
)
SELECT f.query_id,
       CAST(count(s.neighbor_id) AS BIGINT) AS hits_at_5,
       round(count(s.neighbor_id) / 5.0, 4) AS recall_at_5
FROM (SELECT query_id, neighbor_id FROM exact5 WHERE rk <= 5) f
LEFT JOIN (SELECT query_id, neighbor_id FROM shortlist WHERE arank <= {sl}) s
  ON s.query_id = f.query_id AND s.neighbor_id = f.neighbor_id
GROUP BY f.query_id
"""
    )


@register(
    "pq_lloyd_recall_eval",
    oracle=_pq_lloyd_recall_oracle,
    tags=("similarity", "ann", "quantization", "pq", "lloyd", "eval"),
)
def pq_lloyd_recall_eval(spark, sf_dir):
    """The Lloyd-PQ row on the family recall datasheet: how many of
    each query's exact cosine top-5 survive the scale-adaptive ADC
    shortlist. This is the r8 "move the PQ recall dial" deliverable —
    codebook k=64 decoupled from the 10 corpus labels, 2 deterministic
    Lloyd iterations, shortlist max(64, 0.9*sqrt(n)): recall@5 >= 0.6
    for EVERY query on every fixture vs v1's 0.0/0.2/0.6 (PERF.md dial
    table prices the surrounding grid points).

    Scale posture identical to pq_recall_eval: broadcast codebook +
    lookup table, candidates touched only through their 8-code
    representation, exact arm priced separately as the measurement."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    c = e.filter(F.col("vec_id") >= 3).select(
        F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("cemb")
    )
    ew = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(cosine(F.col("qemb"), F.col("cemb")), 6)), F.asc("neighbor_id")
    )
    exact5 = (
        c.crossJoin(F.broadcast(q))
        .withColumn("rk", F.row_number().over(ew))
        .filter(F.col("rk") <= 5)
        .select("query_id", "neighbor_id")
    )
    hits = _pq_lloyd_shortlist_df(spark, sf_dir).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        exact5.join(hits, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("hit").cast("bigint").alias("hits_at_5"),
            F.round(F.count("hit") / F.lit(5.0), 4).alias("recall_at_5"),
        )
    )


def _coarse_cent(spark, sf_dir) -> DataFrame:
    """(cl, cemb, cnorm) per-label coarse centroids — elementwise
    round(avg, 6), the engine-parity float boundary (6dp absorbs
    summation-order noise; x1e6 then recovers exact integer micro-units
    on both engines for the residual family)."""
    e = _emb_n(spark, sf_dir)
    pos = e.select("label", F.posexplode("emb").alias("i", "x"))
    centd = pos.groupBy("label", "i").agg(F.round(F.avg("x"), 6).alias("c"))
    return (
        centd.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("i", "c"))).alias("karr"))
        .select(F.col("label").alias("cl"), F.col("karr.c").alias("cemb"))
        .withColumn("cnorm", F.sqrt(dot(F.col("cemb"), F.col("cemb"))))
    )


def _coarse_cells_and_routes(spark, sf_dir, nprobe: int):
    """Train per-label coarse centroids (the ivf_build_probe build
    step), assign candidates to their nearest cell, route each query to
    its nprobe nearest cells. Returns (cells, routes) DataFrames."""
    e = _emb_n(spark, sf_dir)
    cent = _coarse_cent(spark, sf_dir)
    scored = e.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "cl",
        _sim(F.col("emb"), F.col("norm"), F.col("cemb"), F.col("cnorm")).alias("cs"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cs"), F.asc("cl"))
    ranked = scored.withColumn("rn", F.row_number().over(w))
    cells = (
        ranked.filter((F.col("rn") == 1) & (F.col("vec_id") >= 3))
        .select(F.col("vec_id").alias("neighbor_id"), F.col("cl").alias("cell"))
    )
    routes = (
        ranked.filter((F.col("rn") <= nprobe) & (F.col("vec_id") < 3))
        .select(F.col("vec_id").alias("query_id"), F.col("cl").alias("cell"))
    )
    return cells, routes


def _ivfpq_shortlist_df(spark, sf_dir, sl: int) -> DataFrame:
    """(query_id, neighbor_id, adc_d, arank) with ADC restricted to the
    routed cells' members — the IVF-PQ composition core."""
    cells, routes = _coarse_cells_and_routes(spark, sf_dir, _IVFPQ_NPROBE)
    pairs = routes.join(cells, "cell").select("query_id", "neighbor_id")
    # not checkpoint-shared — measured worse; see _pq_lloyd_shortlist_df
    sub = _sub_e6(spark, sf_dir)
    cent = _pq_lloyd_codebook(spark, sf_dir, sub=sub)
    codes, qdist = _pq_lloyd_codes_qdist(spark, sf_dir, cent, sub=sub)
    adcr = (
        codes.join(F.broadcast(pairs), "neighbor_id")
        .join(F.broadcast(qdist), ["query_id", "s", "cid"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d").cast("bigint").alias("adc_d"))
    )
    aw = Window.partitionBy("query_id").orderBy(F.asc("adc_d"), F.asc("neighbor_id"))
    return adcr.withColumn("arank", F.row_number().over(aw)).filter(
        F.col("arank") <= sl
    )


def _ivfpq_ctes(sl: int, nprobe: int = _IVFPQ_NPROBE, pinned=None) -> str:
    """Base Lloyd-PQ CTEs + coarse routing + cell-restricted ADC
    shortlist (``slst``)."""
    return (
        _pq_lloyd_base_ctes(pinned=pinned)
        + f""",
pos AS (SELECT label, vec_id, i, emb[i + 1] AS x FROM e, range(64) t(i)),
centd AS (SELECT label, i, round(avg(x), 6) AS c FROM pos GROUP BY label, i),
ccent AS MATERIALIZED (
    SELECT label AS cl, array_agg(c ORDER BY i) AS cemb FROM centd GROUP BY label
),
cellr AS MATERIALIZED (
    SELECT vec_id, cl,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY {_cos_sql('v.emb', 'c.cemb')} DESC,
                                       c.cl ASC) AS rn
    FROM e v CROSS JOIN ccent c
),
pairs AS MATERIALIZED (
    SELECT r.vec_id AS query_id, v.vec_id AS neighbor_id
    FROM (SELECT vec_id, cl FROM cellr WHERE vec_id < 3 AND rn <= {nprobe}) r
    JOIN (SELECT vec_id, cl FROM cellr WHERE vec_id >= 3 AND rn = 1) v
      ON v.cl = r.cl
),
adcr AS MATERIALIZED (
    SELECT p.query_id, p.neighbor_id, CAST(sum(qd.d) AS BIGINT) AS adc_d
    FROM pairs p
    JOIN codes cv ON cv.neighbor_id = p.neighbor_id
    JOIN qdist qd ON qd.query_id = p.query_id AND qd.s = cv.s AND qd.cid = cv.cid
    GROUP BY 1, 2
),
slst AS MATERIALIZED (
    SELECT query_id, neighbor_id, adc_d,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY adc_d ASC, neighbor_id ASC) AS arank
    FROM adcr
)
-- shortlist depth {sl}
"""
    )


def _ivfpq_topk_oracle(sf_dir: str) -> str | None:
    n = _embeddings_candidate_count(sf_dir)
    if n is None:  # unreadable corpus -> rows-only fallback
        return None
    use_pin, pinned = _pinned_or_none(n, "raw", sf_dir)
    if use_pin and pinned is None:
        return None
    sl = _pq_lloyd_shortlist_depth(n)
    return (
        "WITH "
        + _ivfpq_ctes(sl, pinned=pinned)
        + f""",
rerank AS (
    SELECT sl.query_id, sl.neighbor_id, sl.adc_d,
           round({_cos_sql('qe.emb', 'ce.emb')}, 6) AS cos_sim
    FROM slst sl
    JOIN e qe ON qe.vec_id = sl.query_id
    JOIN e ce ON ce.vec_id = sl.neighbor_id
    WHERE sl.arank <= {sl}
)
SELECT query_id, neighbor_id, adc_d, cos_sim,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id ASC) AS INTEGER) AS rank
FROM rerank QUALIFY rank <= 5
"""
    )


@register(
    "ivfpq_topk",
    oracle=_ivfpq_topk_oracle,
    tags=("similarity", "ann", "ivf", "pq", "lloyd", "topk"),
)
def ivfpq_topk(spark, sf_dir):
    """IVF-PQ — the production ANN composition (r8 verdict #2): coarse
    per-label centroids route each query to its nprobe=3 nearest cells;
    ONLY those cells' members are ADC-scored through their 8-code
    Lloyd-PQ representation; the scale-adaptive shortlist is reranked
    with exact float cosine and top-5 returned.

    Scale posture — this is the shape a 100 TB vector store actually
    serves: the coarse routing prunes the candidate set to
    nprobe/n_cells of the corpus BEFORE any distance work; ADC then
    touches one byte-per-subspace codes, not vectors; full floats are
    fetched for |shortlist| rows only. Everything small (codebook,
    routing table, per-query ADC lookup) broadcasts; the only
    corpus-sized relations are the code table and the one partial-agg
    sum per (query, neighbor). Recall vs brute force is priced by
    ``ivfpq_recall_eval`` next door — routing loss compounds with
    quantization loss, which is exactly the dial a deployment tunes
    with nprobe."""
    n_cand = _emb_cand_n(spark, sf_dir)
    sl = _pq_lloyd_shortlist_depth(n_cand)
    e = _emb(spark, sf_dir)
    short = _ivfpq_shortlist_df(spark, sf_dir, sl)
    qe = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_fl")
    )
    rr = (
        e.join(F.broadcast(short), e.vec_id == short.neighbor_id)
        .join(F.broadcast(qe), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            "adc_d",
            F.round(cosine(F.col("q_fl"), F.col("emb")), 6).alias("cos_sim"),
        )
    )
    rw = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        rr.withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id",
            "neighbor_id",
            "adc_d",
            "cos_sim",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def _ivfpq_recall_oracle(sf_dir: str) -> str | None:
    n = _embeddings_candidate_count(sf_dir)
    if n is None:  # unreadable corpus -> rows-only fallback
        return None
    use_pin, pinned = _pinned_or_none(n, "raw", sf_dir)
    if use_pin and pinned is None:
        return None
    sl = _pq_lloyd_shortlist_depth(n)
    return (
        "WITH "
        + _ivfpq_ctes(sl, pinned=pinned)
        + f""",
exact5 AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY round({_cos_sql('q.emb', 'c.emb')}, 6) DESC,
                                       c.vec_id ASC) AS rk
    FROM e q JOIN e c ON q.vec_id < 3 AND c.vec_id >= 3
)
SELECT f.query_id,
       CAST(count(s.neighbor_id) AS BIGINT) AS hits_at_5,
       round(count(s.neighbor_id) / 5.0, 4) AS recall_at_5
FROM (SELECT query_id, neighbor_id FROM exact5 WHERE rk <= 5) f
LEFT JOIN (SELECT query_id, neighbor_id FROM slst WHERE arank <= {sl}) s
  ON s.query_id = f.query_id AND s.neighbor_id = f.neighbor_id
GROUP BY f.query_id
"""
    )


@register(
    "ivfpq_recall_eval",
    oracle=_ivfpq_recall_oracle,
    tags=("similarity", "ann", "ivf", "pq", "lloyd", "eval"),
)
def ivfpq_recall_eval(spark, sf_dir):
    """IVF-PQ's row on the family recall datasheet: exact cosine top-5
    (over ALL candidates, not just probed cells) vs the cell-restricted
    ADC shortlist — so the number prices the COMPOUND loss of coarse
    routing x quantization that a production deployment actually pays.
    Compare against ``pq_lloyd_recall_eval`` (no routing) to read the
    routing loss alone, and against ``ivf_recall_eval`` (no
    quantization) for the other axis."""
    e = _emb(spark, sf_dir)
    n_cand = _emb_cand_n(spark, sf_dir)
    sl = _pq_lloyd_shortlist_depth(n_cand)
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    c = e.filter(F.col("vec_id") >= 3).select(
        F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("cemb")
    )
    ew = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(cosine(F.col("qemb"), F.col("cemb")), 6)), F.asc("neighbor_id")
    )
    exact5 = (
        c.crossJoin(F.broadcast(q))
        .withColumn("rk", F.row_number().over(ew))
        .filter(F.col("rk") <= 5)
        .select("query_id", "neighbor_id")
    )
    hits = _ivfpq_shortlist_df(spark, sf_dir, sl).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        exact5.join(hits, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("hit").cast("bigint").alias("hits_at_5"),
            F.round(F.count("hit") / F.lit(5.0), 4).alias("recall_at_5"),
        )
    )


# --------------------------------------------------------------------------
# Residual IVF-PQ (r9 verdict #4): the production composition PQ-encodes
# the RESIDUAL after coarse-centroid subtraction (Jegou et al., "Product
# Quantization for Nearest Neighbor Search", §IV) — residuals are
# smaller and more isotropic than raw vectors, so the same code budget
# buys lower quantization error and higher recall at fixed nprobe/
# shortlist. Exactness: coarse centroids are round(avg, 6) (the one
# engine-parity float boundary, inherited from the IVF family), so both
# the vector and the centroid recover EXACT int64 micro-units via
# round(x * 1e6), the residual is an int64 difference, and the whole
# Lloyd/ADC pipeline downstream is the same integer-exact machinery as
# the raw-vector family. |residual| <= ~1.2e7 micro-units -> an 8-term
# squared distance tops out near 4.6e15 < 2^53, still exact in the
# DOUBLE-typed oracle path.

_RES_SUB_EXPR = (
    "transform(sequence(0, 7), s -> struct(CAST(s AS BIGINT) AS s,"
    " zip_with(slice(emb, s * 8 + 1, 8), slice(cemb, s * 8 + 1, 8),"
    " (x, c) -> CAST(round(x * 1000000) AS BIGINT)"
    " - CAST(round(c * 1000000) AS BIGINT)) AS subv))"
)


def _residual_subs(spark, sf_dir, nprobe: int):
    """(cells, routes, csub, qsub): cell assignments, query routes, and
    the residual subvector relations — candidates relative to their OWN
    cell's centroid, queries relative to EACH routed cell's centroid
    (nprobe residuals per query; the ADC table is per (query, cell))."""
    # localCheckpoint (same caveat as operators/skew.py: non-reliable
    # blocks, single-node harness): cells/routes carry the corpus-wide
    # routing window and csub feeds EVERY Lloyd iteration plus the
    # final encode — without truncation the residual family recomputes
    # that lineage 2*iters+2 times (measured 6x slower than the
    # raw-vector composition at sf1 before this pin). r13: ONE
    # checkpoint of the union-filtered ranking instead of two separate
    # jobs; cells/routes are filters over the materialized rows.
    e = _emb_n(spark, sf_dir)
    cent0 = _coarse_cent(spark, sf_dir)
    scored = e.crossJoin(F.broadcast(cent0)).select(
        "vec_id",
        "cl",
        _sim(F.col("emb"), F.col("norm"), F.col("cemb"), F.col("cnorm")).alias("cs"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cs"), F.asc("cl"))
    ranked = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(
            ((F.col("rn") == 1) & (F.col("vec_id") >= 3))
            | ((F.col("rn") <= nprobe) & (F.col("vec_id") < 3))
        )
        .select("vec_id", "cl", "rn")
        # eager (r14: a lazy variant was measured WORSE in the
        # mid-round bench — ivfpq_residual_topk +17% on a faster host;
        # the dedicated materialization job keeps the routing window's
        # layout warm for the four consumers)
        .localCheckpoint(eager=True)
    )
    cells = ranked.filter(F.col("vec_id") >= 3).select(
        F.col("vec_id").alias("neighbor_id"), F.col("cl").alias("cell")
    )
    routes = ranked.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("cl").alias("cell")
    )
    cent = _coarse_cent(spark, sf_dir).select("cl", "cemb")
    e = _emb(spark, sf_dir)
    csub = (
        e.join(cells, e.vec_id == cells.neighbor_id)
        .join(F.broadcast(cent), F.col("cell") == F.col("cl"))
        .select("vec_id", F.explode(F.expr(_RES_SUB_EXPR)).alias("t"))
        .select("vec_id", "t.s", "t.subv")
        # AQE coalesces this small post-join shuffle to ONE partition,
        # but every downstream Lloyd round expands each row k-fold for
        # the argmin — re-spread BEFORE the checkpoint pins the layout
        # or the whole training loop runs on a single core (measured
        # 34 s vs 14 s for the same-shape raw-vector loop at sf1).
        .repartition(spark.sparkContext.defaultParallelism, "vec_id")
        # eager (see `ranked` above — the lazy variant measured worse)
        .localCheckpoint(eager=True)
    )
    qsub = (
        e.join(F.broadcast(routes), e.vec_id == routes.query_id)
        .join(F.broadcast(cent), F.col("cell") == F.col("cl"))
        .select("query_id", "cell", F.explode(F.expr(_RES_SUB_EXPR)).alias("t"))
        .select("query_id", "cell", "t.s", "t.subv")
    )
    return cells, routes, csub, qsub


def _ivfpq_residual_shortlist_df(spark, sf_dir, sl: int) -> DataFrame:
    """(query_id, neighbor_id, adc_d, arank <= sl) with residual codes:
    candidates encode (v - centroid(cell(v))); each query builds one
    ADC lookup PER ROUTED CELL from (q - centroid(cell)); the ADC join
    matches on the candidate's cell so distances always compare
    residuals in the same local frame."""
    cells, routes, csub, qsub = _residual_subs(spark, sf_dir, _IVFPQ_NPROBE)
    cent = _lloyd_codebook_on(csub, _PQ_LLOYD_K, _PQ_LLOYD_ITERS)
    n_pin = _embeddings_candidate_count(sf_dir)
    if n_pin is not None:  # pinned-oracle artifact (no-op below cap)
        _write_codebook_pin(cent, sf_dir, "residual", n_pin)
    # r13: candidate encode as the streaming argmin kernel; the
    # per-(query, cell) ADC table from a bounded collect (<= queries x
    # nprobe x 8 rows) in exact Python ints — same rendering as
    # _pq_lloyd_codes_qdist, values bit-identical to the old joins.
    cent_rows = [
        (int(r["s"]), int(r["cid"]), [int(x) for x in r["carr"]])
        for r in cent.collect()
    ]
    cent_by_s, cids_by_s = _cent_maps(cent_rows)
    codes = csub.select("vec_id", "s", "subv").mapInPandas(
        _lloyd_encode_kernel(cent_by_s, cids_by_s, "neighbor_id"),
        "neighbor_id long, s long, cid long",
    )
    qrows = qsub.collect()
    # cell is the int32 embedding label: emit it as an UNQUOTED integer
    # literal cast to INT so the 4-key adcr join below matches types
    # exactly instead of leaning on implicit string/int coercion
    # (ADVICE r13), and give the empty-qsub degenerate the same guarded
    # branch as the raw-PQ twin (`FROM (VALUES )` is a parse error).
    qvals = ", ".join(
        f"({int(q['query_id'])}, {int(q['cell'])}, {s}, {cid}, "
        f"{sum((int(x) - int(c)) ** 2 for x, c in zip(q['subv'], carr))})"
        for q in qrows
        for s, cid, carr in cent_rows
        if int(q["s"]) == s
    )
    if not qvals:  # degenerate: no query vectors in the corpus
        qdist = spark.range(0).select(
            F.col("id").alias("query_id"),
            F.col("id").cast("int").alias("cell"),
            F.col("id").alias("s"),
            F.col("id").alias("cid"),
            F.col("id").alias("d"),
        )
    else:
        qdist = spark.sql(
            "SELECT CAST(query_id AS BIGINT) AS query_id, "
            "CAST(cell AS INT) AS cell, "
            "CAST(s AS BIGINT) AS s, CAST(cid AS BIGINT) AS cid, "
            "CAST(d AS BIGINT) AS d "
            f"FROM (VALUES {qvals}) AS t(query_id, cell, s, cid, d)"
        )
    pairs = routes.join(cells, "cell").select("query_id", "neighbor_id", "cell")
    adcr = (
        codes.join(F.broadcast(pairs), "neighbor_id")
        .join(F.broadcast(qdist), ["query_id", "cell", "s", "cid"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d").cast("bigint").alias("adc_d"))
    )
    aw = Window.partitionBy("query_id").orderBy(F.asc("adc_d"), F.asc("neighbor_id"))
    return adcr.withColumn("arank", F.row_number().over(aw)).filter(
        F.col("arank") <= sl
    )


def _ivfpq_residual_base_ctes(
    nprobe: int = _IVFPQ_NPROBE,
    k: int = _PQ_LLOYD_K,
    iters: int = _PQ_LLOYD_ITERS,
    pinned=None,
) -> str:
    """DuckDB CTE block ending in ``rslst`` — the bit-exact oracle twin
    of the residual pipeline above (coarse routing + residual
    subvectors + Lloyd codebook + per-(query, cell) ADC). With
    ``pinned``, the residual training chain (rseeds/rcent0/rasg/rcm/
    rcent) collapses to one literal-VALUES ``rcent{iters}`` — routing,
    residual assembly, encode and ADC stay verified in SQL."""
    parts = [
        _E_CTE.replace("e AS (", "e AS MATERIALIZED (") + ",",
        f"""
pos AS (SELECT label, vec_id, i, emb[i + 1] AS x FROM e, range(64) t(i)),
centd AS (SELECT label, i, round(avg(x), 6) AS c FROM pos GROUP BY label, i),
ccent AS MATERIALIZED (
    SELECT label AS cl, array_agg(c ORDER BY i) AS cemb FROM centd GROUP BY label
),
cellr AS MATERIALIZED (
    SELECT vec_id, cl,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY {_cos_sql('v.emb', 'c.cemb')} DESC,
                                       c.cl ASC) AS rn
    FROM e v CROSS JOIN ccent c
),
cells2 AS MATERIALIZED (SELECT vec_id, cl FROM cellr WHERE vec_id >= 3 AND rn = 1),
routes2 AS MATERIALIZED (
    SELECT vec_id, cl FROM cellr WHERE vec_id < 3 AND rn <= {nprobe}
),
rpos AS (
    SELECT v.vec_id, t.i,
           round(v.emb[t.i + 1] * 1000000)
           - round(cc.cemb[t.i + 1] * 1000000) AS rx
    FROM e v JOIN cells2 s2 ON s2.vec_id = v.vec_id
    JOIN ccent cc ON cc.cl = s2.cl, range(64) t(i)
),
rsubi AS MATERIALIZED (
    SELECT vec_id, s, subv, array_inner_product(subv, subv) AS ipv FROM (
        SELECT vec_id, CAST(i // 8 AS BIGINT) AS s,
               (array_agg(rx ORDER BY i))::DOUBLE[8] AS subv
        FROM rpos GROUP BY 1, 2)
),
qpos AS (
    SELECT r.vec_id, r.cl, t.i,
           round(v.emb[t.i + 1] * 1000000)
           - round(cc.cemb[t.i + 1] * 1000000) AS rx
    FROM routes2 r JOIN e v ON v.vec_id = r.vec_id
    JOIN ccent cc ON cc.cl = r.cl, range(64) t(i)
),
qsubi AS MATERIALIZED (
    SELECT vec_id, cl, s, subv, array_inner_product(subv, subv) AS ipv FROM (
        SELECT vec_id, cl, CAST(i // 8 AS BIGINT) AS s,
               (array_agg(rx ORDER BY i))::DOUBLE[8] AS subv
        FROM qpos GROUP BY 1, 2, 3)
),""",
    ]
    if pinned is not None:
        parts.append(_pinned_cent_cte(f"rcent{iters}", pinned) + ",")
    else:
        parts.append(
            f"""
rseeds AS (SELECT DISTINCT vec_id FROM rsubi ORDER BY vec_id LIMIT {k}),
rcent0 AS MATERIALIZED (
    SELECT v.vec_id AS cid, v.s, v.subv::DOUBLE[] AS carr, v.subv AS carrf,
           v.ipv AS ipc
    FROM rsubi v JOIN rseeds sd ON sd.vec_id = v.vec_id
),"""
        )
    for t in range(1, iters + 1) if pinned is None else ():
        parts.append(
            f"""
rasg{t} AS MATERIALIZED (
    SELECT vec_id, s, cid FROM (
        SELECT v.vec_id, v.s, c.cid,
               row_number() OVER (PARTITION BY v.vec_id, v.s
                   ORDER BY CAST(v.ipv + c.ipc
                             - 2 * array_inner_product(v.subv, c.carrf) AS BIGINT) ASC,
                            c.cid ASC) AS rn
        FROM rsubi v JOIN rcent{t - 1} c ON c.s = v.s)
    WHERE rn = 1
),
rcm{t} AS MATERIALIZED (
    SELECT a.s, a.cid, j.j,
           round(CAST(sum(v.subv[j.j + 1]) AS DOUBLE) / count(*)) AS c
    FROM rasg{t} a JOIN rsubi v USING (vec_id, s), range(8) j(j)
    GROUP BY 1, 2, 3
),
rcent{t} AS MATERIALIZED (
    SELECT s, cid, carr, carr::DOUBLE[8] AS carrf,
           array_inner_product(carr::DOUBLE[8], carr::DOUBLE[8]) AS ipc FROM (
        SELECT p.s, p.cid, coalesce(m.carr, p.carr) AS carr
        FROM rcent{t - 1} p LEFT JOIN (
            SELECT s, cid, array_agg(c ORDER BY j) AS carr
            FROM rcm{t} GROUP BY s, cid) m USING (s, cid))
),""",
        )
    # rcodes: streaming composite-min argmin (see _pq_lloyd_base_ctes'
    # codes CTE — same 1G-row materialized-window blowup at sf100,
    # same exact rewrite)
    parts.append(
        f"""
rcodes AS MATERIALIZED (
    SELECT v.vec_id AS neighbor_id, v.s,
           CAST(min(CAST(CAST(v.ipv + c.ipc - 2 * array_inner_product(v.subv, c.carrf) AS BIGINT) AS HUGEINT)
                    * 2147483648 + c.cid) % 2147483648 AS BIGINT) AS cid
    FROM rsubi v JOIN rcent{iters} c ON c.s = v.s
    GROUP BY v.vec_id, v.s
),
qdistr AS MATERIALIZED (
    SELECT q.vec_id AS query_id, q.cl, q.s, c.cid,
           CAST(q.ipv + c.ipc
                - 2 * array_inner_product(q.subv, c.carrf) AS BIGINT) AS d
    FROM qsubi q JOIN rcent{iters} c ON c.s = q.s
),
rpairs AS MATERIALIZED (
    SELECT r.vec_id AS query_id, v.vec_id AS neighbor_id, r.cl
    FROM routes2 r JOIN cells2 v ON v.cl = r.cl
),
radcr AS MATERIALIZED (
    SELECT p.query_id, p.neighbor_id, CAST(sum(qd.d) AS BIGINT) AS adc_d
    FROM rpairs p
    JOIN rcodes cv ON cv.neighbor_id = p.neighbor_id
    JOIN qdistr qd ON qd.query_id = p.query_id AND qd.cl = p.cl
                  AND qd.s = cv.s AND qd.cid = cv.cid
    GROUP BY 1, 2
),
rslst AS MATERIALIZED (
    SELECT query_id, neighbor_id, adc_d,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY adc_d ASC, neighbor_id ASC) AS arank
    FROM radcr
)""",
    )
    return "".join(parts)


def _ivfpq_residual_topk_oracle(sf_dir: str) -> str | None:
    n = _embeddings_candidate_count(sf_dir)
    if n is None:  # unreadable corpus -> rows-only fallback
        return None
    use_pin, pinned = _pinned_or_none(n, "residual", sf_dir)
    if use_pin and pinned is None:
        return None
    sl = _pq_lloyd_shortlist_depth(n)
    return (
        "WITH "
        + _ivfpq_residual_base_ctes(pinned=pinned)
        + f""",
rerank AS (
    SELECT sl.query_id, sl.neighbor_id, sl.adc_d,
           round({_cos_sql('qe.emb', 'ce.emb')}, 6) AS cos_sim
    FROM rslst sl
    JOIN e qe ON qe.vec_id = sl.query_id
    JOIN e ce ON ce.vec_id = sl.neighbor_id
    WHERE sl.arank <= {sl}
)
SELECT query_id, neighbor_id, adc_d, cos_sim,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id ASC) AS INTEGER) AS rank
FROM rerank QUALIFY rank <= 5
"""
    )


@register(
    "ivfpq_residual_topk",
    oracle=_ivfpq_residual_topk_oracle,
    tags=("similarity", "ann", "ivf", "pq", "residual", "topk"),
)
def ivfpq_residual_topk(spark, sf_dir):
    """Residual IVF-PQ top-5 — same routing, code budget, shortlist
    depth and rerank as ``ivfpq_topk``, but the PQ codebook is trained
    on and encodes coarse-centroid RESIDUALS (the production
    composition; see the section comment for why residuals recall
    better at equal budget). Scale posture unchanged from ivfpq_topk:
    routing prunes before any distance work, ADC touches 8 codes per
    candidate, full floats only for the shortlist; the one new relation
    (per-(query, cell) ADC lookup, nprobe x 8 x k rows) still
    broadcasts."""
    n_cand = _emb_cand_n(spark, sf_dir)
    sl = _pq_lloyd_shortlist_depth(n_cand)
    e = _emb(spark, sf_dir)
    short = _ivfpq_residual_shortlist_df(spark, sf_dir, sl)
    qe = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_fl")
    )
    rr = (
        e.join(F.broadcast(short), e.vec_id == short.neighbor_id)
        .join(F.broadcast(qe), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            "adc_d",
            F.round(cosine(F.col("q_fl"), F.col("emb")), 6).alias("cos_sim"),
        )
    )
    rw = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        rr.withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id",
            "neighbor_id",
            "adc_d",
            "cos_sim",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def _ivfpq_residual_recall_oracle(sf_dir: str) -> str | None:
    n = _embeddings_candidate_count(sf_dir)
    if n is None:  # unreadable corpus -> rows-only fallback
        return None
    use_pin, pinned = _pinned_or_none(n, "residual", sf_dir)
    if use_pin and pinned is None:
        return None
    sl = _pq_lloyd_shortlist_depth(n)
    return (
        "WITH "
        + _ivfpq_residual_base_ctes(pinned=pinned)
        + f""",
exact5 AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY round({_cos_sql('q.emb', 'c.emb')}, 6) DESC,
                                       c.vec_id ASC) AS rk
    FROM e q JOIN e c ON q.vec_id < 3 AND c.vec_id >= 3
)
SELECT f.query_id,
       CAST(count(s.neighbor_id) AS BIGINT) AS hits_at_5,
       round(count(s.neighbor_id) / 5.0, 4) AS recall_at_5
FROM (SELECT query_id, neighbor_id FROM exact5 WHERE rk <= 5) f
LEFT JOIN (SELECT query_id, neighbor_id FROM rslst WHERE arank <= {sl}) s
  ON s.query_id = f.query_id AND s.neighbor_id = f.neighbor_id
GROUP BY f.query_id
"""
    )


@register(
    "ivfpq_residual_recall_eval",
    oracle=_ivfpq_residual_recall_oracle,
    tags=("similarity", "ann", "ivf", "pq", "residual", "eval"),
)
def ivfpq_residual_recall_eval(spark, sf_dir):
    """Residual IVF-PQ's row on the family recall datasheet — exact
    cosine top-5 over ALL candidates vs the residual-coded,
    cell-restricted ADC shortlist, at the SAME nprobe and shortlist
    depth as ``ivfpq_recall_eval``, so the two rows isolate exactly
    the residual-encoding effect (PERF.md records the comparison)."""
    e = _emb(spark, sf_dir)
    n_cand = _emb_cand_n(spark, sf_dir)
    sl = _pq_lloyd_shortlist_depth(n_cand)
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    c = e.filter(F.col("vec_id") >= 3).select(
        F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("cemb")
    )
    ew = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(cosine(F.col("qemb"), F.col("cemb")), 6)),
        F.asc("neighbor_id"),
    )
    exact5 = (
        c.crossJoin(F.broadcast(q))
        .withColumn("rk", F.row_number().over(ew))
        .filter(F.col("rk") <= 5)
        .select("query_id", "neighbor_id")
    )
    hits = _ivfpq_residual_shortlist_df(spark, sf_dir, sl).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        exact5.join(hits, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("hit").cast("bigint").alias("hits_at_5"),
            F.round(F.count("hit") / F.lit(5.0), 4).alias("recall_at_5"),
        )
    )


# --------------------------------------------------------------------------
# Full-vector Lloyd k-means over document embeddings — the curation-side
# clustering primitive (topic balancing, SemDeDup cell discovery, mixture
# auditing all start from "k-means the corpus embeddings").

_KMEANS_K = 8
_KMEANS_ITERS = 3


def _emb_e6(spark, sf_dir) -> DataFrame:
    """(vec_id, label, v) with the FULL 64-d vector quantized to int64
    micro-units — the single float->int boundary of the k-means
    pipeline (same convention as the Lloyd-PQ family; element |x| <=
    ~1e6, so a 64-term squared distance tops out near 2^46 and every
    distance is exact in both BIGINT and DOUBLE)."""
    return (
        _emb(spark, sf_dir)
        .select(
            "vec_id",
            "label",
            F.expr(
                "transform(emb, x -> CAST(round(x * 1000000) AS BIGINT))"
            ).alias("v"),
        )
    )


def _kmeans_centroids_relational(
    spark, sf_dir, k: int = _KMEANS_K, iters: int = _KMEANS_ITERS
) -> DataFrame:
    """The original DataFrame rendering of the k-means Lloyd loop —
    kept as the reference arm for the kernel-equality pin
    (tests/test_operators.py, the Lloyd-PQ precedent): seed from the k
    lowest vec_ids, then `iters` Lloyd rounds of exact-integer argmin
    assignment + round(sum/count) coordinate means. Per round: ONE
    broadcast join (n x k rows, map-side), one vec_id-keyed partial-agg
    argmin, one (cid, j)-keyed mean. Each round's centroids are
    localCheckpoint-ed (eager)."""
    ev = _emb_e6(spark, sf_dir)
    seeds = ev.select("vec_id").orderBy("vec_id").limit(k)
    cent = (
        ev.join(F.broadcast(seeds), "vec_id")
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("carr"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        asg = (
            ev.crossJoin(F.broadcast(cent))
            .select("vec_id", "cid", _l2_int(F.col("v"), F.col("carr")).alias("d"))
            .groupBy("vec_id")
            .agg(F.min(F.struct("d", "cid")).alias("m"))
            .select("vec_id", F.col("m.cid").alias("cid"))
        )
        means = (
            asg.join(ev, "vec_id")
            .select("cid", F.posexplode("v").alias("j", "x"))
            .groupBy("cid", "j")
            .agg(
                F.round(F.sum("x").cast("double") / F.count(F.lit(1)))
                .cast("bigint")
                .alias("c")
            )
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("j", "c"))).alias("jc"))
            .select("cid", F.col("jc.c").alias("marr"))
        )
        cent = (
            cent.join(means, "cid", "left")
            .select("cid", F.coalesce(F.col("marr"), F.col("carr")).alias("carr"))
            .localCheckpoint(eager=True)
        )
    return cent


def _kmeans_cand(spark, sf_dir) -> DataFrame:
    """(vec_id, s=0, subv) adapter: the full 64-d int64 vector as ONE
    Lloyd subspace, so the streaming numpy training kernel
    (`_lloyd_codebook_rows`) applies unchanged with width=64."""
    return _emb_e6(spark, sf_dir).select(
        "vec_id",
        F.lit(0).cast("long").alias("s"),
        F.col("v").alias("subv"),
    )


def _kmeans_model(
    spark, sf_dir, k: int = _KMEANS_K, iters: int = _KMEANS_ITERS
):
    """Driver-side ([carr...], [cid...]) centroid maps trained by the
    streaming Lloyd kernel over the full vectors as a single width-64
    subspace — the r14 port of the Lloyd-PQ mapInPandas optimization
    (guide §4.2): per round ONE map-side-reduced partials pass instead
    of the k-fold broadcast crossJoin through the interpreted
    zip_with/aggregate L2 (the r13 attempts showed the crossJoin copies
    the 64-long payload k times before partial agg — the kernel never
    expands it). Values are bit-identical to
    `_kmeans_centroids_relational` (same k-lowest-vec_id seeding, same
    exact int64 argmin with lowest-cid ties, same
    round(CAST(sum AS DOUBLE)/count) means — pinned by test)."""
    rows = _lloyd_codebook_rows(
        _kmeans_cand(spark, sf_dir), k, iters, width=64, nsub=1
    )
    return _cent_maps(rows)


def _kmeans_centroids(
    spark, sf_dir, k: int = _KMEANS_K, iters: int = _KMEANS_ITERS
) -> DataFrame:
    """(cid, carr) centroid DataFrame from the kernel-trained model —
    the equality-pin surface mirroring `_lloyd_codebook_on`."""
    cent_by_s, cids_by_s = _kmeans_model(spark, sf_dir, k, iters)
    rows = [
        (0, cids_by_s[0][i], cent_by_s[0][i])
        for i in range(len(cids_by_s.get(0, [])))
    ]
    if not rows:  # degenerate zero-vector corpus
        return spark.range(0).select(
            F.col("id").alias("cid"),
            F.array(F.lit(0).cast("bigint")).alias("carr"),
        )
    return _cent_df_from_rows(spark, rows).select("cid", "carr")


def _kmeans_assign_kernel(cent_arr, cids_arr):
    """mapInPandas kernel: final assignment (vec_id, label, cid, d) of
    every vector to its nearest centroid — same exact int64 distance
    (d = ipv + ipc - 2<v,c>) and lowest-cid tie-break as the training
    kernel, one streaming pass, no k-fold crossJoin expansion."""

    def fn(batches):
        import numpy as np
        import pandas as pd

        C = np.asarray(cent_arr, dtype=np.int64)
        cids = np.asarray(cids_arr, dtype=np.int64)
        ipc = np.einsum("ij,ij->i", C, C)
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack(pdf["v"].to_numpy()).astype(np.int64, copy=False)
            ipv = np.einsum("ij,ij->i", X, X)
            d = ipv[:, None] + ipc[None, :] - 2 * (X @ C.T)
            a = np.argmin(d, axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "label": pdf["label"].to_numpy(),
                    "cid": cids[a],
                    "d": d[np.arange(len(a)), a],
                }
            )

    return fn


def _kmeans_ctes(k: int = _KMEANS_K, iters: int = _KMEANS_ITERS) -> str:
    """DuckDB CTE block ending in ``fasg`` (vec_id, label, cid, d) —
    the bit-exact oracle twin of the Spark k-means above via the
    inner-product expansion (d = ipv + ipc - 2<v,c>; all quantities are
    int64-exact DOUBLEs, so the different evaluation order cannot
    diverge)."""
    parts = [
        _E_CTE.replace("e AS (", "e AS MATERIALIZED (") + ",",
        """
vq AS MATERIALIZED (
    SELECT vec_id, label,
           list_transform(emb, x -> round(x * 1000000))::DOUBLE[64] AS v
    FROM e
),
vi AS MATERIALIZED (
    SELECT vec_id, label, v, array_inner_product(v, v) AS ipv FROM vq
),""",
        f"""
kseeds AS (SELECT vec_id FROM e ORDER BY vec_id LIMIT {k}),
kc0 AS MATERIALIZED (
    -- carr: LIST copy for the empty-cluster coalesce (DuckDB cannot
    -- CASE/COALESCE fixed arrays); carrf: DOUBLE[64] for inner products
    SELECT v.vec_id AS cid, v.v::DOUBLE[] AS carr, v.v AS carrf, v.ipv AS ipc
    FROM vi v JOIN kseeds s ON s.vec_id = v.vec_id
),""",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"""
kasg{t} AS MATERIALIZED (
    SELECT vec_id, cid FROM (
        SELECT v.vec_id, c.cid,
               row_number() OVER (PARTITION BY v.vec_id
                   ORDER BY CAST(v.ipv + c.ipc
                             - 2 * array_inner_product(v.v, c.carrf) AS BIGINT) ASC,
                            c.cid ASC) AS rn
        FROM vi v CROSS JOIN kc{t - 1} c)
    WHERE rn = 1
),
kcm{t} AS MATERIALIZED (
    SELECT a.cid, j.j,
           round(CAST(sum(v.v[j.j + 1]) AS DOUBLE) / count(*)) AS c
    FROM kasg{t} a JOIN vi v USING (vec_id), range(64) j(j)
    GROUP BY 1, 2
),
kc{t} AS MATERIALIZED (
    SELECT cid, carr, carr::DOUBLE[64] AS carrf,
           array_inner_product(carr::DOUBLE[64], carr::DOUBLE[64]) AS ipc FROM (
        SELECT p.cid, coalesce(m.carr, p.carr) AS carr
        FROM kc{t - 1} p LEFT JOIN (
            SELECT cid, array_agg(c ORDER BY j) AS carr
            FROM kcm{t} GROUP BY cid) m USING (cid))
),""",
        )
    parts.append(
        f"""
fasg AS MATERIALIZED (
    SELECT vec_id, label, cid, d FROM (
        SELECT v.vec_id, v.label, c.cid,
               CAST(v.ipv + c.ipc
                    - 2 * array_inner_product(v.v, c.carrf) AS BIGINT) AS d,
               row_number() OVER (PARTITION BY v.vec_id
                   ORDER BY CAST(v.ipv + c.ipc
                             - 2 * array_inner_product(v.v, c.carrf) AS BIGINT) ASC,
                            c.cid ASC) AS rn
        FROM vi v CROSS JOIN kc{iters} c)
    WHERE rn = 1
)""",
    )
    return "".join(parts)


@register(
    "kmeans_doc_clusters",
    oracle=f"""
WITH {_kmeans_ctes()},
lab AS (
    SELECT cid, label, count(*) AS n,
           row_number() OVER (PARTITION BY cid
               ORDER BY count(*) DESC, label ASC) AS rn
    FROM fasg GROUP BY cid, label
)
SELECT f.cid AS cluster_id,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(round(CAST(sum(f.d) AS DOUBLE) / count(*)) AS BIGINT) AS mean_sqdist,
       any_value(l.label) AS top_label,
       CAST(any_value(l.n) AS BIGINT) AS top_label_n
FROM fasg f JOIN (SELECT cid, label, n FROM lab WHERE rn = 1) l USING (cid)
GROUP BY f.cid
""",
    tags=("similarity", "clustering", "iterative"),
)
def kmeans_doc_clusters(spark, sf_dir):
    """Full-vector Lloyd k-means over the corpus embeddings (k=8, 3
    exact-integer iterations) — the curation-side clustering primitive
    (topic balancing / mixture auditing / SemDeDup cell discovery).
    Output: per-cluster size, mean squared distance to the final
    centroid (micro-unit^2, the inertia/k diagnostic), and the majority
    label with its count (cluster "purity" at a glance).

    Exactness: vectors are quantized ONCE to int64 micro-units; every
    distance, argmin and round(sum/count) mean is then integer-exact on
    both engines, so the numpy kernel's matmul expansion and DuckDB's
    inner-product expansion cannot diverge (the Lloyd-PQ convention).
    Scale shape (r14, guide §4.2): training is the driver-paced
    streaming Lloyd kernel — per round ONE map-side-reduced
    mapInPandas partials pass, k x 64 driver ints, no corpus-sized
    shuffle; the final assignment is one streaming argmin kernel pass
    (no k-fold crossJoin payload expansion). Bit-equality with the
    retained relational arm (`_kmeans_centroids_relational`) is pinned
    by tests/test_operators.py."""
    ev = _emb_e6(spark, sf_dir)
    cent_by_s, cids_by_s = _kmeans_model(spark, sf_dir)
    # cached: narrow (4 ints/doc) and consumed by BOTH the majority-
    # label subtree and the per-cluster aggregate — uncached, the
    # assign kernel's corpus pass runs twice (bench clear_caches owns
    # the lifecycle, the r13 quartet convention)
    fasg = ev.select("vec_id", "label", "v").mapInPandas(
        _kmeans_assign_kernel(
            cent_by_s.get(0, [[0] * 64]), cids_by_s.get(0, [0])
        ),
        "vec_id long, label int, cid long, d long",
    ).cache()
    lw = Window.partitionBy("cid").orderBy(F.desc("n"), F.asc("label"))
    lab = (
        fasg.groupBy("cid", "label")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rn", F.row_number().over(lw))
        .filter(F.col("rn") == 1)
        .select("cid", F.col("label").alias("top_label"), F.col("n").alias("top_label_n"))
    )
    return (
        fasg.groupBy("cid")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.round(F.sum("d").cast("double") / F.count(F.lit(1)))
            .cast("bigint")
            .alias("mean_sqdist"),
        )
        .join(F.broadcast(lab), "cid")
        .select(
            F.col("cid").alias("cluster_id"),
            "n_vecs",
            "mean_sqdist",
            "top_label",
            F.col("top_label_n").cast("bigint").alias("top_label_n"),
        )
    )
