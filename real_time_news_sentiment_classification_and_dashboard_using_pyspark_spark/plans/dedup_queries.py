"""Deduplication operator family: exact, MinHash+LSH, SimHash, n-gram
Jaccard — the LLM-training-data dedup surface, each as a Catalyst-native
plan with a bit-exact DuckDB oracle.

Test corpus construction: the driver's ``documents`` are all unique, so
each query builds a deterministic "re-crawl" corpus = documents UNION ALL
a mutated copy (doc_id + 1_000_000, last 5 tokens dropped). Exact dedup
uses an unmutated doubled corpus. This exercises real near-dup geometry
(Jaccard ~0.9 pairs) with zero randomness.

All hashing is md5-derived (functions/text.py rationale): Spark's
murmur3 ``hash()`` is not reproducible in ANSI SQL, md5 substrings are.
Integer-only signature math means Spark and DuckDB agree bit-for-bit —
no float tolerance needed anywhere except the final Jaccard rounding.

Scale posture: every pair-producing join here is *blocked* (LSH band,
simhash prefix, shared-shingle) — nothing is O(n^2) over the corpus; the
shuffles are keyed on band/prefix/shingle whose fan-out is bounded.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..sources.tables import table, widen_scan
from .registry import register

# ---------------------------------------------------------------------------
# shared fragments
# ---------------------------------------------------------------------------

TOKS = (
    "list_filter(string_split(lower(regexp_replace(text, '[^a-zA-Z\\s]', '', 'g')), ' '), "
    "x -> x <> '')"
)


def spark_toks(col: str = "text") -> str:
    """Spark SQL expression string for the family's cleaned, non-empty
    whitespace tokens over an arbitrary column — THE tokenize
    definition; every shingle producer (corpus build, streaming delta)
    must come through here so the persisted store and any prober agree
    bit-for-bit."""
    return (
        f"filter(split(lower(regexp_replace({col}, '[^a-zA-Z\\\\s]', '')), ' '), "
        "x -> x != '')"
    )


SPARK_TOKS = spark_toks("text")

# Per-doc DISTINCT 3-token shingle set from a ``toks`` array column —
# the single shingle-assembly definition (shared with the streaming
# prober via ``shingle_arrays_of``).
_SHINGLE_SET_EXPR = (
    "array_distinct(if(size(toks) < 3, array(), "
    "transform(sequence(1, size(toks) - 2), "
    "i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))))"
)


def h32_expr(col) -> "Column":
    """32-bit integer hash of a shingle string (md5 substring) — the
    family's ONE hash definition, identical to the oracle's
    ``('0x' || substr(md5(s), 25, 8))::BIGINT``."""
    return F.conv(F.substring(F.md5(col), 25, 8), 16, 10).cast("bigint")


def h32b_expr(col) -> "Column":
    """SECOND independent 32-bit hash (a disjoint md5 substring, chars
    9-16) — pairs with ``h32_expr`` to form the 64-bit SimHash
    signature; oracle twin ``('0x' || substr(md5(s), 9, 8))::BIGINT``."""
    return F.conv(F.substring(F.md5(col), 9, 8), 16, 10).cast("bigint")

# corpus: original docs + near-duplicate copies (last 5 tokens dropped)
CORPUS_SQL = f"""
corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id,
           array_to_string(list_slice({TOKS}, 1, greatest(len({TOKS}) - 5, 1)), ' ') AS text
    FROM documents
)
"""

# distinct 3-token shingles of the corpus. ``doc_pred`` is the
# doc-side corpus-cap slot (r11): empty at every committed fixture; a
# ``WHERE (doc_id % 1000000) % M = 0`` restriction above
# dials._DOC_PAIR_CAP base documents, injected at the TOP of the
# pipeline so the capped oracle never tokenizes/shingles the docs it
# drops (the predicate is on the BASE id, so an original and its
# near-dup twin always land on the same side of the cap).
def _shingles_sql(doc_pred: str = "") -> str:
    return (
        "WITH "
        + CORPUS_SQL
        + f""",
tok AS (SELECT doc_id, {TOKS} AS t FROM corpus{doc_pred}),
shingle AS (
    SELECT DISTINCT doc_id, s AS shingle
    FROM tok, unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS u(s)
),
sh AS MATERIALIZED (
    SELECT doc_id, shingle,
           ('0x' || substr(md5(shingle), 25, 8))::BIGINT AS h32
    FROM shingle
),
sizes AS MATERIALIZED (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id)
"""
    )


SHINGLES_SQL = _shingles_sql()


def _doc_cap_mod_for(spark, sf_dir: str) -> int:
    """Resolve the doc-side pair-family corpus cap for THIS corpus
    (dials._doc_cap_mod over the documents row count). The count comes
    from the parquet footer — the SAME source the callable oracles use
    — falling back to a Spark count only when the footer is unreadable
    (one count source per query, the ADVICE-r10 policy)."""
    from .dials import _doc_cap_mod
    from .similarity_queries import _parquet_total_count

    n = _parquet_total_count(sf_dir, "documents")
    if n is None:
        n = table(spark, sf_dir, "documents").count()
    return _doc_cap_mod(n)


def _doc_cap_pred(m: int):
    """The Spark Column predicate of the doc cap: base-id modulus, so
    an original and its +1e6 twin stay together (near-dup pairs
    survive the cap; only the corpus shrinks)."""
    return (F.col("doc_id") % 1000000) % m == 0


def _doc_cap_where(sf_dir: str) -> str | None:
    """Oracle twin of the doc cap: the WHERE clause for
    ``_shingles_sql``'s doc_pred slot. '' (byte-identical to the
    static SHINGLES_SQL) at every committed fixture; None when the
    corpus is unreadable (rows-only fallback for that one query)."""
    from .dials import _doc_cap_mod
    from .similarity_queries import _parquet_total_count

    n = _parquet_total_count(sf_dir, "documents")
    if n is None:
        return None
    m = _doc_cap_mod(n)
    return f" WHERE (doc_id % 1000000) % {m} = 0" if m > 1 else ""


def _heavy_cap_mod_for(spark, sf_dir: str) -> int:
    """The r12 heavy-pair-family cap (dials._heavy_pair_cap_mod): a
    10x-larger slab than `_doc_cap_mod_for`, no-op through sf10 (every
    previously hash-verified scale), M=10 at sf100. Same footer count
    source as every dial."""
    from .dials import _heavy_pair_cap_mod
    from .similarity_queries import _parquet_total_count

    n = _parquet_total_count(sf_dir, "documents")
    if n is None:
        n = table(spark, sf_dir, "documents").count()
    return _heavy_pair_cap_mod(n)


def _heavy_cap_where(sf_dir: str) -> str | None:
    """Oracle twin of the heavy-pair cap ('' when inactive, None when
    the corpus is unreadable) — drop-in for ``_shingles_sql``'s
    doc_pred slot, same base-id twin-preserving predicate as
    ``_doc_cap_where``."""
    from .dials import _heavy_pair_cap_mod
    from .similarity_queries import _parquet_total_count

    n = _parquet_total_count(sf_dir, "documents")
    if n is None:
        return None
    m = _heavy_pair_cap_mod(n)
    return f" WHERE (doc_id % 1000000) % {m} = 0" if m > 1 else ""


# MATERIALIZED is load-bearing at sweep scale: DuckDB inlines plain
# CTEs once PER REFERENCE, and every dedup oracle reads ``sh`` 2-5
# times (signatures + both verify sides) — the union oracle re-paid
# the full tokenize/shingle corpus five times at sf1 (241 s; 26 s
# materialized, identical rows).


def _corpus(spark, sf_dir) -> DataFrame:
    """(doc_id, toks): original docs + near-duplicate twins (last 5
    tokens dropped). The twin rows are produced by EXPLODING a 2-element
    array of (doc_id, toks) structs over ONE scan — a union of two
    branches would re-run the clean/tokenize regex per branch (2x the
    dominant scan cost, measured 5.9s -> 3.5s at sf0.1). The twin is a
    SLICE of the original's token array — never a join-then-retokenize
    round trip. (Identical to the oracle's retokenized twin:
    re-cleaning space-joined clean tokens is the identity.)

    The scan is WIDENED first (``widen_scan``): the whole dedup family
    is regex/array CPU over this corpus, and a small parquet file is one
    input split — unwidened, every signature build in the family ran as
    a single task."""
    d = widen_scan(table(spark, sf_dir, "documents")).select(
        "doc_id", F.expr(SPARK_TOKS).alias("toks")
    )
    return d.select(
        F.explode(
            F.array(
                F.struct(F.col("doc_id"), F.col("toks")),
                F.struct(
                    (F.col("doc_id") + 1000000).alias("doc_id"),
                    F.expr("slice(toks, 1, greatest(size(toks) - 5, 1))").alias(
                        "toks"
                    ),
                ),
            )
        ).alias("s")
    ).select("s.doc_id", "s.toks")


def _shingle_arrays(spark, sf_dir) -> DataFrame:
    """(doc_id, sh_arr): per-doc DISTINCT 3-token shingle array — the
    dedup family's shared build, ONE narrow map over the widened scan.

    Shingles are assembled per document inside the token array
    (``transform`` over an index ``sequence``), de-duplicated per
    document with ``array_distinct`` (the required set semantics are
    per-doc, so a global ``distinct()`` exchange over every shingle row
    is pure waste). One row per doc: a consumer that needs per-doc set
    state caches THIS (bounded by doc count), never the exploded rows."""
    c = _corpus(spark, sf_dir)
    # sequence(1, 0) would yield a DESCENDING [1, 0] — the shared
    # expression guards the under-3-token case to an empty array
    return c.select("doc_id", F.expr(_SHINGLE_SET_EXPR).alias("sh_arr"))


def shingle_arrays_of(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, sh_arr) for an ARBITRARY (id, text) relation — the
    generic form of the corpus build, sharing the exact tokenize
    (``spark_toks``) and shingle-assembly (``_SHINGLE_SET_EXPR``)
    definitions, so an external prober (e.g. the streaming near-dup
    operator) is bit-compatible with the persisted store by
    construction. The single-element explode is a Generate barrier:
    without it Catalyst inlines the tokenize regex subtree into every
    lambda access inside the shingle transform — the O(tokens x 3)
    re-evaluation PERF.md's first lesson documents."""
    t = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array(F.expr(spark_toks(text_col)))).alias("toks"),
    )
    return t.select("doc_id", F.expr(_SHINGLE_SET_EXPR).alias("sh_arr"))


# ---------------------------------------------------------------------------
# materialized shingle store — the dedup suite's shared build step
# ---------------------------------------------------------------------------

# MinHash parameter family: 16 universal hashes (a*h + b) mod P.
# a < 2^30 keeps a*h32 < 2^62 — no BIGINT overflow on either engine.
# (Defined ahead of the store section: the build materializes the banded
# signature index from the same constants the queries use.)
_P = 2147483647
_A_MOD = 1073741789
MINHASH_PARAMS = [
    ((1103515245 * (i + 1) + 12345) % _A_MOD + 1, (69069 * (i + 1) + 98765) % _P)
    for i in range(16)
]
N_BANDS, BAND_ROWS = 4, 4


def _minhash_bands_from_hashes(hashes: DataFrame) -> DataFrame:
    """(doc_id, band, sig) banded MinHash signatures from a (doc_id,
    h32) relation: ONE groupBy(doc_id) computes all 16 signature mins as
    parallel aggregates (min is a partial aggregate — map-side combine,
    no 16x row blowup), then ``stack`` unpivots to N_BANDS rows/doc.
    Shared by the store build (which persists the result as the LSH
    index) and by incremental callers that signature a fresh delta."""
    min_aggs = [
        F.min((F.lit(a) * F.col("h32") + F.lit(b)) % _P).alias(f"mh{i}")
        for i, (a, b) in enumerate(MINHASH_PARAMS)
    ]
    sigs = hashes.groupBy("doc_id").agg(*min_aggs)
    stack_args = ", ".join(
        f"{b}, concat_ws('_', mh{4 * b}, mh{4 * b + 1}, mh{4 * b + 2}, mh{4 * b + 3})"
        for b in range(N_BANDS)
    )
    return sigs.select(
        "doc_id", F.expr(f"stack({N_BANDS}, {stack_args}) AS (band, sig)")
    )


def _signature_tables_single_pass(hashes_df: DataFrame):
    """(bands, simsig, simsig64, combined_cache) — the three persisted
    signature indexes derived from ONE doc_id-keyed aggregation pass
    over a (doc_id, h32, h32b) relation (r14, guide §2.3/§2.4).

    The old shape aggregated the hashes relation THREE times with the
    same key (16 minhash mins; 32 simhash votes; 64 simhash64 votes).
    The 32-bit simhash votes over h32 are bit-identical to the 64-bit
    pass's ``va`` half, so one combined 80-aggregate pass (16 mins +
    64 votes) feeds all three tables as cheap n_docs-row projections —
    values unchanged by construction (same aggregate expressions over
    the same rows; the store-equality tests and family oracles pin it).
    The returned ``combined_cache`` is FORCED (count) so concurrent
    projection writes don't race to materialize it; the caller owns the
    unpersist."""
    min_aggs = [
        F.min((F.lit(a) * F.col("h32") + F.lit(b)) % _P).alias(f"mh{i}")
        for i, (a, b) in enumerate(MINHASH_PARAMS)
    ]
    combined = (
        hashes_df.groupBy("doc_id").agg(*min_aggs, *_sig64_vote_aggs()).cache()
    )
    combined.count()
    stack_args = ", ".join(
        f"{b}, concat_ws('_', mh{4 * b}, mh{4 * b + 1}, mh{4 * b + 2}, mh{4 * b + 3})"
        for b in range(N_BANDS)
    )
    bands = combined.select(
        "doc_id", F.expr(f"stack({N_BANDS}, {stack_args}) AS (band, sig)")
    )
    simsig64 = combined.select(
        "doc_id",
        F.expr(_sig_sum_sql("a")).cast("bigint").alias("sim_a"),
        F.expr(_sig_sum_sql("b")).cast("bigint").alias("sim_b"),
    ).withColumns(
        {
            "a_hi": F.expr("sim_a div 65536"),
            "a_lo": F.col("sim_a") % 65536,
            "b_hi": F.expr("sim_b div 65536"),
            "b_lo": F.col("sim_b") % 65536,
        }
    )
    # simhash == sim_a (identical vote aggregates over the same h32)
    simsig = combined.select(
        "doc_id",
        F.expr(_sig_sum_sql("a")).cast("bigint").alias("simhash"),
    ).withColumns(
        {
            "hi16": F.expr("simhash div 65536"),
            "lo16": F.col("simhash") % 65536,
        }
    )
    return bands, simsig, simsig64, combined


# bump when the shingle/tokenize semantics change: the version is part
# of the artifact key, so stale artifacts from older code never resolve
# (v6: adds the persisted ``df`` document-frequency table that makes
# the store append-mergeable; v7: ``hashes`` carries the second 32-bit
# hash and the 64-bit SimHash index ``simsig64`` is persisted; v9:
# ``kept`` maintenance is merge-on-read — base + ``kept_over/gen=N``
# override generations resolved by ``resolve_kept``; a v8 bucketed-kept
# layout existed briefly and was retired by measurement)
_ARTIFACT_VERSION = 9

# Target docs per task when widening a streaming delta before its
# tokenize/shingle/hash pass (append_to_shingle_artifact). At ~1-4 KB of
# clean text per doc this is ~0.5-2 MB of regex CPU per task — big
# enough that task/scheduling overhead stays amortized, small enough
# that a one-file micro-batch parallelizes. Large deltas hit the
# session-width cap and behave exactly as before.
_FOLD_DOCS_PER_TASK = 512


def _params_fingerprint() -> str:
    """8-hex fingerprint of every constant the artifact BAKES IN — the
    stop cutoff, the MinHash parameter family, the banding layout, the
    SimHash width, plus the hand-bumped semantics version. Keying the
    path by VALUE means changing any build-defining constant
    automatically orphans stale artifacts on every machine; the manual
    version bump remains only for semantics changes the constants can't
    see (tokenize/shingle expression edits)."""
    import hashlib

    blob = repr(
        (
            _ARTIFACT_VERSION,
            STOP_SHINGLE_DF,
            MINHASH_PARAMS,
            N_BANDS,
            BAND_ROWS,
            32,  # SimHash signature width
        )
    ).encode()
    return hashlib.md5(blob).hexdigest()[:8]


def _artifact_path(sf_dir: str) -> str:
    import os

    from ..sources.tables import data_fingerprint

    label = os.path.basename(os.path.abspath(sf_dir).rstrip(os.sep))
    fp = data_fingerprint(os.path.join(sf_dir, "documents.parquet"))
    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    base = os.environ.get(
        "SPARK_GRAFT_SHINGLE_DIR",
        os.path.join(root, "spark-warehouse", "dedup_shingles"),
    )
    return os.path.join(base, f"p{_params_fingerprint()}_{label}_{fp}")


def build_shingle_artifact(spark, sf_dir: str, force: bool = False) -> str:
    """Materialize the dedup suite's shared intermediates to parquet —
    the PRODUCTION SHAPE for a multi-query dedup pass at 100 TB: the
    corpus is tokenized and shingled ONCE, and every family member
    (exact Jaccard, MinHash, SimHash) starts from the columnar artifact
    instead of re-paying the regex/array CPU per query.

    Six tables under one keyed directory:
    - ``arrays``: (doc_id, sh_arr) — per-doc distinct shingle arrays
      (full sets, doc order — set consumers are order-agnostic, so this
      is a pure narrow map + write, no sort join), for set verification
      (array_intersect) and map-side set sizes;
    - ``kept``:   (doc_id, sh_arr) — the same arrays with stop shingles
      REMOVED, PRE-SORTED in the TRUE PPJoin global order: ascending
      document frequency, ties broken by the shingle string. The exact
      Jaccard consumer slices its rarest-first prefix with a plain
      ``slice`` — no sort, no stop work, no per-row set rebuild at
      query time (an ``array_except`` against the 9k-entry stop list
      rebuilt the hash set per row: 16s at sf0.1; this table makes
      that cost a one-time build cost). Because prefix shingles are
      the low-df ones, the candidate self-join's per-key fan-out is
      minimal;
    - ``hashes``: (doc_id, h32)   — exploded 32-bit md5 hashes, the
      compact integer input to MinHash/SimHash signature aggregates
      (shingle strings never leave the array tables);
    - ``stop``:   (shingle)       — shingles with doc frequency above
      ``STOP_SHINGLE_DF`` (the family's boilerplate cut), cut from the
      same df table the sort uses;
    - ``bands``:  (doc_id, band, sig) — the banded MinHash signature
      index (16 mins x 4 bands, ``_minhash_bands_from_hashes``). This
      IS the persisted LSH index a 100 TB dedup service maintains: the
      pair query reads it instead of re-aggregating signatures, and an
      incremental batch (``incremental_near_dup``) signatures only its
      DELTA and probes this table;
    - ``simsig``: (doc_id, simhash, hi16, lo16) — the 32-bit SimHash
      signature index (``_simhash_sig_from_hashes``); ``simhash_pairs``
      pays only the two-block joins at query time.

    Everything here is whole-stage-codegen: the (df, shingle) sort key
    is joined onto EXPLODED rows and ordered via
    ``array_sort(collect_list(struct(df, shingle)))`` + native
    ``karr.s`` field extraction — never a ``transform`` lambda, whose
    per-element interpreted evaluation (CodegenFallback) was measured
    2-4x slower than the row path at sf0.1. The df join is keyed on
    shingle — the scale-correct shuffle for a build step. Every table
    is REPARTITIONED to the session width before writing: AQE coalesces
    these small shuffles to one partition, and a one-file artifact
    would silently serialize every downstream consumer.

    The key embeds corpus label + content fingerprint + code version
    (``_artifact_path``), so regenerated fixtures or changed shingle
    semantics rebuild instead of resolving stale bytes. Build-on-miss
    is concurrency-safe: writers build under a pid-suffixed tmp dir and
    atomically rename; the loser of a rename race discards its tmp."""
    import os
    import shutil

    path = _artifact_path(sf_dir)
    if os.path.exists(os.path.join(path, "_DONE")) and not force:
        return path
    tmp = f"{path}.tmp{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    width = spark.sparkContext.defaultParallelism
    raw = _shingle_arrays(spark, sf_dir)
    try:
        _build_artifact_tables(spark, sf_dir, tmp, raw, width)
    except BaseException:
        # a failed write must not leak the pid-suffixed tmp tree — the
        # next run gets a new pid and would never clean this one up
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    open(os.path.join(tmp, "_DONE"), "w").close()
    if force:
        shutil.rmtree(path, ignore_errors=True)
    try:
        os.rename(tmp, path)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
        # Only a concurrent builder WINNING the rename makes discarding
        # our build safe; any other rename failure (partial rmtree of
        # the old artifact, permissions, non-empty target without a
        # completion marker) would silently serve stale/partial tables.
        if not os.path.exists(os.path.join(path, "_DONE")):
            raise RuntimeError(
                f"shingle artifact rename to {path} failed and no complete "
                "artifact exists there — refusing to serve a stale/partial "
                "store"
            )
    return path


def _build_artifact_tables(spark, sf_dir: str, tmp: str, raw, width: int) -> None:
    """Write all seven artifact tables under ``tmp``; caches are
    released on every path."""
    import os

    # full arrays: a pure narrow map over the widened scan + write —
    # every corpus doc appears, empty-set docs included
    raw.write.mode("overwrite").parquet(os.path.join(tmp, "arrays"))
    rows = (
        spark.read.parquet(os.path.join(tmp, "arrays"))
        .select("doc_id", F.explode("sh_arr").alias("shingle"))
        .cache()
    )
    df_table = rows.groupBy("shingle").agg(F.count(F.lit(1)).alias("df")).cache()
    hashes_df = rows.select(
        "doc_id",
        h32_expr("shingle").alias("h32"),
        h32b_expr("shingle").alias("h32b"),
    ).cache()
    try:
        _write_artifact_tables(spark, tmp, rows, df_table, hashes_df, width)
    finally:
        rows.unpersist()
        df_table.unpersist()
        hashes_df.unpersist()


def _build_empty_artifact_tables(spark, tmp: str) -> None:
    """ZERO-ROW store bootstrap fast path (r13). An empty store is fully
    determined by its table SCHEMAS, and those schemas are derived here
    from the exact full-build plans over a zero-row corpus — pure
    driver-side analysis, no jobs — then landed driver-side as Arrow
    parquet footers (r14): ZERO Spark jobs. The r13 shape still paid
    one Spark write job per table (~1.9 s of fixed job overhead per
    streaming-store bootstrap); the original path ran the complete
    build pipeline over nothing (~3 s). Schema provenance is the SAME
    shared expressions as the real build (``shingle_arrays_of`` /
    ``h32_expr`` / signature aggregates), so the schemas cannot drift
    from what the append path expects; the store-equality tests
    (tests/test_streaming_dedup_index.py) pin byte-level agreement
    with the batch build."""
    import os

    empty_docs = spark.range(0).select(
        F.col("id").alias("doc_id"), F.lit("").alias("text")
    )
    raw = shingle_arrays_of(empty_docs)
    rows = raw.select("doc_id", F.explode("sh_arr").alias("shingle"))
    df_table = rows.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    hashes_df = rows.select(
        "doc_id",
        h32_expr("shingle").alias("h32"),
        h32b_expr("shingle").alias("h32b"),
    )
    kept_df = (
        rows.join(df_table.filter(F.col("df") <= STOP_SHINGLE_DF), "shingle")
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("df"), F.col("shingle").alias("s")))
            ).alias("karr")
        )
        .select("doc_id", F.col("karr.s").alias("sh_arr"))
    )
    stop_df = df_table.filter(F.col("df") > STOP_SHINGLE_DF).select("shingle")
    schemas = {
        "arrays": raw.schema,
        "hashes": hashes_df.schema,
        "df": df_table.schema,
        "stop": stop_df.schema,
        "kept": kept_df.schema,
        "bands": _minhash_bands_from_hashes(hashes_df).schema,
        "simsig": _simhash_sig_from_hashes(hashes_df).schema,
        "simsig64": _simhash_sig64_from_hashes(hashes_df).schema,
    }

    # r14: the empty tables are written DRIVER-SIDE as single-file
    # parquet via Arrow — zero Spark jobs (the r13 shape still paid one
    # write job per table, ~1.9 s of fixed job overhead per streaming
    # bootstrap; now the whole bootstrap is file-footer writes). Schema
    # provenance is unchanged: the exact build-pipeline plans above.
    # Spark reads the Arrow-written footers identically (int64/string/
    # list<string> map 1:1); the store-equality tests pin it.
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    def _write_empty(item):
        name, schema = item
        d = os.path.join(tmp, name)
        os.makedirs(d, exist_ok=True)
        aschema = to_arrow_schema(schema)
        pq.write_table(
            pa.Table.from_pylist([], schema=aschema),
            os.path.join(d, "part-00000.parquet"),
        )

    from pyspark.sql.types import LongType, StructField, StructType

    meta_schema = StructType(
        [
            StructField("n_docs", LongType()),
            StructField("n_shingle_rows", LongType()),
            StructField("n_distinct_shingles", LongType()),
        ]
    )
    for item in schemas.items():
        _write_empty(item)
    meta_dir = os.path.join(tmp, "meta")
    os.makedirs(meta_dir, exist_ok=True)
    pq.write_table(
        pa.Table.from_pylist(
            [{"n_docs": 0, "n_shingle_rows": 0, "n_distinct_shingles": 0}],
            schema=to_arrow_schema(meta_schema),
        ),
        os.path.join(meta_dir, "part-00000.parquet"),
    )


def _write_artifact_tables(spark, tmp, rows, df_table, hashes_df, width) -> None:
    import os

    # Materialize the three shared caches SERIALLY (concurrent first
    # touches would race to compute the same uncached plan twice), then
    # land the four derived tables as CONCURRENT jobs: each write's
    # stages are small and under-fill 32 cores, so overlapping them
    # fills the idle slots — the same trick a multi-output 100 TB build
    # uses, and safe because job submission is thread-safe and every
    # input below is a materialized cache.
    n_distinct_shingles = df_table.count()
    n_shingle_rows = hashes_df.count()
    # build MANIFEST: the corpus audit numbers fall out of the counts
    # that just forced the caches (plus a metadata-only parquet rowcount
    # for n_docs, which includes empty-shingle docs the explode drops) —
    # persisting them costs nothing and saves every consumer an
    # artifact re-scan. ``dedup_shingle_build`` reads this table.
    n_docs = spark.read.parquet(os.path.join(tmp, "arrays")).count()
    # spark.range + lit, NOT createDataFrame: the local-list conversion
    # path costs seconds per call in this session (Python->JVM RDD
    # machinery); a range(1) projection is pure JVM.
    (
        spark.range(1)
        .select(
            F.lit(n_docs).cast("bigint").alias("n_docs"),
            F.lit(n_shingle_rows).cast("bigint").alias("n_shingle_rows"),
            F.lit(n_distinct_shingles).cast("bigint").alias("n_distinct_shingles"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(tmp, "meta"))
    )

    # kept = inner join against the NON-stop df rows (stop removal by
    # join key, never a per-row array scrub), sorted ascending-df.
    # Docs whose kept set would be empty simply have no row here — they
    # cannot pair, and the audit counts read ``arrays``.
    kept_df = (
        rows.join(df_table.filter(F.col("df") <= STOP_SHINGLE_DF), "shingle")
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("df"), F.col("shingle").alias("s")))
            ).alias("karr")
        )
        .select("doc_id", F.col("karr.s").alias("sh_arr"))
        .repartition(width)
    )
    stop_df = (
        df_table.filter(F.col("df") > STOP_SHINGLE_DF)
        .select("shingle")
        .repartition(width)
    )
    # the three signature indexes from ONE doc_id-keyed aggregation pass
    # (r14, guide §2.3/§2.4): see _signature_tables_single_pass
    bands_df, simsig_df, simsig64_df, combined = _signature_tables_single_pass(
        hashes_df
    )
    bands_df = bands_df.repartition(width)
    simsig_df = simsig_df.repartition(width)
    simsig64_df = simsig64_df.repartition(width)

    from concurrent.futures import ThreadPoolExecutor

    def _write(item):
        name, df = item
        df.write.mode("overwrite").parquet(os.path.join(tmp, name))

    try:
        with ThreadPoolExecutor(max_workers=6) as pool:
            list(
                pool.map(
                    _write,
                    [
                        ("kept", kept_df),
                        ("hashes", hashes_df),
                        ("stop", stop_df),
                        # full df table (not just the stop tail): the sum-
                        # mergeable state that makes the store APPENDABLE —
                        # an incremental build merges delta counts into this
                        # instead of recounting the corpus
                        ("df", df_table.repartition(width)),
                        ("bands", bands_df),
                        ("simsig", simsig_df),
                        ("simsig64", simsig64_df),
                    ],
                )
            )
    finally:
        combined.unpersist()


def resolve_kept(spark, path: str) -> DataFrame:
    """The LOGICAL kept relation (doc_id, sh_arr) of a store at
    ``path``: the flat base MERGED with any append-generation
    override tables (merge-on-read, LSM-style). An append never
    rewrites base rows — it writes the re-sorted rows of affected ∪
    new docs as ``kept_over/gen=N``; the reader takes the newest
    generation per overridden doc and anti-joins those doc_ids out of
    the base. An override row with an EMPTY sh_arr is a TOMBSTONE —
    the doc's entire kept set became stop-filtered after an append —
    and is dropped post-merge, matching the full build (docs with an
    empty kept set have no row). The override set is O(delta reach)
    PER APPEND but generations accumulate between compactions, so the
    join strategy is left to AQE (broadcast while the overridden-id
    set is small, shuffle once it isn't) rather than forced — a
    forced broadcast could carry up to half the corpus's doc_ids at
    the compaction threshold."""
    import os

    base = spark.read.parquet(os.path.join(path, "kept")).select(
        "doc_id", "sh_arr"
    )
    over_dir = os.path.join(path, "kept_over")
    if not os.path.isdir(over_dir) or not any(
        f.endswith(".parquet")
        for _, _, files in os.walk(over_dir)
        for f in files
    ):  # absent OR zero-file (empty delta onto a compacted base, r11)
        return base
    over = spark.read.parquet(over_dir)  # (doc_id, sh_arr, gen)
    w = Window.partitionBy("doc_id").orderBy(F.desc("gen"))
    latest = (
        over.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "sh_arr")
    )
    overridden = latest.select("doc_id")
    return (
        base.join(overridden, "doc_id", "left_anti")
        .unionByName(latest)
        .filter(F.size("sh_arr") > 0)
    )


def _shingle_store(spark, sf_dir: str) -> dict[str, DataFrame]:
    """Dict of the materialized artifact's tables — ``arrays`` (full
    per-doc sets), ``kept`` (stop-filtered, PPJoin df-sorted),
    ``hashes`` (doc_id, h32), ``stop`` (shingle), ``bands`` (the banded
    MinHash LSH index), ``simsig`` (the SimHash signature index) —
    building the artifact on miss (see ``build_shingle_artifact``)."""
    import os

    path = build_shingle_artifact(spark, sf_dir)
    store = {
        name: spark.read.parquet(os.path.join(path, name))
        for name in (
            "arrays", "kept", "hashes", "stop", "df", "bands", "simsig", "simsig64",
        )
    }
    # kept is the flat base plus merge-on-read override generations
    # after appends; consumers see the logical (doc_id, sh_arr)
    # relation — storage is a detail
    store["kept"] = resolve_kept(spark, path)
    return store


def _link_tree(src: str, dst: str) -> None:
    """copytree with hard links (byte reuse), copy fallback for
    filesystems without link support."""
    import shutil

    try:
        shutil.copytree(src, dst, copy_function=os.link)
    except OSError:
        shutil.rmtree(dst, ignore_errors=True)
        shutil.copytree(src, dst)


def _side_gen_numbers(store_path: str, name: str) -> list[int]:
    """Generation numbers present in a gen-partitioned side table
    (``df_delta``/``pending``), [] when the dir is absent/empty."""
    d = os.path.join(store_path, name)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(e.split("=", 1)[1]) for e in os.listdir(d) if e.startswith("gen=")
    )


def has_unmerged_deltas(store_path: str) -> bool:
    """True when a store carries deferred-merge side tables that a heavy
    fold has not yet folded into df/stop/kept/meta."""
    return bool(
        _side_gen_numbers(store_path, "df_delta")
        or _side_gen_numbers(store_path, "pending")
    )


def append_to_shingle_artifact(
    spark,
    base_path: str,
    delta_docs: DataFrame,
    out_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    defer_merge: bool = False,
    assume_empty_delta: bool = False,
) -> str:
    """Incremental (append-only) shingle-store build: fold a delta of
    NEW documents into an existing artifact, producing a complete store
    at ``out_path`` equivalent to rebuilding from the unioned corpus —
    the 100 TB operating shape (r5 verdict #2): the crawl appends, the
    store appends; only the delta ever pays tokenize/shingle CPU.

    What appends vs what merges vs what partially rebuilds:

    - ``arrays`` / ``hashes`` / ``bands`` / ``simsig`` — strictly
      per-document tables: delta rows are computed from the delta alone
      (same shared tokenize/shingle/hash/signature definitions as the
      full build) and APPENDED. Existing files are reused byte-for-byte
      (hard-linked where the filesystem allows, else copied — on object
      storage this is a metadata copy).
    - ``df`` — sum-MERGED: append-only means document frequencies only
      grow, so new df = old df + delta df, one keyed aggregate over the
      (small) df tables. This persisted table is what makes the store
      appendable at all; without it the corpus would be recounted.
    - ``stop`` — refiltered from the merged df (the refresh policy:
      boilerplate status is a pure function of current df).
    - ``kept`` — MERGE-ON-READ: kept arrays bake in the global
      (df, shingle) PPJoin sort order, and a df changes only for
      shingles that occur in the delta. Docs sharing no shingle with
      the delta have bit-identical kept rows; docs that do share one —
      including every doc whose shingle crossed the stop cutoff, since
      crossing requires a delta occurrence — are re-sorted against the
      merged df and written as ONE new override generation
      (``kept_over/gen=N``); base files and prior generations are
      reused byte-for-byte, and ``resolve_kept`` merges at read time
      (newest generation per doc, broadcast anti-join on the base).
      Bytes written scale with delta reach, not corpus size. Once
      overrides exceed half the base, the logical table is compacted
      back into a fresh flat base (amortized LSM fold). Both the
      affected-doc detection and the rebuild read the stop-free
      logical ``kept``, not ``arrays``: append-only df growth means a
      base stop shingle can never un-stop, so an old doc's new kept
      set is always a subset of its old one — shingles already
      filtered out can't come back and can't change its sort keys.

    Cost model (measured at sf0.1/sf1, PERF.md rounds 6-7): tokenize /
    hash / signature CPU is pure delta; df/stop are O(distinct
    shingles) merges; kept's former O(corpus) rewrite is gone (r6
    verdict #3) — an append WRITES only the override generation
    (affected ∪ delta rows) plus the periodic amortized compaction.
    The remaining O(corpus) terms are cheap columnar READS (affected
    detection and the resolve-merge scan), which at 100 TB parallelize
    across the cluster; write bandwidth — the term that was the
    bottleneck — now scales with delta reach alone.

    Assumes delta doc_ids are new (a revision is delete+append, not
    handled here). Writes under a pid tmp dir and renames, like the
    full build. Returns ``out_path``.

    ``defer_merge=True`` (r11 verdict #4, the streaming hot path):
    ONLY the strictly per-delta work runs — per-doc table appends plus
    two gen-partitioned side tables, ``df_delta/gen=K`` (this delta's
    shingle counts) and ``pending/gen=K`` (this delta's doc ids);
    df/stop/kept/meta are hard-linked UNCHANGED from the base (stale
    as of the last merging fold). The streaming probe path
    (operators/stream_dedup.py) reads only bands+arrays, which stay
    fresh. A later NON-deferred fold (any delta, including an empty
    one — ``refresh_store``) folds the ACCUMULATED side tables into
    df/stop/kept/meta: the merge work is batched at the maintenance
    cadence instead of being re-paid per micro-batch, exactly like
    ``kept``'s merge-on-read generations.

    ``assume_empty_delta=True`` (r13, the ``merge_backlog`` caller):
    the caller DECLARES the delta is zero rows, so every per-delta
    relation (arrays/hashes/signature appends, delta df counts, delta
    meta advance) is skipped outright instead of running ~7 Spark jobs
    over empty data — the merge fold then touches only the backlog
    side tables and the merge-owned df/stop/kept/meta derivation.

    Wall-clock shape (r13 optimization): independent table writes land
    CONCURRENTLY off serially-forced caches (the `_write_artifact_tables`
    pattern) — a deferred fold is 3 job waves (arrays; hashes; 5
    parallel side/signature writes) instead of 7 sequential jobs, and
    the heavy fold overlaps the df merge with the signature appends and
    the kept rebuild with the df/stop writes."""
    import math
    import shutil
    from concurrent.futures import ThreadPoolExecutor

    width = spark.sparkContext.defaultParallelism
    if not assume_empty_delta:
        # Widen the delta BEFORE the tokenize/shingle/hash chain (r14,
        # guide §2 — the streaming twin of ``widen_scan``): a micro-batch
        # is typically ONE small parquet file = one input split, so the
        # whole fold's regex/array CPU ran on a single core (measured
        # 5.4 s -> 4.0 s per sf0.1 light fold at 32 cores). Width is
        # SCALE-ADAPTIVE, never a local constant: ~_FOLD_DOCS_PER_TASK
        # docs per task (below that, per-task/job fixed overhead
        # dominates — repartition(32) of the same 5k-doc delta measured
        # WORSE than repartition(8)), capped at the session width, and
        # only ever widening (an already-parallel large delta is left
        # alone — no extra exchange at real scale). Hash-partitioned on
        # the unique id column: deterministic under task retry (guide
        # §2.5), no sort-before-repartition pass.
        n_delta = delta_docs.count()
        target = max(1, min(width, math.ceil(n_delta / _FOLD_DOCS_PER_TASK)))
        if target > delta_docs.rdd.getNumPartitions():
            delta_docs = delta_docs.repartition(target, id_col)
    tmp = f"{out_path}.tmp{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)

    def base(name):
        return spark.read.parquet(os.path.join(base_path, name))

    def _run_all(thunks):
        if not thunks:
            return
        with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
            list(pool.map(lambda f: f(), thunks))

    empty_delta = assume_empty_delta
    delta_arr = (
        None if empty_delta else shingle_arrays_of(delta_docs, id_col, text_col).cache()
    )
    delta_rows = (
        None
        if empty_delta
        else delta_arr.select("doc_id", F.explode("sh_arr").alias("shingle")).cache()
    )
    delta_df_counts = (
        None
        if empty_delta
        else delta_rows.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    )
    # deferred-merge backlog carried by the base (empty lists on a
    # fully-merged base: the heavy path below then reduces exactly to
    # the original single-delta fold)
    df_delta_gens = _side_gen_numbers(base_path, "df_delta")
    pending_gens = _side_gen_numbers(base_path, "pending")
    delta_hashes = None
    try:
        # reuse the per-doc tables' existing files, then append the delta
        for name in ("arrays", "hashes", "bands", "simsig", "simsig64"):
            _link_tree(os.path.join(base_path, name), os.path.join(tmp, name))
        sig_items = []
        delta_combined = None
        if not empty_delta:
            # ONE cache-forcing job (the delta_hashes count computes the
            # whole delta_arr -> delta_rows -> delta_hashes chain, so a
            # single pass populates all three caches); every per-doc
            # append is then an independent read of a forced cache and
            # lands concurrently below. The three signature tables come
            # from ONE combined aggregation pass over the forced hashes
            # cache (r14, _signature_tables_single_pass) instead of
            # three separate doc_id-keyed aggregates.
            delta_hashes = delta_rows.select(
                "doc_id",
                h32_expr("shingle").alias("h32"),
                h32b_expr("shingle").alias("h32b"),
            ).cache()
            # the combined-signature count inside
            # _signature_tables_single_pass is the ONE cache-forcing
            # job: it computes through (and populates) the delta_arr ->
            # delta_rows -> delta_hashes cache chain on its way to the
            # 80-aggregate pass (r14; the separate delta_hashes.count()
            # forcing job is gone)
            d_bands, d_simsig, d_simsig64, delta_combined = (
                _signature_tables_single_pass(delta_hashes)
            )
            sig_items = [
                ("arrays", delta_arr),
                ("hashes", delta_hashes),
                ("bands", d_bands),
                ("simsig", d_simsig),
                ("simsig64", d_simsig64),
            ]

        def _sig_thunk(name, df):
            return lambda: df.write.mode("append").parquet(os.path.join(tmp, name))

        if defer_merge:
            # LIGHT fold: link the merge-owned tables unchanged, then
            # append this delta's side-table generation. Everything
            # below this branch is O(delta) — no corpus-wide df merge,
            # no resolve_kept scan, no kept override derivation.
            for name in ("df", "stop", "kept", "kept_over", "meta",
                         "df_delta", "pending"):
                src = os.path.join(base_path, name)
                if os.path.isdir(src):
                    _link_tree(src, os.path.join(tmp, name))
            next_gen = max(df_delta_gens + pending_gens, default=0) + 1
            writes = [_sig_thunk(name, df) for name, df in sig_items]
            if not empty_delta:
                writes.append(
                    lambda: (
                        delta_df_counts.withColumn("gen", F.lit(next_gen))
                        .coalesce(4)
                        .write.mode("append")
                        .partitionBy("gen")
                        .parquet(os.path.join(tmp, "df_delta"))
                    )
                )
                writes.append(
                    lambda: (
                        delta_arr.select("doc_id")
                        .withColumn("gen", F.lit(next_gen))
                        .coalesce(4)
                        .write.mode("append")
                        .partitionBy("gen")
                        .parquet(os.path.join(tmp, "pending"))
                    )
                )
            _run_all(writes)
            if delta_hashes is not None:
                delta_hashes.unpersist()
            if delta_combined is not None:
                delta_combined.unpersist()
            open(os.path.join(tmp, "_DONE"), "w").close()
            shutil.rmtree(out_path, ignore_errors=True)
            os.rename(tmp, out_path)
            return out_path

        # HEAVY fold: merge this delta AND any deferred backlog into
        # df/stop/kept/meta. Backlog doc rows are regenerated from the
        # already-appended arrays table (per-doc sh_arr explode — the
        # same rows the light folds computed), never re-tokenized.
        backlog_df = (
            spark.read.parquet(os.path.join(base_path, "df_delta")).select(
                "shingle", F.col("df").cast("bigint").alias("df")
            )
            if df_delta_gens
            else None
        )
        pending_ids = (
            spark.read.parquet(os.path.join(base_path, "pending")).select(
                "doc_id"
            )
            if pending_gens
            else None
        )
        merged_df = base("df")
        if delta_df_counts is not None:
            merged_df = merged_df.unionByName(delta_df_counts)
        if backlog_df is not None:
            merged_df = merged_df.unionByName(backlog_df)
        merged_df = (
            merged_df.groupBy("shingle")
            .agg(F.sum("df").cast("bigint").alias("df"))
            .cache()
        )
        # force merged_df ONCE (the count doubles as the meta
        # n_distinct below), overlapped with the independent signature
        # appends; the df/stop writes then read the forced cache and
        # overlap with the kept rebuild
        n_distinct_box = []
        _run_all(
            [lambda: n_distinct_box.append(merged_df.count())]
            + [_sig_thunk(name, df) for name, df in sig_items]
        )
        n_distinct = n_distinct_box[0]

        # kept: MERGE-ON-READ append (r6 verdict #3). Base files AND
        # prior override generations are reused byte-for-byte
        # (hard-linked); the re-sorted rows
        # of affected ∪ new docs land as ONE new override generation
        # ``kept_over/gen=N`` that ``resolve_kept`` merges at read
        # time (newest gen per doc wins, base anti-joined on the tiny
        # overridden-id set). Bytes written scale with DELTA REACH,
        # never corpus size — the property bucket-level reuse could
        # not deliver on corpora with pervasive shingle sharing (a
        # 5-doc delta's 1.4k-doc affected set touches all 64 buckets,
        # PERF.md round 7). Detection and rebuild both read the
        # logical stop-free kept — dfs only grow on append, so a doc's
        # new kept set ⊆ old kept set; arrays never need re-exploding.
        changed = None
        if delta_df_counts is not None:
            changed = delta_df_counts.select("shingle")
        if backlog_df is not None:
            bsh = backlog_df.select("shingle")
            changed = bsh if changed is None else changed.unionByName(bsh)
        if changed is None:  # empty delta onto a backlog-free base
            changed = base("df").filter(F.lit(False)).select("shingle")
        old_kept = resolve_kept(spark, base_path)
        old_kept_rows = old_kept.select(
            "doc_id", F.explode("sh_arr").alias("shingle")
        )
        affected = (
            old_kept_rows.join(changed, "shingle", "left_semi")
            .select("doc_id")
            .distinct()
            .cache()
        )
        for name in ("kept", "kept_over"):
            src = os.path.join(base_path, name)
            if not os.path.isdir(src):
                continue
            _link_tree(src, os.path.join(tmp, name))
        rebuild_rows = old_kept_rows.join(affected, "doc_id", "left_semi")
        if delta_rows is not None:
            rebuild_rows = rebuild_rows.unionByName(delta_rows)
        pending_rows = None
        if pending_ids is not None:
            # backlog docs: their kept rows were never derived (light
            # folds skip it), so they join the rebuild exactly like
            # delta docs — rows re-exploded from their appended arrays.
            # Cached: the meta n_rows advance below re-counts it.
            pending_rows = (
                base("arrays")
                .join(pending_ids, "doc_id", "left_semi")
                .select("doc_id", F.explode("sh_arr").alias("shingle"))
                .cache()
            )
            rebuild_rows = rebuild_rows.unionByName(pending_rows)
        kept_nonstop = (
            rebuild_rows.join(merged_df.filter(F.col("df") <= STOP_SHINGLE_DF), "shingle")
            .groupBy("doc_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct(F.col("df"), F.col("shingle").alias("s")))
                ).alias("karr")
            )
            .select("doc_id", F.col("karr.s").alias("sh_arr"))
        )
        # EVERY affected doc gets an override row — one whose entire
        # kept set crossed the stop cutoff gets a TOMBSTONE (empty
        # sh_arr) that resolve_kept drops post-merge. Without it, such
        # a doc never enters the generation, the inner join above
        # yields no row, and the reader keeps serving its stale base
        # row with now-stop shingles: build(A)+append(B) would diverge
        # from build(A∪B) (r7 advice, high). Only AFFECTED docs need
        # the tombstone — a NEW delta doc has no base row to mask, so
        # an empty-set delta doc simply gets no row, exactly like the
        # full build (and doesn't inflate the compaction trigger).
        tombstones = affected.join(
            kept_nonstop, "doc_id", "left_anti"
        ).select(
            "doc_id",
            F.expr("CAST(array() AS array<string>)").alias("sh_arr"),
        )
        kept_rebuilt = kept_nonstop.unionByName(tombstones)
        over_dir = os.path.join(tmp, "kept_over")
        prior_gens = (
            [
                int(e.split("=", 1)[1])
                for e in os.listdir(over_dir)
                if e.startswith("gen=")
            ]
            if os.path.isdir(over_dir)
            else []
        )
        # the df/stop writes read only the forced merged_df cache, so
        # they overlap the (heavier) kept-override rebuild
        _run_all(
            [
                lambda: (
                    kept_rebuilt.withColumn(
                        "gen", F.lit(max(prior_gens, default=0) + 1)
                    )
                    .repartition(width)
                    .write.mode("append")
                    .partitionBy("gen")
                    .parquet(over_dir)
                ),
                lambda: (
                    merged_df.repartition(width)
                    .write.mode("overwrite")
                    .parquet(os.path.join(tmp, "df"))
                ),
                lambda: (
                    merged_df.filter(F.col("df") > STOP_SHINGLE_DF)
                    .select("shingle")
                    .repartition(width)
                    .write.mode("overwrite")
                    .parquet(os.path.join(tmp, "stop"))
                ),
            ]
        )
        # LSM compaction: once DISTINCT overridden docs exceed half
        # the base, fold the logical kept back into a fresh flat base
        # and clear the generations — amortized O(corpus) like any LSM
        # merge, keeping read-side merge state bounded. Distinct, not
        # raw generation rows: a doc overridden in N generations counts
        # once, so the trigger tracks the stated 0.5×-base semantics
        # (r7 advice, low).
        # an EMPTY delta onto a compacted base (no prior overrides)
        # writes a zero-file override dir Spark can't infer a schema
        # from — treat it as zero overrides (r11, surfaced by the
        # GC-replay test's empty regenerative fold)
        has_over_files = any(
            f.endswith(".parquet")
            for _, _, files in os.walk(over_dir)
            for f in files
        )
        # the compaction-trigger counts, the meta head and the delta /
        # backlog advance counts are all independent reads of already-
        # materialized state — one concurrent wave instead of six
        # sequential jobs
        counts: dict = {}

        def _count(key, fn):
            return lambda: counts.__setitem__(key, fn())

        count_thunks = [
            _count(
                "n_over",
                lambda: (
                    spark.read.parquet(over_dir).select("doc_id").distinct().count()
                    if has_over_files
                    else 0
                ),
            ),
            _count(
                "n_base",
                lambda: spark.read.parquet(os.path.join(tmp, "kept")).count(),
            ),
            _count("old_meta", lambda: base("meta").head()),
        ]
        if not empty_delta:
            count_thunks.append(_count("n_delta_docs", lambda: delta_arr.count()))
            count_thunks.append(_count("n_delta_rows", lambda: delta_rows.count()))
        if pending_ids is not None:
            count_thunks.append(_count("n_pending", lambda: pending_ids.count()))
            count_thunks.append(
                _count("n_pending_rows", lambda: pending_rows.count())
            )
        _run_all(count_thunks)
        n_over, n_base = counts["n_over"], counts["n_base"]
        if n_over > 0.5 * n_base:
            compacted = os.path.join(tmp, "kept.compact")
            (
                resolve_kept(spark, tmp)
                .repartition(width)
                .write.mode("overwrite")
                .parquet(compacted)
            )
            shutil.rmtree(os.path.join(tmp, "kept"))
            shutil.rmtree(over_dir)
            os.rename(compacted, os.path.join(tmp, "kept"))

        # manifest: counts advance by the delta's (already-forced)
        # sizes — all gathered in the concurrent wave above. Base meta
        # may be stale by the deferred backlog (light folds link it
        # unchanged); advance by backlog + this delta.
        old_meta = counts["old_meta"]
        n_docs = old_meta["n_docs"] + counts.get("n_delta_docs", 0)
        n_rows = old_meta["n_shingle_rows"] + counts.get("n_delta_rows", 0)
        n_docs += counts.get("n_pending", 0)
        n_rows += counts.get("n_pending_rows", 0)
        (
            spark.range(1)
            .select(
                F.lit(n_docs).cast("bigint").alias("n_docs"),
                F.lit(n_rows).cast("bigint").alias("n_shingle_rows"),
                F.lit(n_distinct).cast("bigint").alias("n_distinct_shingles"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(tmp, "meta"))
        )
        # the backlog is folded in: the merged store carries no side
        # tables (they were never linked into tmp on this path)
        if delta_hashes is not None:
            delta_hashes.unpersist()
        if delta_combined is not None:
            delta_combined.unpersist()
        if pending_rows is not None:
            pending_rows.unpersist()
        affected.unpersist()
        merged_df.unpersist()
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    finally:
        if delta_arr is not None:
            delta_arr.unpersist()
        if delta_rows is not None:
            delta_rows.unpersist()
    open(os.path.join(tmp, "_DONE"), "w").close()
    shutil.rmtree(out_path, ignore_errors=True)
    os.rename(tmp, out_path)
    return out_path


@register(
    "dedup_shingle_build",
    oracle=SHINGLES_SQL
    + """
SELECT CAST((SELECT count(*) FROM corpus) AS BIGINT)          AS n_docs,
       CAST((SELECT count(*) FROM sh) AS BIGINT)              AS n_shingle_rows,
       CAST((SELECT count(DISTINCT shingle) FROM sh) AS BIGINT) AS n_distinct_shingles
""",
    tags=("dedup", "build", "materialization"),
)
def dedup_shingle_build(spark, sf_dir):
    """The dedup suite's EXPLICIT BUILD STEP, registered so its cost is
    a visible bench entry instead of being re-paid invisibly inside
    every family query: force-rebuilds the materialized shingle store
    (tokenize -> per-doc shingle arrays -> h32 rows -> signature
    indexes -> parquet) and returns the corpus audit counts from the
    build MANIFEST the store writes alongside its tables (the numbers
    fall out of the cache-forcing counts, so auditing costs no extra
    artifact scan — the oracle recomputes them from the raw corpus).
    Downstream family members (``ngram_jaccard_pairs``,
    ``minhash_lsh_pairs``, ``simhash_pairs``) read the store via
    build-on-miss — in a bench run this entry always pays the full
    build, so their numbers are pure query cost, which is exactly how a
    100 TB dedup pass is operated (one shingle pass, N consumers)."""
    import os

    path = build_shingle_artifact(spark, sf_dir, force=True)
    return spark.read.parquet(os.path.join(path, "meta"))


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

@register(
    "dedup_exact",
    oracle="""
WITH unioned AS (
    SELECT text FROM documents UNION ALL SELECT text FROM documents
),
g AS (SELECT md5(text) AS k, count(*) AS c FROM unioned GROUP BY 1)
SELECT CAST(count(*) AS BIGINT)      AS n_unique,
       CAST(sum(c) AS BIGINT)        AS n_rows,
       CAST(sum(c - 1) AS BIGINT)    AS n_duplicates_removed
FROM g
""",
    tags=("dedup", "exact"),
)
def dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on a content digest over a doubled
    corpus. At 100 TB you group on md5(text) (128-bit key, map-side
    partial agg), never on the raw text bytes — this is that plan."""
    d = table(spark, sf_dir, "documents").select("text")
    unioned = d.unionByName(d)
    g = unioned.groupBy(F.md5("text").alias("k")).agg(F.count(F.lit(1)).alias("c"))
    return g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_unique"),
        F.sum("c").cast("bigint").alias("n_rows"),
        F.sum(F.col("c") - 1).cast("bigint").alias("n_duplicates_removed"),
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, shingle-blocked)
# ---------------------------------------------------------------------------

# Stop-shingle cutoff: shingles appearing in more documents than this
# carry no near-dup signal (boilerplate), and each one costs df^2 rows
# in the shared-shingle self-join — one shingle in 1% of a 100 TB
# corpus would alone generate ~10^14 candidate rows. Dropping them
# bounds per-key join fan-out at cutoff^2 and makes total join work
# linear in the number of distinct shingles. Jaccard is then computed
# over the informative (kept) shingle sets, identically on both
# engines. 20 sits above the sf0.01 max df (14), so the small-scale
# golden is byte-identical to the unfiltered form.
STOP_SHINGLE_DF = 20

# Round-7 design note: a doc_id-hash-bucketed kept layout (bucket-level
# file reuse at append) was implemented and then RETIRED by measurement
# — on this corpus even a 5-doc delta's affected set spans every bucket
# (pervasive shingle sharing, PERF.md round 7), so the partitioned
# layout bought zero reuse while costing a measurable per-query scan
# tax (64 bucket dirs vs 32 flat files: first-touch 3.8s vs 1.5s on
# the Jaccard kernel). Incremental kept maintenance is merge-on-read
# override generations instead (``resolve_kept`` /
# ``append_to_shingle_artifact``), which needs no special base layout.

# CTE-only form (no final SELECT) so eval harnesses can compose the
# exact-Jaccard pair set with other CTE families in one oracle.
_JACCARD_CTES = f"""
stop AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) > {STOP_SHINGLE_DF}),
kept AS (SELECT sh.* FROM sh WHERE shingle NOT IN (SELECT shingle FROM stop)),
ksizes AS (SELECT doc_id, count(*) AS sz FROM kept GROUP BY doc_id),
inter AS (
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS n_inter
    FROM kept x JOIN kept y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
    GROUP BY 1, 2
),
jac AS (
    SELECT i.doc_a, i.doc_b,
           round(n_inter / CAST(sa.sz + sb.sz - n_inter AS DOUBLE), 4) AS jaccard
    FROM inter i
    JOIN ksizes sa ON sa.doc_id = i.doc_a
    JOIN ksizes sb ON sb.doc_id = i.doc_b
)"""

_JACCARD_BODY = (
    _JACCARD_CTES
    + """
SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= 0.5
"""
)


def _jaccard_pairs_from_arrays(
    arr: DataFrame,
    cutoff: int = STOP_SHINGLE_DF,
    threshold: float = 0.5,
    pre_filtered: bool = False,
) -> DataFrame:
    """Exact Jaccard >= threshold over a (doc_id, shingle) DataFrame via
    PREFIX FILTERING (the PPJoin family's candidate bound): under any
    global total order of shingles, two docs with J(A,B) >= t must share
    a shingle within each doc's first ``|X| - ceil(t*|X|) + 1`` shingles
    (proof: J >= t implies |A∩B| >= t*|A|; if the prefix of A misses B
    entirely, the intersection fits in A's last ceil(t*|A|)-1 slots —
    contradiction). Ordering globally-rarest-first makes prefix shingles
    the LOW-df ones, so the candidate equi-join's per-key fan-out is
    tiny by construction — the co-shingle pair expansion that made the
    unfiltered join the bench's worst entry never happens.

    Candidates are then verified EXACTLY: per-doc shingle sets are
    collected once (bounded by doc length — safe state at any corpus
    size) and each candidate pair pays one array_intersect. Output is
    bit-identical to the naive all-co-shingle-pairs form; the oracle SQL
    keeps the naive shape as the independent rendering.

    The stop-shingle prefilter (``cutoff``) still applies first, to both
    the join and the Jaccard denominator — prefix filtering bounds the
    candidate count, the stop list bounds the worst single key.

    Input contract: if ``pre_filtered`` is set, ``arr.sh_arr`` is
    ALREADY stop-filtered and sorted in a consistent global order
    across docs (the store's ``kept`` table: ascending df, then
    shingle) — the kernel then does ZERO stop or sort work: size, a
    plain ``slice`` for the prefix, join, verify. Otherwise the arrays
    are arbitrary: stop shingles are removed by a broadcast anti-join
    on exploded rows and the kept sets are re-collected in global md5
    order (any fixed global order makes the prefix bound lossless; the
    order never reaches the output, which the naive-join oracle fixes
    order-free).

    Plan economics: the per-doc array form (one row per doc) is what
    gets cached and verified against — per-doc set state is bounded by
    doc length, safe at any corpus size. Everything stays codegen: no
    ``transform`` lambdas (their per-element interpreted evaluation was
    the kernel's hidden cost at one point), no per-row ``array_except``
    against a large stop array (rebuilds the stop hash set per row —
    measured 16s at sf0.1 before the store precomputed ``kept``). The
    verify joins carry the per-doc arrays; they are left unhinted so
    AQE broadcasts the array table when it is small and shuffles it
    when it is not — the scale-correct choice either way.

    Soundness at the rounding boundary: the output filter matches the
    oracle's DISPLAY form — ``round(J, 4) >= t`` — which admits pairs
    with true J in [t - 5e-5, t). All pruning (prefix length and the
    size-compatibility bound) therefore uses the RELAXED threshold
    t - 5e-5, so no pair the rounded filter would accept can be pruned
    from the candidate set."""
    prune_t = threshold - 5e-5
    if not pre_filtered:
        rows = arr.select("doc_id", F.explode("sh_arr").alias("shingle"))
        stop = (
            rows.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > cutoff)
            .select("shingle")
        )
        arr = (
            rows.join(F.broadcast(stop), "shingle", "left_anti")
            .groupBy("doc_id")
            .agg(
                F.array_sort(
                    F.collect_set(
                        F.struct(
                            F.md5("shingle").alias("h"),
                            F.col("shingle").alias("s"),
                        )
                    )
                ).alias("karr")
            )
            .select("doc_id", F.col("karr.s").alias("sh_arr"))
        )
    pre_len = f"cast(sz - ceil({prune_t} * sz) + 1 as int)"
    kd = (
        arr.withColumn("sz", F.size("sh_arr"))
        .withColumn("pre_arr", F.expr(f"slice(sh_arr, 1, {pre_len})"))
        .select("doc_id", "sh_arr", "pre_arr", "sz")
        .cache()
    )
    pre = kd.select(
        "doc_id", "sz", F.posexplode("pre_arr").alias("pos", "shingle")
    )
    x, y = pre.alias("x"), pre.alias("y")
    # size-compatibility bound: J <= min(sz)/max(sz), so J >= t requires
    # min(sz) >= t*max(sz) — prunes incompatible-size pairs BEFORE the
    # distinct (lossless; the 1e-9 slack keeps float t conservative)
    size_ok = (F.col("x.sz") >= F.lit(prune_t) * F.col("y.sz") - 1e-9) & (
        F.col("y.sz") >= F.lit(prune_t) * F.col("x.sz") - 1e-9
    )
    # POSITIONAL bound (the second P in PPJoin): J >= t requires
    # |A∩B| >= t/(1+t) * (|A|+|B|). For the EARLIEST common token of a
    # true pair — matched at 0-based positions px, py — no common token
    # precedes it on either side (a common u < w would sit before w in
    # BOTH sorted arrays and inside BOTH prefixes, contradicting
    # earliest), so the overlap fits in the suffixes from the match on:
    # |A∩B| <= min(szx - px, szy - py). Filtering each join ROW by that
    # bound is lossless: the earliest-common-token row of every true
    # pair passes, and distinct() keeps a pair if ANY row survives.
    # Rows where the matched token is NOT the earliest may undercount
    # the overlap and be dropped — that only removes duplicates of a
    # pair the earliest row already emits.
    ovl_min = F.lit(prune_t / (1.0 + prune_t)) * (F.col("x.sz") + F.col("y.sz"))
    pos_ok = (
        F.least(
            F.col("x.sz") - F.col("x.pos"), F.col("y.sz") - F.col("y.pos")
        ).cast("double")
        >= ovl_min - 1e-9
    )
    cand = (
        x.join(
            y,
            (F.col("x.shingle") == F.col("y.shingle"))
            & (F.col("x.doc_id") < F.col("y.doc_id"))
            & size_ok
            & pos_ok,
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    a = kd.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sh_arr").alias("arr_a"),
        F.col("sz").alias("sz_a"),
    )
    b = kd.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sh_arr").alias("arr_b"),
        F.col("sz").alias("sz_b"),
    )
    jac = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("n_inter", F.size(F.array_intersect("arr_a", "arr_b")))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")).cast("double"),
                4,
            ).alias("jaccard"),
        )
    )
    return jac.filter(F.col("jaccard") >= F.lit(threshold))


def _jaccard_pairs_from_shingles(
    sh: DataFrame, cutoff: int = STOP_SHINGLE_DF, threshold: float = 0.5
) -> DataFrame:
    """Row-form adapter over ``_jaccard_pairs_from_arrays`` for callers
    holding exploded (doc_id, shingle) rows: one groupBy(doc_id) builds
    the per-doc set arrays, then the array kernel's generic path does
    its own stop-filter + global-order sort. The registered query never
    pays any of this — it reads the store's pre-filtered, pre-sorted
    ``kept`` table directly."""
    arr = sh.groupBy("doc_id").agg(F.collect_set("shingle").alias("sh_arr"))
    return _jaccard_pairs_from_arrays(arr, cutoff=cutoff, threshold=threshold)


def _jaccard_pairs_by_count(arr: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Exact Jaccard >= threshold via the CO-SHINGLE COUNT shape: explode
    the (stop-filtered) per-doc arrays, self-join on shingle, and read
    n_inter straight out of a keyed (doc_a, doc_b) count aggregate — the
    classic MapReduce rendering of exact set-similarity join.

    vs the PPJoin kernel (``_jaccard_pairs_from_arrays``): the prefix
    kernel produces FEWER join rows (only rarest-prefix collisions) but
    pays an O(|set|) array_intersect per surviving candidate; this shape
    produces MORE join rows (every co-shingle pair, Σ df² over kept
    shingles — bounded by the stop cutoff at cutoff·Σdf) but the
    aggregate is a partial-agg hash count with no per-pair array state.
    Measured at sf0.1 (10k docs, ~200-shingle sets, 496k candidates):
    count shape ~1.9s vs prefix+verify ~4.4s steady — verification
    dominated, so fewer-candidates lost to cheaper-per-candidate. Both
    stay registered: this one behind the headline query, the prefix one
    driving ``simhash_recall_eval``'s ground truth, where the sampled
    corpus keeps the verify side small.

    Scale posture: one shuffle keyed on shingle (fan-out per key ≤
    stop-cutoff², worst key bounded by construction), one partial-agg
    shuffle keyed on the pair; doc set sizes ride the explode map-side
    — nothing is broadcast, nothing is quadratic in the corpus. The
    size-compatibility prune (J <= min/max ⇒ min >= t·max) drops
    incompatible pairs BEFORE the aggregate at the relaxed threshold
    t - 5e-5, so no pair the rounded display filter (round(J,4) >= t,
    the oracle's form) would accept is ever pruned."""
    prune_t = threshold - 5e-5
    rows = arr.select(
        "doc_id", F.size("sh_arr").alias("sz"), F.explode("sh_arr").alias("shingle")
    )
    x, y = rows.alias("x"), rows.alias("y")
    size_ok = (F.col("x.sz") >= F.lit(prune_t) * F.col("y.sz") - 1e-9) & (
        F.col("y.sz") >= F.lit(prune_t) * F.col("x.sz") - 1e-9
    )
    inter = (
        x.join(
            y,
            (F.col("x.shingle") == F.col("y.shingle"))
            & (F.col("x.doc_id") < F.col("y.doc_id"))
            & size_ok,
        )
        .groupBy(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.sz").alias("sz_a"),
            F.col("y.sz").alias("sz_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    jac = inter.select(
        "doc_a",
        "doc_b",
        F.round(
            F.col("n_inter")
            / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")).cast("double"),
            4,
        ).alias("jaccard"),
    )
    return jac.filter(F.col("jaccard") >= F.lit(threshold))


def _capped_kept(store: dict, m: int) -> DataFrame:
    """The stop-filtered kept relation of the HEAVY-CAPPED sub-corpus,
    recomputed from the store's per-doc arrays (arrays are per-doc, so
    filtering them equals tokenizing the capped corpus; stop/df are
    recomputed over the capped docs — matching a capped oracle whose
    ``sh`` CTE feeds its own stop/kept derivation). sh_arr is sorted by
    (capped df, shingle), the SAME global order the store build bakes
    in, so the PPJoin prefix bound stays sound on the capped
    relation."""
    rows = (
        store["arrays"]
        .filter(_doc_cap_pred(m))
        .select("doc_id", F.explode("sh_arr").alias("shingle"))
    )
    df_tab = rows.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    return (
        rows.join(df_tab.filter(F.col("df") <= STOP_SHINGLE_DF), "shingle")
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("df"), F.col("shingle").alias("s")))
            ).alias("karr")
        )
        .select("doc_id", F.col("karr.s").alias("sh_arr"))
    )


def _ngram_jaccard_oracle(sf_dir: str) -> str | None:
    """Callable oracle (r12): the exact-Jaccard pair SQL with the
    heavy-pair corpus cap resolved for THIS corpus — byte-identical to
    the former static text at every scale through sf10 (cap inactive).
    At sf100 the capped `sh` CTE feeds the SAME stop/kept derivation,
    so both engines compute the query over the identical sub-corpus."""
    pred = _heavy_cap_where(sf_dir)
    if pred is None:
        return None
    return _shingles_sql(pred) + ",\n" + _JACCARD_BODY


@register(
    "ngram_jaccard_pairs",
    oracle=_ngram_jaccard_oracle,
    tags=("dedup", "jaccard"),
)
def ngram_jaccard_pairs(spark, sf_dir):
    """Exact 3-gram Jaccard near-dup pairs over the stop-filtered
    shingle sets — the co-shingle count-aggregate kernel
    (``_jaccard_pairs_by_count``; measured 2x the prefix+verify kernel
    at this corpus — the kernel docstrings carry the full trade-off).
    The stop-shingle doc-frequency prefilter (``STOP_SHINGLE_DF``)
    bounds the worst join key's fan-out; the result is bit-identical to
    the naive form, which is exactly what the oracle CTE computes.

    Starts from the materialized shingle store's stop-filtered array
    table (``dedup_shingle_build``) — the tokenize/shingle pass is the
    family's shared build, not this query's cost. The PPJoin
    prefix-filtered kernel remains live as ``simhash_recall_eval``'s
    ground-truth producer.

    Above the r12 heavy-pair cap (sf100+) the pair kernel runs over
    the capped sub-corpus with stop/kept RECOMPUTED from the capped
    docs' arrays — matching the oracle, whose capped ``sh`` CTE feeds
    its own stop/kept derivation. Arrays are per-doc, so filtering
    them equals tokenizing the capped corpus; the recompute touches
    only the 1/M subset."""
    store = _shingle_store(spark, sf_dir)
    m = _heavy_cap_mod_for(spark, sf_dir)
    if m == 1:
        return _jaccard_pairs_by_count(store["kept"])
    return _jaccard_pairs_by_count(_capped_kept(store, m))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def verify_jaccard_pairs(
    cand: DataFrame,
    left_arrays: DataFrame,
    right_arrays: DataFrame,
    left_key: str,
    right_key: str,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact-Jaccard verification of a candidate pair set — THE one
    verify definition shared by every LSH-candidate consumer
    (``minhash_lsh_pairs``, ``incremental_near_dup``, and the streaming
    prober ``operators.stream_dedup``): join each side's per-doc
    shingle arrays, ``array_intersect`` for n_inter with set sizes
    taken map-side from array length, 4dp-rounded jaccard (the oracle's
    display form) filtered at ``threshold``. ``cand`` carries
    (left_key, right_key); the array relations carry (doc_id, sh_arr).
    One definition means a change to the rounding or threshold
    semantics cannot silently diverge between the three call sites."""
    a = left_arrays.select(
        F.col("doc_id").alias(left_key),
        F.col("sh_arr").alias("arr_a"),
        F.size("sh_arr").alias("sz_a"),
    )
    b = right_arrays.select(
        F.col("doc_id").alias(right_key),
        F.col("sh_arr").alias("arr_b"),
        F.size("sh_arr").alias("sz_b"),
    )
    jac = (
        cand.join(a, left_key)
        .join(b, right_key)
        .withColumn("n_inter", F.size(F.array_intersect("arr_a", "arr_b")))
        .select(
            left_key,
            right_key,
            F.round(
                F.col("n_inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")).cast("double"),
                4,
            ).alias("jaccard"),
        )
    )
    return jac.filter(F.col("jaccard") >= F.lit(threshold))


def _minhash_sig_ctes() -> str:
    """``sigs`` + ``bands`` CTE block (the SQL twin of
    ``_minhash_bands_from_hashes``), shared by the pair oracle and the
    incremental oracle."""
    mins = ",\n           ".join(
        f"min(({a} * h32 + {b}) % {_P}) AS mh{i}" for i, (a, b) in enumerate(MINHASH_PARAMS)
    )
    band_selects = "\n    UNION ALL\n".join(
        "    SELECT doc_id, {band} AS band, "
        "CAST(mh{j0} AS VARCHAR) || '_' || CAST(mh{j1} AS VARCHAR) || '_' || "
        "CAST(mh{j2} AS VARCHAR) || '_' || CAST(mh{j3} AS VARCHAR) AS sig FROM sigs".format(
            band=b, j0=4 * b, j1=4 * b + 1, j2=4 * b + 2, j3=4 * b + 3
        )
        for b in range(N_BANDS)
    )
    return f"""
sigs AS (
    SELECT doc_id,
           {mins}
    FROM sh GROUP BY doc_id
),
bands AS (
{band_selects}
)"""


def _minhash_sql(doc_pred: str = "") -> str:
    return (
        _shingles_sql(doc_pred)
        + ","
        + _minhash_sig_ctes()
        + """,
cand AS (
    SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
    FROM bands x JOIN bands y ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
),
inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS n_inter
    FROM cand c
    JOIN sh x ON x.doc_id = c.doc_a
    JOIN sh y ON y.doc_id = c.doc_b AND y.shingle = x.shingle
    GROUP BY 1, 2
),
jac AS (
    SELECT i.doc_a, i.doc_b,
           round(n_inter / CAST(sa.sz + sb.sz - n_inter AS DOUBLE), 4) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
)
SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= 0.5
"""
    )


def _minhash_oracle(sf_dir: str) -> str | None:
    """Callable oracle (r12): MinHash-LSH pair SQL with the heavy-pair
    cap resolved for THIS corpus — byte-identical to the former static
    text through sf10 (cap inactive). Signatures/bands/verify have no
    df dependence, so capping the ``sh`` CTE top-of-pipeline is exact
    for the capped sub-corpus."""
    pred = _heavy_cap_where(sf_dir)
    if pred is None:
        return None
    return _minhash_sql(pred)


@register("minhash_lsh_pairs", oracle=_minhash_oracle, tags=("dedup", "minhash", "lsh"))
def minhash_lsh_pairs(spark, sf_dir):
    """MinHash (16 hashes) + LSH (4 bands x 4 rows) near-dup candidate
    generation, then exact Jaccard verification of candidates only.

    Plan shape: one groupBy(doc_id) computes all 16 signature mins as
    parallel aggregates (no 16x row blowup), stack() unpivots to 4 band
    rows/doc, the band equi-join emits candidates, and only candidates
    pay the exact-verification join. This is the shape that scales:
    pair generation is (band, sig)-keyed, so work is proportional to
    true collisions, not corpus^2.

    Inputs come from the materialized shingle store
    (``dedup_shingle_build``): the banded signatures are read straight
    from the store's persisted ``bands`` LSH index (the signature
    aggregation is build cost, not query cost — the store IS the index);
    verification reads the per-doc array table (array_intersect over
    candidate pairs only — no shingle-row self-join), with set sizes
    taken map-side from the array length."""
    store = _shingle_store(spark, sf_dir)
    bands = store["bands"]
    m = _heavy_cap_mod_for(spark, sf_dir)
    if m > 1:  # r12 heavy-pair cap (sf100+): filter the persisted
        # per-doc band index — equals signaturing the capped corpus
        # (a doc's signature depends only on its own shingles); the
        # verify join only touches surviving candidates' docs
        bands = bands.filter(_doc_cap_pred(m))
    x, y = bands.alias("x"), bands.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.sig") == F.col("y.sig"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    return verify_jaccard_pairs(
        cand, store["arrays"], store["arrays"], "doc_a", "doc_b"
    )


@register(
    "incremental_near_dup",
    oracle=SHINGLES_SQL
    + ","
    + _minhash_sig_ctes()
    + """,
cand AS (
    SELECT DISTINCT d.doc_id AS new_doc_id, c.doc_id AS dup_of
    FROM bands d JOIN bands c ON d.band = c.band AND d.sig = c.sig
    WHERE d.doc_id >= 1000000 AND c.doc_id < 1000000
),
inter AS (
    SELECT cn.new_doc_id, cn.dup_of, count(*) AS n_inter
    FROM cand cn
    JOIN sh x ON x.doc_id = cn.new_doc_id
    JOIN sh y ON y.doc_id = cn.dup_of AND y.shingle = x.shingle
    GROUP BY 1, 2
),
jac AS (
    SELECT i.new_doc_id, i.dup_of,
           round(n_inter / CAST(sa.sz + sb.sz - n_inter AS DOUBLE), 4) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.new_doc_id
    JOIN sizes sb ON sb.doc_id = i.dup_of
)
SELECT new_doc_id, dup_of, jaccard FROM jac WHERE jaccard >= 0.5
""",
    tags=("dedup", "minhash", "lsh", "incremental"),
)
def incremental_near_dup(spark, sf_dir):
    """INCREMENTAL near-dup detection against a PERSISTED LSH index —
    the production flow of a dedup service at 100 TB: yesterday's corpus
    (original doc_ids < 1e6) is indexed once in the store's ``bands``
    table; today's re-crawl batch (the mutated copies, doc_id >= 1e6)
    pays signature aggregation for the DELTA ONLY and probes the stored
    index with a (band, sig)-keyed equi-join. Work scales with
    |delta| + collisions — the corpus is never re-signatured, never
    re-shuffled beyond the index probe. Candidates are exact-verified
    (array_intersect on the store's per-doc sets) at the family
    threshold; output is (new_doc_id, dup_of, jaccard) — the rows a
    crawler would drop before they ever reach the corpus.

    Extends ``incremental_dedup`` (exact-hash anti-join vs corpus) to
    NEAR duplicates; the sibling batch query ``minhash_lsh_pairs``
    reads the same index for the full self-join form. Reference frame:
    the reference dedups only within one in-memory frame
    (streamlit_app.py:147); an index you can probe incrementally is
    what that becomes at scale."""
    store = _shingle_store(spark, sf_dir)
    arrays, bands = store["arrays"], store["bands"]
    corpus_idx = bands.filter(F.col("doc_id") < 1000000)
    # the delta side signatures ONLY its own rows — at scale this is
    # the whole cost of the incremental pass besides the index probe
    delta = _minhash_bands_from_hashes(
        store["hashes"].filter(F.col("doc_id") >= 1000000)
    )
    cand = (
        delta.alias("d")
        .join(
            corpus_idx.alias("c"),
            (F.col("d.band") == F.col("c.band")) & (F.col("d.sig") == F.col("c.sig")),
        )
        .select(
            F.col("d.doc_id").alias("new_doc_id"), F.col("c.doc_id").alias("dup_of")
        )
        .distinct()
    )
    return verify_jaccard_pairs(cand, arrays, arrays, "new_doc_id", "dup_of")


# Winnowing parameters: window of W consecutive shingle hashes; pairs
# must share at least MIN_SHARED selected fingerprints to surface.
_WINNOW_W = 4
_WINNOW_MIN_SHARED = 5


def _winnowing_oracle(sf_dir: str) -> str | None:
    """Callable oracle (r12): winnowing pair SQL with the heavy-pair
    cap resolved for THIS corpus — byte-identical to the former static
    text through sf10 (cap inactive). The hot-fingerprint cutoff
    recomputes over the capped corpus on both engines (the Spark side
    filters the corpus before positional hashing)."""
    pred = _heavy_cap_where(sf_dir)
    if pred is None:
        return None
    return (
        "WITH "
        + CORPUS_SQL
        + f""",
tok AS (SELECT doc_id, {TOKS} AS t FROM corpus{pred}),
psh AS (
    SELECT doc_id, i - 1 AS pos,
           ('0x' || substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]), 25, 8))::BIGINT AS h32
    FROM tok, unnest(range(1, greatest(len(t) - 2, 0) + 1)) AS u(i)
),
wm AS (
    SELECT doc_id, pos,
           min(h32) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING) AS fp,
           count(*) OVER (PARTITION BY doc_id) AS n_sh
    FROM psh
),
fps AS (SELECT DISTINCT doc_id, fp FROM wm WHERE pos <= n_sh - {_WINNOW_W}),
hot AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) > {STOP_SHINGLE_DF}),
kept AS (SELECT * FROM fps WHERE fp NOT IN (SELECT fp FROM hot))
SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_shared
FROM kept x JOIN kept y ON x.fp = y.fp AND x.doc_id < y.doc_id
GROUP BY 1, 2 HAVING count(*) >= {_WINNOW_MIN_SHARED}
"""
    )


@register(
    "winnowing_fingerprint_pairs",
    oracle=_winnowing_oracle,
    tags=("dedup", "fingerprint", "winnowing"),
)
def winnowing_fingerprint_pairs(spark, sf_dir):
    """ROLLING-HASH document fingerprinting (winnowing, Schleimer/
    Wilkerson/Aiken): per doc, hash every POSITIONAL 3-token shingle,
    slide a window of 4 consecutive hashes, select each window's
    minimum — the distinct selected set is the doc's fingerprint sketch.
    The guarantee the set-hash (``fingerprint_clusters``) and MinHash
    families don't give: any shared token RUN of at least
    w + k - 1 = 6 tokens forces at least one shared fingerprint, so
    copied PASSAGES are detected even when whole-document similarity is
    low — the plagiarism/attribution shape, complementary to
    whole-doc Jaccard.

    Plan: positional shingles (posexplode — duplicates kept, order
    kept), one per-doc window min (doc-keyed sort, the window never
    crosses docs), distinct sketch, hot-fingerprint cut at the family's
    ``STOP_SHINGLE_DF`` (a boilerplate fingerprint in df docs would
    cost df^2 join rows — same bound as the shingle stop list), then a
    fingerprint-keyed self-join counted per pair. Work scales with
    fingerprint collisions; the sketch is ~|shingles|/w per doc, so the
    join input is w-fold smaller than the raw shingle table. Output:
    pairs sharing >= 5 fingerprints with the shared count. Hash
    positions are 0-based on both engines; only FULL windows select
    (the standard winnowing definition), so both engines see the same
    sketch. Above the r12 heavy-pair cap (sf100+) the corpus filters
    top-of-pipeline and the hot cutoff recomputes over the capped
    docs — mirroring the callable oracle."""
    c = _corpus(spark, sf_dir)
    m = _heavy_cap_mod_for(spark, sf_dir)
    if m > 1:
        c = c.filter(_doc_cap_pred(m))
    sh = (
        c.select(
            "doc_id",
            # r13: the per-doc positional-shingle COUNT is a pure
            # function of the token-array size — carrying it as a map
            # expression replaces the old unbounded count-over-window
            # pass (one whole WindowExec removed; same rows)
            (F.greatest(F.size("toks") - 2, F.lit(0)))
            .cast("bigint")
            .alias("n_sh"),
            F.posexplode(
                F.expr(
                    "if(size(toks) < 3, array(), "
                    "transform(sequence(1, size(toks) - 2), "
                    "i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1])))"
                )
            ).alias("pos", "shingle"),
        )
        .withColumn("h32", h32_expr("shingle"))
        .select("doc_id", "n_sh", "pos", "h32")
    )
    wwin = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(0, _WINNOW_W - 1)
    )
    fps = (
        sh.withColumn("fp", F.min("h32").over(wwin))
        .filter(F.col("pos") <= F.col("n_sh") - _WINNOW_W)
        .select("doc_id", "fp")
        .distinct()
        # r13: cached — fps feeds both the hot-fingerprint cut and the
        # (lifecycle: bench clear_caches / session clearCache owns the
        # release — ADVICE r13 #5)
        # kept anti-join side; uncached, the whole shingle/window
        # subtree ran twice
        .cache()
    )
    hot = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > STOP_SHINGLE_DF)
        .select("fp")
    )
    kept = fps.join(F.broadcast(hot), "fp", "left_anti")
    x, y = kept.alias("x"), kept.alias("y")
    return (
        x.join(
            y,
            (F.col("x.fp") == F.col("y.fp")) & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .groupBy(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= _WINNOW_MIN_SHARED)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def _simhash_ctes(src: str = "sh") -> str:
    """CTE block (votes -> sig -> blocked) shared by the pair query's
    oracle and the recall-eval oracle; ``src`` names the (doc_id,
    shingle, h32) relation the signature pass reads."""
    votes = ",\n           ".join(
        f"sum(CASE WHEN (h32 // {2 ** b}) % 2 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(32)
    )
    sig = " + ".join(f"(CASE WHEN v{b} > 0 THEN {2 ** b} ELSE 0 END)" for b in range(32))
    return f"""
votes AS (
    SELECT doc_id,
           {votes}
    FROM {src} GROUP BY doc_id
),
sig AS (SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM votes),
blocked AS (
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
           bit_count(xor(x.simhash, y.simhash)) AS hamming
    FROM sig x JOIN sig y
      ON x.doc_id < y.doc_id
     AND (x.simhash // 65536 = y.simhash // 65536
          OR x.simhash % 65536 = y.simhash % 65536)
)"""


def _simhash_sql(sf_dir: str) -> str | None:
    """Callable oracle (r11): the 32-bit SimHash pair SQL with the
    doc-side corpus cap resolved for THIS corpus — byte-identical to
    the former static text at every committed fixture. At sf10 the
    uncapped oracle's 32-aggregate vote pass over the full shingle
    relation plus the 10.3 M-row verified pair list was infeasible in
    any budget (r10: rows-only); the cap restricts BOTH engines to the
    same deterministic base-id sample at sf1 scale, where the oracle
    completes in ~16 s and the hash contract survives."""
    pred = _doc_cap_where(sf_dir)
    if pred is None:  # unreadable corpus -> rows-only fallback
        return None
    return (
        _shingles_sql(pred)
        + ","
        + _simhash_ctes()
        + """
SELECT DISTINCT doc_a, doc_b, hamming FROM blocked WHERE hamming <= 8
"""
    )


def _simhash_sig_from_hashes(sh: DataFrame) -> DataFrame:
    """(doc_id, simhash, hi16, lo16) 32-bit SimHash signatures from a
    (doc_id, h32) relation: one groupBy(doc_id) with 32 conditional-sum
    vote aggregates (integer-exact on both engines), signature assembled
    from vote signs, plus the two 16-bit block keys. Shared by the store
    build (persisted as the ``simsig`` index) and by callers that
    signature a restricted corpus."""
    vote_aggs = [
        F.sum(
            F.when((F.col("h32").bitwiseAND(F.lit(2 ** b))) != 0, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(32)
    ]
    votes = sh.groupBy("doc_id").agg(*vote_aggs)
    sig_expr = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN CAST({2 ** b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for b in range(32)
    )
    return votes.select(
        "doc_id",
        F.expr(sig_expr).cast("bigint").alias("simhash"),
    ).withColumns(
        {
            "hi16": F.expr("simhash div 65536"),
            "lo16": F.col("simhash") % 65536,
        }
    )


# r14: the module-level one-slot signature cache is GONE — the
# restricted pair sets now FILTER the persisted simsig/simsig64 index
# (a pure doc_id predicate selects exactly the restricted corpus's
# signatures), so there is no recomputed relation to hold across
# queries and the timed region of every bench entry is self-contained
# (VERDICT r13 #4).


def _sig64_vote_aggs() -> list:
    """The 64 conditional-sum vote aggregates of the 64-bit SimHash
    signature (32 per independent hash; the ``a`` half over h32 is
    bit-identical to the 32-bit family's votes). Shared by
    ``_simhash_sig64_from_hashes`` and the store build's combined
    single-pass signature aggregation."""
    aggs = []
    for col, tag in (("h32", "a"), ("h32b", "b")):
        aggs += [
            F.sum(
                F.when((F.col(col).bitwiseAND(F.lit(2 ** b))) != 0, 1).otherwise(-1)
            ).alias(f"v{tag}{b}")
            for b in range(32)
        ]
    return aggs


def _sig_sum_sql(tag: str) -> str:
    """Signature assembly from vote signs (SQL fragment over the
    ``v{tag}{b}`` vote columns)."""
    return " + ".join(
        f"(CASE WHEN v{tag}{b} > 0 THEN CAST({2 ** b} AS BIGINT) "
        "ELSE CAST(0 AS BIGINT) END)"
        for b in range(32)
    )


def _simhash_sig64_from_hashes(sh: DataFrame) -> DataFrame:
    """(doc_id, sim_a, sim_b, a_hi, a_lo, b_hi, b_lo) 64-bit SimHash
    signatures from a (doc_id, h32, h32b) relation: ONE groupBy(doc_id)
    with 64 conditional-sum vote aggregates (32 per independent hash),
    the two 32-bit halves assembled from vote signs, plus the four
    16-bit block keys. Persisted by the store build as ``simsig64``."""
    votes = sh.groupBy("doc_id").agg(*_sig64_vote_aggs())

    return votes.select(
        "doc_id",
        F.expr(_sig_sum_sql("a")).cast("bigint").alias("sim_a"),
        F.expr(_sig_sum_sql("b")).cast("bigint").alias("sim_b"),
    ).withColumns(
        {
            "a_hi": F.expr("sim_a div 65536"),
            "a_lo": F.col("sim_a") % 65536,
            "b_hi": F.expr("sim_b div 65536"),
            "b_lo": F.col("sim_b") % 65536,
        }
    )


def _simhash64_ctes(src: str = "sh") -> str:
    """CTE block (sh64 -> votes64 -> sig64 -> blocked64) shared by the
    64-bit pair query's oracle and the 64-bit recall-eval oracle;
    ``src`` names the (doc_id, shingle, h32) relation whose shingles get
    the second independent hash."""
    votes = ",\n           ".join(
        f"sum(CASE WHEN (h32 // {2 ** b}) % 2 = 1 THEN 1 ELSE -1 END) AS va{b}"
        for b in range(32)
    )
    votes_b = ",\n           ".join(
        f"sum(CASE WHEN (h32b // {2 ** b}) % 2 = 1 THEN 1 ELSE -1 END) AS vb{b}"
        for b in range(32)
    )
    sig_a = " + ".join(
        f"(CASE WHEN va{b} > 0 THEN {2 ** b} ELSE 0 END)" for b in range(32)
    )
    sig_b = " + ".join(
        f"(CASE WHEN vb{b} > 0 THEN {2 ** b} ELSE 0 END)" for b in range(32)
    )
    return f"""
sh64 AS (
    SELECT doc_id, shingle, h32,
           ('0x' || substr(md5(shingle), 9, 8))::BIGINT AS h32b
    FROM {src}
),
votes64 AS (
    SELECT doc_id,
           {votes},
           {votes_b}
    FROM sh64 GROUP BY doc_id
),
sig64 AS (
    SELECT doc_id,
           CAST({sig_a} AS BIGINT) AS sim_a,
           CAST({sig_b} AS BIGINT) AS sim_b
    FROM votes64
),
blocked64 AS (
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
           bit_count(xor(x.sim_a, y.sim_a)) + bit_count(xor(x.sim_b, y.sim_b))
               AS hamming
    FROM sig64 x JOIN sig64 y
      ON x.doc_id < y.doc_id
     AND (x.sim_a // 65536 = y.sim_a // 65536
          OR x.sim_a % 65536 = y.sim_a % 65536
          OR x.sim_b // 65536 = y.sim_b // 65536
          OR x.sim_b % 65536 = y.sim_b % 65536)
)"""


def _simhash64_sql(sf_dir: str) -> str | None:
    """Callable oracle (r11): 64-bit twin of ``_simhash_sql`` — same
    doc-side cap, same fixture byte-identity. The uncapped 64-aggregate
    vote pass was the registry's worst oracle at sf10 (>900 s at an
    extended budget while Spark's block-join answered in 111 s)."""
    pred = _doc_cap_where(sf_dir)
    if pred is None:  # unreadable corpus -> rows-only fallback
        return None
    return (
        _shingles_sql(pred)
        + ","
        + _simhash64_ctes()
        + """
SELECT DISTINCT doc_a, doc_b, hamming FROM blocked64 WHERE hamming <= 16
"""
    )


@register("simhash64_pairs", oracle=_simhash64_sql, tags=("dedup", "simhash"))
def simhash64_pairs(spark, sf_dir):
    """64-bit SimHash — the measured answer to the round-6 sf1 finding
    that 32-bit signatures admit O(n^2/2^16) random block collisions as
    the corpus grows (simhash_pairs output grew 40.8x for 10x docs,
    PERF.md round 6). Two independent 32-bit md5-substring hashes per
    shingle give a 64-bit signature; blocking on any of the FOUR 16-bit
    halves (union of four hash joins — an OR join condition would go
    nested-loop) and verifying hamming <= 16 keeps the SAME similarity
    strictness as 8/32 (25% of the width) while the random-pair
    acceptance rate drops from ~2.4e-3 to ~4.8e-9 — width is the dial
    a growing corpus turns, and this query IS that turned dial, reading
    the store's persisted ``simsig64`` index."""
    return _simhash64_pair_set(spark, sf_dir)


def _simhash64_pair_set(spark, sf_dir, doc_pred=None) -> DataFrame:
    """The verified 64-bit SimHash pair set (doc_a, doc_b, hamming<=16)
    — the operator body of ``simhash64_pairs``, shared with
    ``simhash64_recall_eval`` so the eval measures exactly the shipped
    pair generator (same structure as ``_simhash_pair_set``). The
    unrestricted path reads the store's persisted ``simsig64`` index;
    ``doc_pred`` restricts the corpus before signatures (sound: a doc's
    signature depends only on its own shingles) and caches the narrow
    restricted signature frame because the FOUR-block union self-join
    reads it eight times."""
    store = _shingle_store(spark, sf_dir)
    if doc_pred is None:
        sig = store["simsig64"]
        m = _doc_cap_mod_for(spark, sf_dir)
        if m > 1:  # doc-side corpus cap: filtering the persisted
            # per-doc signature index equals signaturing the capped
            # corpus (a doc's signature depends only on its own
            # shingles); no-op (m=1) at every committed fixture
            sig = sig.filter(_doc_cap_pred(m))
    else:
        # r14 (guide §2.4): every doc_pred is a pure doc_id predicate
        # (eval sample / corpus cap), so the restricted signatures are
        # a FILTER of the persisted per-doc index — the same soundness
        # argument as the cap branch above. The old path re-ran the
        # 64-aggregate vote pass over the filtered hashes table
        # (measured 4.6 s vs 2.2 s for the unrestricted persisted-index
        # path at sf0.1) and held the result in a module-level cache
        # slot; now the narrow filtered scans are cheap columnar
        # re-reads, no session cache entry needed.
        sig = store["simsig64"].filter(doc_pred)

    def block_join(key):
        x, y = sig.alias("x"), sig.alias("y")
        return x.join(
            y,
            (F.col(f"x.{key}") == F.col(f"y.{key}"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        ).select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            (
                F.bit_count(F.col("x.sim_a").bitwiseXOR(F.col("y.sim_a")))
                + F.bit_count(F.col("x.sim_b").bitwiseXOR(F.col("y.sim_b")))
            ).alias("hamming"),
        )

    pairs = (
        block_join("a_hi")
        .unionByName(block_join("a_lo"))
        .unionByName(block_join("b_hi"))
        .unionByName(block_join("b_lo"))
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= 16)


def _simhash_pair_set(spark, sf_dir, doc_pred=None) -> DataFrame:
    """The verified SimHash pair set (doc_a, doc_b, hamming<=8) — the
    operator body of ``simhash_pairs``, shared with
    ``simhash_recall_eval`` so the eval measures exactly the shipped
    pair generator. ``doc_pred`` optionally restricts the corpus (a
    Column predicate on doc_id) BEFORE signatures — sound because a
    doc's signature depends only on its own shingles; the unrestricted
    path reads the store's persisted ``simsig`` index instead of
    re-aggregating (signature work is build cost, like ``bands``)."""
    store = _shingle_store(spark, sf_dir)
    if doc_pred is None:
        # Persisted narrow parquet index: the 4 self-join reads are
        # cheap columnar re-scans — no session cache entry needed.
        sig = store["simsig"]
        m = _doc_cap_mod_for(spark, sf_dir)
        if m > 1:  # doc-side corpus cap (see _simhash64_pair_set)
            sig = sig.filter(_doc_cap_pred(m))
    else:
        # r14 (guide §2.4): doc_pred is a pure doc_id predicate, so the
        # restricted signatures are a FILTER of the persisted per-doc
        # index (see _simhash64_pair_set) — the old 32-aggregate vote
        # re-pass over filtered hashes and its module-level cache slot
        # are gone.
        sig = store["simsig"].filter(doc_pred)

    def block_join(key):
        x, y = sig.alias("x"), sig.alias("y")
        return x.join(
            y,
            (F.col(f"x.{key}") == F.col(f"y.{key}"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        ).select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.bit_count(F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))).alias("hamming"),
        )

    # OR-blocking as a UNION of two *hash* joins (an OR join condition
    # would force a nested-loop plan — quadratic at scale).
    pairs = block_join("hi16").unionByName(block_join("lo16")).distinct()
    return pairs.filter(F.col("hamming") <= 8)


@register("simhash_pairs", oracle=_simhash_sql, tags=("dedup", "simhash"))
def simhash_pairs(spark, sf_dir):
    """32-bit SimHash over 3-gram shingles with two-block LSH (high/low
    16 bits) and Hamming<=8 verification. The signature is a single
    groupBy(doc_id) with 32 conditional-sum aggregates — integer-exact on
    both engines. Blocking on either half of the signature (pigeonhole:
    hamming<=8 pairs usually agree on one half) keeps the pair join
    keyed, never quadratic. The signatures come straight from the
    store's persisted ``simsig`` index (``dedup_shingle_build``) — the
    32-aggregate pass is build cost, and shingle strings are never
    touched here."""
    return _simhash_pair_set(spark, sf_dir)


# Deterministic PAIRS-PRESERVING sample for the recall eval: an eval
# that embeds the exact pair producer runs on a sample at 100 TB by
# construction, so the harness samples HERE too, honestly and visibly.
# The corpus is originals (doc_id) + near-dup copies (doc_id + 1e6), so
# sampling on the BASE id (doc_id % 1e6) keeps every original together
# with its copy — near-dup pairs survive sampling intact; only the
# corpus shrinks (to a quarter). The same predicate is applied AFTER stop-filtering on
# both engines, so the full-corpus stop list / df-sort stay identical.
_EVAL_SAMPLE_SQL = "(doc_id % 1000000) % 4 = 0"


_RECALL_EVAL_BODY_32 = (
    f""",
stop AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) > {STOP_SHINGLE_DF}),
kept AS (
    SELECT sh.* FROM sh
    WHERE shingle NOT IN (SELECT shingle FROM stop) AND {_EVAL_SAMPLE_SQL}
),
ksizes AS (SELECT doc_id, count(*) AS sz FROM kept GROUP BY doc_id),
inter AS (
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS n_inter
    FROM kept x JOIN kept y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
    GROUP BY 1, 2
),
jac AS (
    SELECT i.doc_a, i.doc_b,
           round(n_inter / CAST(sa.sz + sb.sz - n_inter AS DOUBLE), 4) AS jaccard
    FROM inter i
    JOIN ksizes sa ON sa.doc_id = i.doc_a
    JOIN ksizes sb ON sb.doc_id = i.doc_b
),
ssh AS (SELECT * FROM sh WHERE {_EVAL_SAMPLE_SQL}),"""
    + _simhash_ctes(src="ssh")
    + """,
ex AS (SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= 0.5),
sim_pairs AS (SELECT DISTINCT doc_a, doc_b FROM blocked WHERE hamming <= 8),
j AS (
    SELECT CASE WHEN ex.jaccard >= 0.8 THEN 'high'
                WHEN ex.jaccard >= 0.65 THEN 'mid'
                ELSE 'low' END AS sim_band,
           (sp.doc_a IS NOT NULL) AS hit
    FROM ex LEFT JOIN sim_pairs sp
      ON ex.doc_a = sp.doc_a AND ex.doc_b = sp.doc_b
)
SELECT sim_band,
       CAST(count(*) AS BIGINT) AS n_exact,
       CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_simhash,
       round(sum(CASE WHEN hit THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 4) AS recall
FROM j GROUP BY sim_band
"""
)


def _simhash_recall_oracle(sf_dir: str) -> str | None:
    """Callable oracle (r12): the 32-bit recall-eval SQL with the
    heavy-pair cap in the shingle CTE — byte-identical through sf10
    (cap inactive); at sf100 the uncapped ``sh AS MATERIALIZED`` over
    the 10M-row corpus spilled >50 GB of DuckDB temp and filled the
    disk. The quarter eval sample composes with the cap on both
    engines (capped corpus, then base-id %4)."""
    pred = _heavy_cap_where(sf_dir)
    if pred is None:
        return None
    return _shingles_sql(pred) + _RECALL_EVAL_BODY_32


@register(
    "simhash_recall_eval",
    oracle=_simhash_recall_oracle,
    tags=("dedup", "simhash", "evaluation"),
)
def simhash_recall_eval(spark, sf_dir):
    """SELF-EVALUATING SIMHASH: recall of the shipped SimHash pair
    generator (two-block LSH + hamming<=8) against the exact-Jaccard
    ground truth (>=0.5, the family threshold), broken down by true
    similarity band — the measured counterpart of the docstring's
    pigeonhole argument, mirroring ``lsh_recall_eval``/``ivf_recall_eval``
    so every approximate dedup path in the engine publishes its
    recall/cost dial instead of asserting it. Expectation (and what the
    data shows): recall rises with the band — higher Jaccard means more
    shared shingles, which means more agreeing signature bits, so
    hamming<=8 and half-signature blocking both fire more often.

    Plan: ground truth is the prefix-filtered exact-Jaccard kernel,
    the SimHash side the two-block equi-join — both read the
    materialized shingle store, both restricted to the deterministic
    pairs-preserving QUARTER-corpus sample (``_EVAL_SAMPLE_SQL``: base
    ids = 0 mod 4, keeping each original with its near-dup copy) because an eval
    that embeds the exact producer runs on a sample at 100 TB by
    construction; the comparison is one keyed left join on the
    (doc_a, doc_b) composite. Sampling after stop-filtering keeps the
    full-corpus stop list and PPJoin df-order intact, so the exact
    kernel's prefix bound stays sound (any consistent global order
    over a subset is still consistent). Above the r12 heavy-pair cap
    (sf100+) both arms restrict to the capped sub-corpus first —
    stop/kept recomputed over it (``_capped_kept``), the quarter
    sample composing on top, mirroring the callable oracle."""
    store = _shingle_store(spark, sf_dir)
    m = _heavy_cap_mod_for(spark, sf_dir)
    sample = (F.col("doc_id") % 1000000) % 4 == 0
    kept = store["kept"] if m == 1 else _capped_kept(store, m)
    doc_pred = sample if m == 1 else (sample & _doc_cap_pred(m))
    exact = _jaccard_pairs_from_arrays(kept.filter(sample), pre_filtered=True)
    sim = _simhash_pair_set(spark, sf_dir, doc_pred=doc_pred).select(
        "doc_a", "doc_b", F.lit(1).alias("hit")
    )
    j = exact.join(sim, ["doc_a", "doc_b"], "left")
    band = (
        F.when(F.col("jaccard") >= 0.8, "high")
        .when(F.col("jaccard") >= 0.65, "mid")
        .otherwise("low")
    )
    return (
        j.select(band.alias("sim_band"), F.coalesce("hit", F.lit(0)).alias("hit"))
        .groupBy("sim_band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_exact"),
            F.sum("hit").cast("bigint").alias("n_simhash"),
            F.round(
                F.sum("hit") / F.count(F.lit(1)).cast("double"), 4
            ).alias("recall"),
        )
    )


_RECALL_EVAL_BODY_64 = (
    f""",
stop AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) > {STOP_SHINGLE_DF}),
kept AS (
    SELECT sh.* FROM sh
    WHERE shingle NOT IN (SELECT shingle FROM stop) AND {_EVAL_SAMPLE_SQL}
),
ksizes AS (SELECT doc_id, count(*) AS sz FROM kept GROUP BY doc_id),
inter AS (
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS n_inter
    FROM kept x JOIN kept y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
    GROUP BY 1, 2
),
jac AS (
    SELECT i.doc_a, i.doc_b,
           round(n_inter / CAST(sa.sz + sb.sz - n_inter AS DOUBLE), 4) AS jaccard
    FROM inter i
    JOIN ksizes sa ON sa.doc_id = i.doc_a
    JOIN ksizes sb ON sb.doc_id = i.doc_b
),
ssh AS (SELECT * FROM sh WHERE {_EVAL_SAMPLE_SQL}),"""
    + _simhash64_ctes(src="ssh")
    + """,
ex AS (SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= 0.5),
sim_pairs AS (SELECT DISTINCT doc_a, doc_b FROM blocked64 WHERE hamming <= 16),
j AS (
    SELECT CASE WHEN ex.jaccard >= 0.8 THEN 'high'
                WHEN ex.jaccard >= 0.65 THEN 'mid'
                ELSE 'low' END AS sim_band,
           (sp.doc_a IS NOT NULL) AS hit
    FROM ex LEFT JOIN sim_pairs sp
      ON ex.doc_a = sp.doc_a AND ex.doc_b = sp.doc_b
)
SELECT sim_band,
       CAST(count(*) AS BIGINT) AS n_exact,
       CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_simhash,
       round(sum(CASE WHEN hit THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 4) AS recall
FROM j GROUP BY sim_band
"""
)


def _simhash64_recall_oracle(sf_dir: str) -> str | None:
    """Callable oracle (r12): the 64-bit recall-eval SQL with the
    heavy-pair cap in the shingle CTE — see
    ``_simhash_recall_oracle``."""
    pred = _heavy_cap_where(sf_dir)
    if pred is None:
        return None
    return _shingles_sql(pred) + _RECALL_EVAL_BODY_64


@register(
    "simhash64_recall_eval",
    oracle=_simhash64_recall_oracle,
    tags=("dedup", "simhash", "evaluation"),
)
def simhash64_recall_eval(spark, sf_dir):
    """Recall contract of the 64-BIT SimHash pair generator
    (``simhash64_pairs``: four-block LSH + hamming<=16) against the
    same exact-Jaccard ground truth (>=0.5) and similarity bands as
    ``simhash_recall_eval`` — completing the width-dial datasheet: the
    sf1 sweep measured the 64-bit family's pair-growth benefit (11.5x
    vs 40.8x for 10x docs, PERF.md round 6); this query measures what
    that stricter acceptance costs in recall, on the identical
    deterministic pairs-preserving quarter sample so the two evals are
    directly comparable rows.

    Plan shape is the 32-bit eval's: exact kernel + restricted
    four-block pair set, both reading the materialized store, compared
    by one keyed left join. Hamming<=16 of 64 is the same fraction of
    signature width as 8 of 32, so recall differences are attributable
    to the width itself, not a threshold change. Above the r12
    heavy-pair cap (sf100+) both arms restrict to the capped
    sub-corpus first, mirroring the callable oracle (see
    ``simhash_recall_eval``)."""
    store = _shingle_store(spark, sf_dir)
    m = _heavy_cap_mod_for(spark, sf_dir)
    sample = (F.col("doc_id") % 1000000) % 4 == 0
    kept = store["kept"] if m == 1 else _capped_kept(store, m)
    doc_pred = sample if m == 1 else (sample & _doc_cap_pred(m))
    exact = _jaccard_pairs_from_arrays(kept.filter(sample), pre_filtered=True)
    sim = _simhash64_pair_set(spark, sf_dir, doc_pred=doc_pred).select(
        "doc_a", "doc_b", F.lit(1).alias("hit")
    )
    j = exact.join(sim, ["doc_a", "doc_b"], "left")
    band = (
        F.when(F.col("jaccard") >= 0.8, "high")
        .when(F.col("jaccard") >= 0.65, "mid")
        .otherwise("low")
    )
    return (
        j.select(band.alias("sim_band"), F.coalesce("hit", F.lit(0)).alias("hit"))
        .groupBy("sim_band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_exact"),
            F.sum("hit").cast("bigint").alias("n_simhash"),
            F.round(
                F.sum("hit") / F.count(F.lit(1)).cast("double"), 4
            ).alias("recall"),
        )
    )


def _near_dup_union_sql(sf_dir: str) -> str | None:
    """Callable oracle (r11): the candidate-union SQL with the same
    doc-side corpus cap as the simhash family (both generators AND the
    Jaccard verify read the capped ``sh`` relation, so the whole
    pipeline restricts consistently) — byte-identical to the former
    static text at every committed fixture; rows-only when the corpus
    is unreadable."""
    pred = _doc_cap_where(sf_dir)
    if pred is None:
        return None
    return (
        _shingles_sql(pred)
        + ","
        + _minhash_sig_ctes()
        + ","
        + _simhash64_ctes()
        + """,
ucand AS (
    SELECT DISTINCT doc_a, doc_b FROM (
        SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM bands x JOIN bands y
          ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
        UNION
        SELECT doc_a, doc_b FROM blocked64 WHERE hamming <= 16
    )
),
inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS n_inter
    FROM ucand c
    JOIN sh x ON x.doc_id = c.doc_a
    JOIN sh y ON y.doc_id = c.doc_b AND y.shingle = x.shingle
    GROUP BY 1, 2
),
jac AS (
    SELECT i.doc_a, i.doc_b,
           round(n_inter / CAST(sa.sz + sb.sz - n_inter AS DOUBLE), 4) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
)
SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= 0.5
"""
    )


@register(
    "near_dup_candidates_union",
    oracle=_near_dup_union_sql,
    tags=("dedup", "minhash", "simhash", "lsh", "union"),
)
def near_dup_candidates_union(spark, sf_dir):
    """Candidate-union near-dup (r7 verdict #5): MinHash 16x4 band
    collisions ∪ SimHash64 four-block collisions (hamming <= 16), then
    ONE exact-Jaccard verify pass over the deduplicated union — the
    production shape: candidate generators are cheap and miss
    different pairs (the width-dial datasheet has 64-bit SimHash
    topping out at 0.573 high-band recall where MinHash 16x4 is the
    >0.9 path), so systems union generators and pay verification once
    per DISTINCT candidate.

    Scale shape: both generators read persisted store indexes
    (``bands``, ``simsig64``) — signature work is build cost; each
    collision join is key-blocked (never corpus^2); the union's
    ``distinct()`` is one shuffle over candidate pairs, strictly
    smaller than verifying each generator's output separately; and
    only union-distinct survivors pay the ``array_intersect`` verify
    (``verify_jaccard_pairs`` — THE one verify definition, so this
    query cannot diverge from ``minhash_lsh_pairs`` semantics)."""
    store = _shingle_store(spark, sf_dir)
    bands = store["bands"]
    m = _doc_cap_mod_for(spark, sf_dir)
    if m > 1:  # doc-side corpus cap, mirrored by the callable
        # oracle's top-of-pipeline predicate; the simhash64 generator
        # below caps itself (same m, same base-id predicate) and the
        # Jaccard verify only touches the surviving pairs' docs
        bands = bands.filter(_doc_cap_pred(m))
    x, y = bands.alias("x"), bands.alias("y")
    mh_cand = x.join(
        y,
        (F.col("x.band") == F.col("y.band"))
        & (F.col("x.sig") == F.col("y.sig"))
        & (F.col("x.doc_id") < F.col("y.doc_id")),
    ).select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
    sh_cand = _simhash64_pair_set(spark, sf_dir).select("doc_a", "doc_b")
    cand = mh_cand.unionByName(sh_cand).distinct()
    return verify_jaccard_pairs(
        cand, store["arrays"], store["arrays"], "doc_a", "doc_b"
    )


SPAN_K = 12  # exact-substring span width (tokens)


@register(
    "exact_span_dedup",
    oracle=f"""
WITH {CORPUS_SQL},
tok AS MATERIALIZED (SELECT doc_id, {TOKS} AS t FROM corpus),
spans AS MATERIALIZED (
    SELECT DISTINCT doc_id,
           ('0x' || substr(md5(s), 25, 8))::BIGINT AS h
    FROM tok,
         unnest(list_transform(range(1, greatest(len(t) - {SPAN_K - 1}, 0) + 1),
                               i -> array_to_string(t[i:i + {SPAN_K - 1}], ' '))) AS u(s)
),
keepable AS (
    SELECT h FROM spans GROUP BY h HAVING count(*) <= {STOP_SHINGLE_DF}
),
ks AS MATERIALIZED (SELECT s.doc_id, s.h FROM spans s JOIN keepable USING (h))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS n_shared_spans
FROM ks a JOIN ks b ON a.h = b.h AND a.doc_id < b.doc_id
GROUP BY 1, 2
""",
    tags=("dedup", "spans", "exact-substring"),
)
def exact_span_dedup(spark, sf_dir):
    """EXACT-SUBSTRING dedup (the suffix-array family of Lee et al.,
    'Deduplicating Training Data Makes Language Models Better',
    rendered relationally): two docs are span-duplicates when they
    share a verbatim {SPAN_K}-token window. Complements the Jaccard
    family — bag-of-shingles similarity misses a verbatim paragraph
    pasted into an otherwise-different doc, while a long exact window
    is insensitive to global token-set drift.

    Spark shape: per-doc DISTINCT rolling {SPAN_K}-gram windows
    (transform over the token array — one narrow map, no explode until
    after dedup), each reduced to the family's 32-bit md5 hash so the
    shuffle carries (doc_id, bigint) rows, never span strings. Spans
    occurring in more than STOP_SHINGLE_DF docs are boilerplate and
    dropped BEFORE the self-join (same cutoff policy as the shingle
    store), so the equi-join on span hash is collision-bounded — work
    proportional to true sharing, never corpus^2. At 100 TB this is
    the standard two-shuffle shape: hash-partition by span, then by
    pair."""
    c = _corpus(spark, sf_dir)
    span_expr = (
        f"array_distinct(if(size(toks) < {SPAN_K}, array(), "
        f"transform(sequence(1, size(toks) - {SPAN_K - 1}), "
        f"i -> array_join(slice(toks, i, {SPAN_K}), ' '))))"
    )
    spans = (
        c.select("doc_id", F.explode(F.expr(span_expr)).alias("span"))
        .select("doc_id", h32_expr("span").alias("h"))
        # r13: cached (narrow doc_id+bigint rows) — feeds the hot cut
        # and both self-join sides; uncached, the tokenize/span/md5
        # pass ran three times
        .cache()
    )
    # broadcast the HOT side (winnowing's shape): the boilerplate list
    # is bounded by construction (few spans exceed df=20), while the
    # keepable complement is nearly every distinct span — the wrong
    # side to put in a broadcast at 100 TB
    hot = (
        spans.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > STOP_SHINGLE_DF)
        .select("h")
    )
    ks = spans.join(F.broadcast(hot), "h", "left_anti")
    a, b = ks.alias("a"), ks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_spans"))
    )


@register(
    "incremental_dedup",
    oracle=f"""
WITH fp AS (
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct({TOKS})), ' ')) AS fingerprint
    FROM documents
),
corpus AS (SELECT fingerprint FROM fp WHERE doc_id < 250),
batch AS (SELECT doc_id, fingerprint FROM fp WHERE doc_id >= 250)
SELECT CAST((SELECT count(*) FROM batch) AS BIGINT) AS n_batch,
       CAST((SELECT count(*) FROM batch b
             WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.fingerprint = b.fingerprint)) AS BIGINT) AS n_new,
       CAST((SELECT count(*) FROM batch b
             WHERE EXISTS (SELECT 1 FROM corpus c WHERE c.fingerprint = b.fingerprint)) AS BIGINT) AS n_dropped
""",
    tags=("dedup", "incremental", "anti"),
)
def incremental_dedup(spark, sf_dir):
    """Incremental dedup — the production shape: dedup a NEW BATCH
    against an existing corpus (here: doc_id >= 250 vs < 250) by
    fingerprint anti-join, never corpus x corpus. At 100 TB the corpus
    side is just a bloom filter or a fingerprint table partitioned by
    prefix; the batch anti-joins against it and only survivors are
    ingested."""
    from ..functions.text import stable_fingerprint

    fp = table(spark, sf_dir, "documents").select(
        "doc_id", stable_fingerprint("text").alias("fingerprint")
    )
    # ONE lazy plan: mark each batch row by a left join against the
    # distinct corpus fingerprints, then a single aggregate emits all
    # three counters — no driver-side .count() actions, one job total.
    corpus = fp.filter(F.col("doc_id") < 250).select("fingerprint").distinct()
    batch = fp.filter(F.col("doc_id") >= 250)
    marked = batch.join(corpus.withColumn("_hit", F.lit(1)), "fingerprint", "left")
    return marked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_batch"),
        F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0)).cast("bigint").alias("n_new"),
        F.sum(F.when(F.col("_hit").isNotNull(), 1).otherwise(0)).cast("bigint").alias("n_dropped"),
    )


# Blocking-suffix length for fuzzy name matching, scaled with the
# corpus — see plans/dials.py (_fuzzy_block_len) for the formula and
# the measured sf10 rationale (37x -> 2.4x, r10).
from .dials import _fuzzy_block_len  # noqa: E402 - colocated with use


def _fuzzy_name_match_oracle(sf_dir: str) -> str | None:
    from .similarity_queries import _parquet_total_count

    n = _parquet_total_count(sf_dir, "customer")
    if n is None:  # unreadable corpus -> rows-only fallback
        return None
    k = _fuzzy_block_len(n)
    return f"""
SELECT s.s_name, c.c_name,
       levenshtein(s.s_name, c.c_name) AS edit_distance
FROM supplier s JOIN customer c ON right(s.s_name, {k}) = right(c.c_name, {k})
WHERE levenshtein(s.s_name, c.c_name) <= 6
"""


@register(
    "fuzzy_name_match",
    oracle=_fuzzy_name_match_oracle,
    tags=("dedup", "fuzzy", "entity-resolution"),
)
def fuzzy_name_match(spark, sf_dir):
    """Blocked fuzzy entity matching: supplier x customer name pairs
    within Levenshtein distance 6, candidate pairs generated by a
    blocking equi-join (shared digit suffix) — the standard
    entity-resolution architecture: block, then verify with the
    expensive distance. Unblocked brute force is O(n*m) distance
    evaluations (measured 35s at sf0.1 vs <1s blocked); like the LSH
    queries, blocking trades a little recall for key-joinable scale.
    The block length scales with the corpus (``_fuzzy_block_len``:
    one extra suffix char per 10x customers) so per-block volume stays
    flat instead of growing quadratically. Verification uses the
    thresholded levenshtein (early-exit DP, returns -1 past the
    bound)."""
    from .similarity_queries import _parquet_total_count

    c = table(spark, sf_dir, "customer").select("c_name")
    # Derive k from the SAME count source the oracle uses (the parquet
    # footer), falling back to a Spark count only when the footer is
    # unreadable — so both engines provably block on the same key
    # length instead of diverging into a confusing hash mismatch when
    # the counts disagree (ADVICE r10).
    n = _parquet_total_count(sf_dir, "customer")
    k = _fuzzy_block_len(c.count() if n is None else n)
    s = table(spark, sf_dir, "supplier").select("s_name")
    blocked = c.join(
        F.broadcast(s), F.expr(f"right(s_name, {k})") == F.expr(f"right(c_name, {k})")
    )
    return (
        blocked.withColumn(
            "edit_distance", F.levenshtein(F.col("s_name"), F.col("c_name"), 6)
        )
        .filter(F.col("edit_distance") != -1)
        .select("s_name", "c_name", "edit_distance")
    )


def _cluster_sizes(pairs) -> DataFrame:
    from ..operators.graph import connected_components

    labels = connected_components(pairs, src="vec_a", dst="vec_b")
    return labels.groupBy(F.col("lbl").alias("cluster_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("size")
    )


def _min_label_cc_ctes(rounds: int = 16) -> str:
    """Chained-CTE connected components over an ``edges(s, d)`` relation
    (both directions present): UNROLLED min-label propagation with
    pointer halving — each round takes least(own label, label-of-label,
    min over in-neighbors' labels), so convergence needs O(log
    diameter) rounds and 16 covers any component this corpus family can
    produce. Ends with ``comp(v, cluster_id)`` plus
    ``cc_unconverged(n)``; every consumer appends a sentinel row from
    cc_unconverged so a non-converged propagation surfaces as a VISIBLE
    mismatch, never a silently wrong answer.

    Replaces the recursive ``reach`` CTE, which materialized the full
    (node, reachable-root) relation — O(|component|^2) rows. Fine on
    the small-scale corpora; on sf1's giant 0.4-radius random component
    (~20k nodes) that is ~4e8 accumulating rows and DuckDB ground for
    45+ minutes before the sweep's oracle budget cut it off.

    The propagation rounds run on a TWICE-CONTRACTED quotient graph
    (r7 verdict #2): each contraction maps every node to the min of
    its closed neighborhood (one grouped pass over the edge list) and
    keeps only DISTINCT edges between differing representatives. On
    the dense random-geometry components this corpus family produces,
    two contractions collapse the giant component to a few hundred
    quotient nodes, so the 16 unrolled rounds — formerly 16 joins over
    the FULL edge list, the term that blew sf1 past the default oracle
    budget — iterate over a relation thousands of times smaller. Exact
    at every step: contraction preserves connectivity, and a
    component's min node id m survives every level (l(m)=m at each),
    so the final labels are the same min-node-id labels the uncontracted
    propagation yields."""
    parts = [
        # contraction level 1: v -> min(closed neighborhood); every
        # node appears as s because edges carries both directions
        """l0 AS MATERIALIZED (
    SELECT s AS v, least(s, min(d)) AS l FROM edges GROUP BY s
)""",
        """e1 AS MATERIALIZED (
    SELECT DISTINCT a.l AS s, b.l AS d
    FROM edges e JOIN l0 a ON a.v = e.s JOIN l0 b ON b.v = e.d
    WHERE a.l <> b.l
)""",
        # contraction level 2 over the (already shrunken) quotient
        """l1 AS MATERIALIZED (
    SELECT s AS v, least(s, min(d)) AS l FROM e1 GROUP BY s
)""",
        """e2 AS MATERIALIZED (
    SELECT DISTINCT a.l AS s, b.l AS d
    FROM e1 e JOIN l1 a ON a.v = e.s JOIN l1 b ON b.v = e.d
    WHERE a.l <> b.l
)""",
        "r0 AS MATERIALIZED (SELECT DISTINCT s AS v, s AS l FROM e2)",
    ]
    for i in range(rounds):
        parts.append(
            f"""r{i + 1} AS MATERIALIZED (
    SELECT r.v, least(r.l, lj.l, coalesce(m.ml, r.l)) AS l
    FROM r{i} r
    JOIN r{i} lj ON lj.v = r.l
    LEFT JOIN (
        SELECT e.d AS v, min(r2.l) AS ml
        FROM e2 e JOIN r{i} r2 ON r2.v = e.s
        GROUP BY e.d
    ) m ON m.v = r.v
)"""
        )
    # map back down the contraction chain: v -> l0 -> l1 -> propagated
    # label; a representative absent from the next level up is its own
    # (already-minimal) component label
    parts.append(
        f"""comp AS (
    SELECT n.v,
           coalesce(rq.l, coalesce(up.l, n.l)) AS cluster_id
    FROM l0 n
    LEFT JOIN l1 up ON up.v = n.l
    LEFT JOIN r{rounds} rq ON rq.v = coalesce(up.l, n.l)
)"""
    )
    parts.append(
        f"""cc_unconverged AS (
    SELECT count(*) AS n
    FROM r{rounds} a JOIN r{rounds - 1} b USING (v)
    WHERE a.l <> b.l
)"""
    )
    return ",\n".join(parts)


def _near_dup_clusters_oracle(sf_dir: str) -> str | None:
    from .similarity_queries import _banded_buckets_cte, _banded_e_pred

    # Callable oracle: resolves the banded family's corpus-cap ``e``
    # predicate for THIS corpus (empty at every committed fixture; the
    # deterministic vec_id % M sample above _PAIRWISE_CAP vectors —
    # see similarity_queries._banded_e_pred for the sf10 rationale).
    pred = _banded_e_pred(sf_dir)
    if pred is None:  # unreadable corpus -> rows-only fallback
        return None
    # MATERIALIZED on en/cand/pairs is load-bearing for the sweep
    # budget (r7 verdict #2): non-materialized CTEs are inlined PER
    # REFERENCE, so `edges`' two branches re-verified all ~46M sf1
    # candidates twice and `en`'s norms were recomputed per pair —
    # 10+ min where one evaluation is ~45 s.
    return f"""
WITH {_banded_buckets_cte(pred)},
en AS MATERIALIZED (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM e),
cand AS MATERIALIZED (
    SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM (SELECT en.vec_id, bk.t, bk.bucket FROM en JOIN bbuckets bk USING (vec_id)) a
    JOIN (SELECT en.vec_id, bk.t, bk.bucket FROM en JOIN bbuckets bk USING (vec_id)) b
      ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id
),
pairs AS MATERIALIZED (
    SELECT c.vec_a, c.vec_b
    FROM cand c JOIN en x ON c.vec_a = x.vec_id JOIN en y ON c.vec_b = y.vec_id
    WHERE round(list_dot_product(x.emb, y.emb) / (x.nrm * y.nrm), 6) >= 0.4
),
edges AS MATERIALIZED (
    SELECT vec_a AS s, vec_b AS d FROM pairs
    UNION ALL
    SELECT vec_b AS s, vec_a AS d FROM pairs
),
{_min_label_cc_ctes()}
SELECT cluster_id, CAST(count(*) AS BIGINT) AS size
FROM comp GROUP BY cluster_id
UNION ALL
SELECT CAST(-1 AS BIGINT), n FROM cc_unconverged WHERE n > 0
"""


@register(
    "near_dup_clusters",
    oracle=_near_dup_clusters_oracle,
    tags=("dedup", "clusters", "iterative", "lsh"),
)
def near_dup_clusters(spark, sf_dir):
    """Connected components over the near-duplicate pair graph —
    TRANSITIVE dedup clusters (A~B, B~C => one cluster), the step that
    turns pairwise similarity into "keep one representative per group"
    for a training corpus. cluster_id = min vec_id in the component.

    THE PRODUCTION SHAPE: edges come from the banded-LSH candidate
    generator (4 tables x 4 bits, shared with ``lsh_banded_pairs``) with
    exact cosine verification at the 0.4 radius — work scales with
    bucket collisions, never corpus^2, and transitivity degrades cluster
    recall gracefully when a pair is missed (one bridging edge per
    cluster suffices). The oracle mirrors the identical md5-seeded
    candidate CTE, so the comparison is bit-exact at any recall; the
    recall trade itself is measured, not guessed — ``lsh_recall_eval``
    quantifies per-band pair recall, and ``near_dup_clusters_exact`` is
    the all-pairs ground truth to diff against at oracle scale.

    Spark rendering of the closure: ``operators.graph
    .connected_components`` — partition-local union-find contraction
    rounds (union-of-spanning-forests), pointer-halving min-label
    propagation for the adversarial tail. The DuckDB twin is a
    recursive CTE computing the min reachable vertex."""
    from .similarity_queries import _banded_pairs_base

    pairs = (
        _banded_pairs_base(spark, sf_dir)
        .filter(F.col("cos_sim") >= 0.4)
        .select("vec_a", "vec_b")
    )
    return _cluster_sizes(pairs)


def _near_dup_clusters_exact_oracle(sf_dir: str) -> str | None:
    from .similarity_queries import _e_cte_capped

    ecte = _e_cte_capped(sf_dir)
    if ecte is None:  # unreadable corpus -> rows-only fallback
        return None
    return f"""
WITH
{ecte},
en AS MATERIALIZED (
    SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM e
),
pairs AS MATERIALIZED (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM en a JOIN en b ON a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 6) >= 0.4
),
edges AS MATERIALIZED (
    SELECT vec_a AS s, vec_b AS d FROM pairs
    UNION ALL
    SELECT vec_b AS s, vec_a AS d FROM pairs
),
{_min_label_cc_ctes()}
SELECT cluster_id, CAST(count(*) AS BIGINT) AS size
FROM comp GROUP BY cluster_id
UNION ALL
SELECT CAST(-1 AS BIGINT), n FROM cc_unconverged WHERE n > 0
"""


@register(
    "near_dup_clusters_exact",
    oracle=_near_dup_clusters_exact_oracle,
    tags=("dedup", "clusters", "iterative", "exact"),
)
def near_dup_clusters_exact(spark, sf_dir):
    """Ground-truth twin of ``near_dup_clusters``: the same transitive
    closure over the EXACT all-pairs 0.4-radius graph (block-grid
    matmul, O(n^2) by definition — the oracle/evaluation path you run
    at sample scale to measure what the LSH edge generator misses,
    never the 100 TB path). 0.4 (tighter than the pair query's 0.3)
    yields ~42 multi-node clusters at the driver's corpus instead of
    one giant component — the structure the operator exists to
    surface. Above the pairwise corpus cap (similarity_queries
    ``_PAIRWISE_CAP``) both engines restrict to the deterministic
    vec_id % M sample — the definition of 'sample scale' made
    explicit (r9 verdict #7)."""
    from .similarity_queries import _block_grid_pairs

    pairs = _block_grid_pairs(spark, sf_dir, threshold=0.4).select("vec_a", "vec_b")
    return _cluster_sizes(pairs)




def _lang_vocab_sql() -> str:
    mins = ",\n           ".join(
        f"min(({a} * h32 + {b}) % {_P}) AS mh{i}"
        for i, (a, b) in enumerate(MINHASH_PARAMS)
    )
    match = " + ".join(
        f"(CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END)" for i in range(16)
    )
    return f"""
WITH tok AS (
    SELECT DISTINCT d.lang, u.token
    FROM (SELECT lang, {TOKS} AS ts FROM documents) d, unnest(d.ts) AS u(token)
),
h AS (
    SELECT lang, token,
           ('0x' || substr(md5(token), 25, 8))::BIGINT AS h32
    FROM tok
),
sigs AS (
    SELECT lang,
           {mins}
    FROM h GROUP BY lang
),
est AS (
    SELECT a.lang AS lang_a, b.lang AS lang_b,
           round(({match}) / 16.0, 4) AS est_jaccard
    FROM sigs a JOIN sigs b ON a.lang < b.lang
),
sizes AS (SELECT lang, count(*) AS sz FROM tok GROUP BY lang),
inter AS (
    SELECT a.lang AS lang_a, b.lang AS lang_b, count(*) AS i
    FROM tok a JOIN tok b ON a.token = b.token AND a.lang < b.lang
    GROUP BY 1, 2
)
SELECT e.lang_a, e.lang_b, e.est_jaccard,
       round(i.i / CAST(sa.sz + sb.sz - i.i AS DOUBLE), 4) AS exact_jaccard
FROM est e
JOIN inter i ON i.lang_a = e.lang_a AND i.lang_b = e.lang_b
JOIN sizes sa ON sa.lang = e.lang_a
JOIN sizes sb ON sb.lang = e.lang_b
"""


@register(
    "lang_vocab_minhash_sim",
    oracle=_lang_vocab_sql(),
    tags=("dedup", "minhash", "sketch", "evaluation"),
)
def lang_vocab_minhash_sim(spark, sf_dir):
    """MERGEABLE-SKETCH set similarity: per-language vocabulary overlap
    estimated from 16-hash MinHash signatures, next to the exact
    token-set Jaccard as its own accuracy check (matching-min fraction
    is an unbiased Jaccard estimator; with 16 hashes the stderr is
    ~sqrt(J(1-J)/16) ~ 0.12 — the query SHOWS that envelope holding).

    Why this matters at 100 TB: ``min`` is associative/commutative, so
    the signature is a partial aggregate — every partition sketches its
    own slice and the combiner min-merges, meaning cross-corpus set
    similarity costs one narrow pass + a |groups|-row shuffle, while
    the exact answer needs the full token-level equi-join this query
    runs alongside (affordable only because the corpus is small). Same
    md5-derived hash family as the pair-level MinHash (integer-exact on
    both engines)."""
    d = table(spark, sf_dir, "documents")
    toks = (
        d.select("lang", F.explode(F.expr(SPARK_TOKS)).alias("token"))
        .distinct()
        # r13: cached — feeds the signature aggregate, the sizes
        # aggregate and both sides of the exact-intersection join
        .cache()
    )
    h = toks.withColumn(
        "h32", h32_expr("token")
    )
    min_aggs = [
        F.min((F.lit(a) * F.col("h32") + F.lit(b)) % _P).alias(f"mh{i}")
        for i, (a, b) in enumerate(MINHASH_PARAMS)
    ]
    sigs = h.groupBy("lang").agg(*min_aggs)
    a, b = sigs.alias("a"), sigs.alias("b")
    match = sum(
        F.when(F.col(f"a.mh{i}") == F.col(f"b.mh{i}"), 1).otherwise(0)
        for i in range(16)
    )
    est = a.join(
        F.broadcast(b), F.col("a.lang") < F.col("b.lang")
    ).select(
        F.col("a.lang").alias("lang_a"),
        F.col("b.lang").alias("lang_b"),
        F.round(match / 16.0, 4).alias("est_jaccard"),
    )
    sizes = toks.groupBy("lang").agg(F.count(F.lit(1)).alias("sz"))
    tx, ty = toks.alias("x"), toks.alias("y")
    inter = (
        tx.join(
            ty,
            (F.col("x.token") == F.col("y.token"))
            & (F.col("x.lang") < F.col("y.lang")),
        )
        .groupBy(F.col("x.lang").alias("lang_a"), F.col("y.lang").alias("lang_b"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col("lang").alias("lang_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("lang").alias("lang_b"), F.col("sz").alias("sz_b"))
    return (
        est.join(inter, ["lang_a", "lang_b"])
        .join(F.broadcast(sa), "lang_a")
        .join(F.broadcast(sb), "lang_b")
        .select(
            "lang_a",
            "lang_b",
            "est_jaccard",
            F.round(
                F.col("i") / (F.col("sz_a") + F.col("sz_b") - F.col("i")).cast("double"),
                4,
            ).alias("exact_jaccard"),
        )
    )


def _keep_representatives_oracle(sf_dir: str) -> str | None:
    from .similarity_queries import _banded_buckets_cte, _banded_e_pred

    # Callable oracle, same corpus-cap resolution as
    # _near_dup_clusters_oracle. Note ``lab`` stays UNCAPPED on both
    # engines: the cap bounds the pair graph, while the keep/remove
    # audit is over the full corpus (unsampled vectors are kept).
    pred = _banded_e_pred(sf_dir)
    if pred is None:
        return None
    return f"""
WITH RECURSIVE {_banded_buckets_cte(pred)},
en AS MATERIALIZED (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM e),
lab AS (SELECT vec_id, label FROM embeddings),
cand AS MATERIALIZED (
    SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM (SELECT en.vec_id, bk.t, bk.bucket FROM en JOIN bbuckets bk USING (vec_id)) a
    JOIN (SELECT en.vec_id, bk.t, bk.bucket FROM en JOIN bbuckets bk USING (vec_id)) b
      ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id
),
pairs AS MATERIALIZED (
    SELECT c.vec_a, c.vec_b
    FROM cand c JOIN en x ON c.vec_a = x.vec_id JOIN en y ON c.vec_b = y.vec_id
    WHERE round(list_dot_product(x.emb, y.emb) / (x.nrm * y.nrm), 6) >= 0.4
),
edges AS MATERIALIZED (
    SELECT vec_a AS s, vec_b AS d FROM pairs
    UNION ALL
    SELECT vec_b AS s, vec_a AS d FROM pairs
),
{_min_label_cc_ctes()},
marked AS (
    SELECT lab.label,
           CASE WHEN comp.v IS NOT NULL AND comp.v <> comp.cluster_id THEN 1 ELSE 0 END AS removed
    FROM lab LEFT JOIN comp ON comp.v = lab.vec_id
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(sum(1 - removed) AS BIGINT) AS n_kept,
       CAST(sum(removed) AS BIGINT) AS n_removed
FROM marked GROUP BY label
UNION ALL
SELECT CAST(-1 AS BIGINT), n, CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
FROM cc_unconverged WHERE n > 0
"""


@register(
    "near_dup_keep_representatives",
    oracle=_keep_representatives_oracle,
    tags=("dedup", "clusters", "iterative", "lsh", "materialization"),
)
def near_dup_keep_representatives(spark, sf_dir):
    """The MATERIALIZATION step the cluster query feeds: keep exactly
    one representative (the min vec_id) per near-duplicate cluster,
    drop the rest, pass singletons through — i.e. the corpus a training
    run actually reads after transitive dedup, audited per label.

    Composition: banded-LSH candidate edges + exact cosine verify at
    the 0.4 radius (shared with ``near_dup_clusters``) -> connected
    components -> LEFT anti-style mark join back onto the corpus
    (vectors with no near-dup pair never enter the component table and
    are kept as-is). Scale: the mark join is keyed on vec_id and the
    component table is bounded by vertices-with-edges, not the corpus;
    everything else inherits the cluster query's collision-bounded
    shape. cluster_id = min member, so "representative" is
    deterministic on both engines."""
    from ..operators.graph import connected_components
    from .similarity_queries import _banded_pairs_base

    pairs = (
        _banded_pairs_base(spark, sf_dir)
        .filter(F.col("cos_sim") >= 0.4)
        .select("vec_a", "vec_b")
    )
    labels = connected_components(pairs, src="vec_a", dst="vec_b")
    e = table(spark, sf_dir, "embeddings").select("vec_id", "label")
    marked = e.join(
        labels.withColumnRenamed("v", "vec_id"), "vec_id", "left"
    ).select(
        "label",
        F.when(
            F.col("lbl").isNotNull() & (F.col("vec_id") != F.col("lbl")), 1
        )
        .otherwise(0)
        .alias("removed"),
    )
    return marked.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.sum(1 - F.col("removed")).cast("bigint").alias("n_kept"),
        F.sum("removed").cast("bigint").alias("n_removed"),
    )



def _source_overlap_sql() -> str:
    mins = ",\n           ".join(
        f"min(({a} * h32 + {b}) % {_P}) AS mh{i}" for i, (a, b) in enumerate(MINHASH_PARAMS)
    )
    eqsum = " + ".join(
        f"CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END" for i in range(len(MINHASH_PARAMS))
    )
    return f"""
WITH tok AS (SELECT source, {TOKS} AS t FROM documents),
h AS MATERIALIZED (
    SELECT DISTINCT source, ('0x' || substr(md5(s), 25, 8))::BIGINT AS h32
    FROM tok, unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS u(s)
),
sigs AS (
    SELECT source,
           {mins}
    FROM h GROUP BY source
),
sizes AS (SELECT source, count(*) AS sz FROM h GROUP BY source),
inter AS (
    SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_inter
    FROM h a JOIN h b ON a.h32 = b.h32 AND a.source < b.source
    GROUP BY 1, 2
),
est AS (
    SELECT a.source AS source_a, b.source AS source_b,
           round(({eqsum}) / {float(len(MINHASH_PARAMS))}, 4) AS est_jaccard
    FROM sigs a JOIN sigs b ON a.source < b.source
)
SELECT e.source_a, e.source_b, e.est_jaccard,
       round(coalesce(i.n_inter, 0)
             / CAST(sa.sz + sb.sz - coalesce(i.n_inter, 0) AS DOUBLE), 4) AS jaccard
FROM est e
LEFT JOIN inter i ON i.source_a = e.source_a AND i.source_b = e.source_b
JOIN sizes sa ON sa.source = e.source_a
JOIN sizes sb ON sb.source = e.source_b
"""


@register(
    "source_overlap_minhash",
    oracle=_source_overlap_sql(),
    tags=("dedup", "minhash", "overlap", "eval"),
)
def source_overlap_minhash(spark, sf_dir):
    """Cross-SOURCE corpus-overlap estimation — 'how much of source A is
    already in source B?', the question a data-mixing pipeline asks
    before unioning crawls. Each source's distinct 3-token-shingle
    hash set is sketched into the family's 16-permutation MinHash
    signature; the estimated Jaccard (fraction of agreeing slots) is
    reported next to the exact Jaccard so the sketch's error is
    measurable in-query.

    Scale posture: the signature aggregate collapses each source to ONE
    row in a single map-side-combined pass (min is algebraic), so the
    pairwise estimator joins a ~sources-row table against itself —
    broadcast, never corpus-sized. The exact side is the usual blocked
    shingle-hash equi-join (keyed on h32, fan-out bounded by hash
    collisions), present as the eval yardstick; a 100 TB run keeps only
    the sketch path and prices pairs from signatures alone."""
    d = table(spark, sf_dir, "documents")
    sh = (
        d.select("source", F.expr(SPARK_TOKS).alias("toks"))
        .select("source", F.explode(F.expr(_SHINGLE_SET_EXPR)).alias("shingle"))
        .select("source", h32_expr(F.col("shingle")).alias("h32"))
        .distinct()
        # r13: cached — the relation feeds 3 subtrees (see below), and
        # uncached each one re-paid the tokenize/shingle/md5 pass
        .cache()
    )
    # ONE aggregate carries both the 16 signature mins AND the set size,
    # and the sizes ride THROUGH the pairwise join — so the corpus-sized
    # shingle relation feeds exactly 3 subtrees (this aggregate + the
    # two sides of the exact-intersection join), not 5
    sigs = sh.groupBy("source").agg(
        F.count(F.lit(1)).alias("sz"),
        *[
            F.min((F.lit(a) * F.col("h32") + F.lit(b)) % F.lit(_P)).alias(f"mh{i}")
            for i, (a, b) in enumerate(MINHASH_PARAMS)
        ],
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    n_perm = len(MINHASH_PARAMS)
    eq = None
    for i in range(n_perm):
        term = F.when(F.col(f"a.mh{i}") == F.col(f"b.mh{i}"), 1).otherwise(0)
        eq = term if eq is None else eq + term
    est = a.join(F.broadcast(b), F.col("a.source") < F.col("b.source")).select(
        F.col("a.source").alias("source_a"),
        F.col("b.source").alias("source_b"),
        F.round(eq / F.lit(float(n_perm)), 4).alias("est_jaccard"),
        F.col("a.sz").alias("sz_a"),
        F.col("b.sz").alias("sz_b"),
    )
    sa, sb = sh.alias("sa"), sh.alias("sb")
    inter = (
        sa.join(sb, (F.col("sa.h32") == F.col("sb.h32")) & (F.col("sa.source") < F.col("sb.source")))
        .groupBy(F.col("sa.source").alias("source_a"), F.col("sb.source").alias("source_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        est.join(inter, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            "est_jaccard",
            F.round(
                F.coalesce(F.col("n_inter"), F.lit(0))
                / (F.col("sz_a") + F.col("sz_b") - F.coalesce(F.col("n_inter"), F.lit(0))).cast("double"),
                4,
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# streaming store maintenance (r9 verdict #2)
# ---------------------------------------------------------------------------

@register(
    "streaming_dedup_index",
    oracle=SHINGLES_SQL
    + f""",
dfq AS MATERIALIZED (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle)
SELECT CAST((SELECT count(*) FROM corpus) AS BIGINT)            AS n_docs,
       CAST((SELECT count(*) FROM sh) AS BIGINT)                AS n_shingle_rows,
       CAST((SELECT count(*) FROM dfq) AS BIGINT)               AS n_distinct_shingles,
       CAST((SELECT count(*) FROM dfq WHERE df > {STOP_SHINGLE_DF}) AS BIGINT)
           AS n_stop_shingles,
       CAST((SELECT count(DISTINCT s2.doc_id) FROM sh s2
             JOIN dfq USING (shingle) WHERE dfq.df <= {STOP_SHINGLE_DF}) AS BIGINT)
           AS n_kept_docs,
       CAST(4 * (SELECT count(DISTINCT doc_id) FROM sh) AS BIGINT) AS n_band_rows
""",
    tags=("dedup", "streaming", "build", "incremental"),
)
def streaming_dedup_index(spark, sf_dir):
    """Streaming maintenance of the shingle/LSH store, priced end to
    end (the bench row r9 verdict #2 asks for): the corpus is landed as
    parquet files, an availableNow file stream drains it ONE FILE PER
    MICRO-BATCH, and each batch folds into the persisted store via
    ``append_to_shingle_artifact`` inside ``foreachBatch``
    (streaming/dedup_index.py) — per-doc tables append, ``df``
    sum-merges, ``kept`` takes a merge-on-read override generation. The
    returned audit row is computed FROM THE FINAL STORE (meta counts
    advanced incrementally across batches + stop/kept/bands table
    counts), so the oracle — which recomputes the same numbers from the
    raw corpus in one shot — verifies that batch-by-batch maintenance
    converges to the batch build. Table-level equality (every store
    table bit-equal to ``build_shingle_artifact``'s) is pinned by
    tests/test_streaming_dedup_index.py.

    Scale posture: this is the production shape of read-time dedup
    (reference streamlit_app.py:147) — the index advances with the
    crawl; per-batch cost since r12 is PURE delta (tokenize/signature
    CPU + O(delta) side-table appends; ``merge_every`` defers the
    df/stop/kept derivation off the per-trigger path, r11 verdict #4),
    with the accumulated merge paid at the maintenance cadence and
    once more by the final ``finalize_dedup_index`` — all inside this
    priced entry, so the bench row still prices the COMPLETE
    end-to-end maintenance; maxFilesPerTrigger is the knob bounding
    batch size."""
    import os
    import shutil

    from ..streaming.dedup_index import (
        current_store_path,
        finalize_dedup_index,
        start_dedup_index_stream,
    )

    root = _artifact_path(sf_dir) + "_stream"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    inp = os.path.join(root, "input")
    docs = _corpus(spark, sf_dir).select(
        "doc_id", F.concat_ws(" ", "toks").alias("text")
    )
    docs.repartition(2).write.parquet(inp)
    store_root = os.path.join(root, "store")
    q = start_dedup_index_stream(
        spark,
        inp,
        store_root,
        os.path.join(root, "ckpt"),
        available_now=True,
        max_files_per_trigger=1,
        merge_every=8,
    )
    q.awaitTermination()
    finalize_dedup_index(spark, store_root)
    cur = current_store_path(os.path.join(root, "store"))
    # audit reads: four independent jobs over the final store — one
    # concurrent wave instead of four sequential jobs (guide §2.6)
    from concurrent.futures import ThreadPoolExecutor

    audits: dict = {}

    def _audit(key, fn):
        return lambda: audits.__setitem__(key, fn())

    with ThreadPoolExecutor(max_workers=4) as pool:
        list(
            pool.map(
                lambda f: f(),
                [
                    _audit(
                        "meta",
                        lambda: spark.read.parquet(
                            os.path.join(cur, "meta")
                        ).head(),
                    ),
                    _audit(
                        "n_stop",
                        lambda: spark.read.parquet(
                            os.path.join(cur, "stop")
                        ).count(),
                    ),
                    _audit("n_kept", lambda: resolve_kept(spark, cur).count()),
                    _audit(
                        "n_bands",
                        lambda: spark.read.parquet(
                            os.path.join(cur, "bands")
                        ).count(),
                    ),
                ],
            )
        )
    meta, n_stop = audits["meta"], audits["n_stop"]
    n_kept, n_bands = audits["n_kept"], audits["n_bands"]
    return spark.range(1).select(
        F.lit(meta["n_docs"]).cast("bigint").alias("n_docs"),
        F.lit(meta["n_shingle_rows"]).cast("bigint").alias("n_shingle_rows"),
        F.lit(meta["n_distinct_shingles"])
        .cast("bigint")
        .alias("n_distinct_shingles"),
        F.lit(n_stop).cast("bigint").alias("n_stop_shingles"),
        F.lit(n_kept).cast("bigint").alias("n_kept_docs"),
        F.lit(n_bands).cast("bigint").alias("n_band_rows"),
    )
