"""Parquet star-schema loaders for the driver's TESTDATA tables.

Plain ``spark.read.parquet`` — schema lives in the files; Catalyst gets
column pruning + predicate pushdown into the vectorized parquet reader
for free. Never ``inferSchema`` on text formats in non-test code
(reference anti-pattern: work.py:224 infers on JSON).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def ensure_session_confs(spark: SparkSession) -> None:
    """Pin the correctness-critical runtime confs on ANY session.

    The driver's verifier may hand us a SparkSession it built itself
    (without sessions.get_spark), so the confs that change *results* are
    re-asserted here, not only in the builder:
    - nanosAsLong: events.parquet is TIMESTAMP(NANOS); without this the
      scan throws PARQUET_TYPE_ILLEGAL;
    - UTC session timezone: timestamp formatting must match DuckDB's
      naive rendering regardless of host timezone.
    Both are runtime-settable SQL confs; setting them is idempotent.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # never let a conf hiccup mask the actual query


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    ensure_session_confs(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# (stat-key, fingerprint) memo per path-tuple: every store-backed query
# re-derives its artifact key, and at generated-sf1 size that meant a
# full ~100 MB byte-hash per query. The stat key (per-file name, size,
# mtime_ns) re-walks the files — cheap — and any file change invalidates
# it; only byte rewrites that preserve BOTH size and mtime_ns would
# stale-hit, which no real writer does.
_FP_MEMO: dict = {}


def data_fingerprint(*paths: str) -> str:
    """Path-independent content fingerprint of parquet files/dirs: md5
    over each file's basename, size, and raw bytes (12 hex chars).

    Used to key DERIVED artifacts — fitted models, materialized shingle
    tables — so (a) the same corpus resolves the same artifact from any
    checkout path (the old md5-of-abspath key only resolved on the
    machine that wrote it), and (b) a regenerated fixture corpus can
    never silently resolve a stale artifact: new bytes => new key =>
    rebuild. Fixture tables are sub-MB, so hashing bytes is microseconds
    — at real scale you'd fingerprint the table snapshot id instead.
    Repeated calls on unchanged files hit a stat-keyed memo."""
    import hashlib
    import os

    all_files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            all_files.extend(
                sorted(
                    os.path.join(root, n)
                    for root, _, names in os.walk(p)
                    for n in names
                )
            )
        else:
            all_files.append(p)
    stat_key = tuple(
        (os.path.basename(f), st.st_size, st.st_mtime_ns)
        for f in all_files
        for st in (os.stat(f),)
    )
    memo_key = (paths, stat_key)
    hit = _FP_MEMO.get(memo_key)
    if hit is not None:
        return hit
    h = hashlib.md5()
    for f in all_files:
        h.update(os.path.basename(f).encode())
        h.update(str(os.path.getsize(f)).encode())
        with open(f, "rb") as fh:
            for chunk in iter(lambda: fh.read(1 << 20), b""):
                h.update(chunk)
    fp = h.hexdigest()[:12]
    if len(_FP_MEMO) >= 16:  # a few corpora per process (multi-sf sweeps)
        _FP_MEMO.clear()
    _FP_MEMO[memo_key] = fp
    return fp


def widen_scan(df: DataFrame) -> DataFrame:
    """Round-robin repartition a NARROW scan up to the session's default
    parallelism — for CPU-heavy per-row map work (regex tokenize,
    shingle assembly, hash signatures) over a small input.

    A sub-128MB parquet file arrives as ONE input split, so every
    downstream narrow expression runs on a single core: at sf0.1 the
    dedup family's tokenize+shingle build was a 9-11s single-task stage
    on local[32]; 32-wide it is sub-second. The repartition fires ONLY
    when the scan is narrower than the session width — at real scale a
    big input already yields >= parallelism splits and this is the
    identity, so it never inserts an exchange where the data is large
    enough for the scan to parallelize itself.
    """
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLE_NAMES}


def events_partitioned_path(sf_dir: str) -> str:
    """Derived-artifact path of the date-partitioned events twin,
    keyed like every derived artifact (corpus label + content
    fingerprint, so a regenerated corpus rebuilds)."""
    import os

    label = os.path.basename(os.path.abspath(sf_dir).rstrip(os.sep))
    fp = data_fingerprint(os.path.join(sf_dir, "events.parquet"))
    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    base = os.environ.get(
        "SPARK_GRAFT_DERIVED_DIR",
        os.path.join(root, "spark-warehouse", "events_by_day"),
    )
    return os.path.join(base, f"{label}_{fp}")


def events_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table REWRITTEN into a Hive-style date-partitioned
    layout (``event_date=YYYY-MM-DD/`` directories) — the 100 TB
    operating shape the flat fixture parquet can't show: a time-sliced
    query against this layout is planned with PartitionFilters and
    reads ONLY the matching date directories (partition pruning),
    instead of scanning the whole table and filtering rows.

    Built once per corpus (fingerprint-keyed, atomic tmp+rename, the
    derived-artifact discipline of the shingle store); ``ts`` is the
    normalized micros timestamp of ``events_with_ts``, so downstream
    date/window arithmetic is bit-identical to the flat path."""
    import os
    import shutil

    from pyspark.sql import functions as F

    path = events_partitioned_path(sf_dir)
    if not os.path.exists(os.path.join(path, "_DONE")):
        tmp = f"{path}.tmp{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        e = events_with_ts(spark, sf_dir)
        try:
            (
                e.withColumn("event_date", F.to_date("ts"))
                # one shuffle keyed on the partition column: each date
                # directory gets its writers' files, no tiny-file spray
                .repartition("event_date")
                .write.mode("overwrite")
                .partitionBy("event_date")
                .parquet(tmp)
            )
        except BaseException:
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        open(os.path.join(tmp, "_DONE"), "w").close()
        try:
            os.rename(tmp, path)
        except OSError:  # concurrent builder won the rename
            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.exists(os.path.join(path, "_DONE")):
                raise
    ensure_session_confs(spark)
    return spark.read.parquet(path)


def events_with_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events`` with ``ts`` as a real TimestampType (microsecond).

    Schema-adaptive: the driver has shipped ``events.parquet`` with two
    physical encodings across rounds, and this loader normalizes both to
    the same logical column so every downstream query is agnostic:

    - TIMESTAMP(NANOS): with ``spark.sql.legacy.parquet.nanosAsLong``
      the column arrives as epoch-nanos BIGINT, which we floor-divide
      to micros — bit-identical to DuckDB's ``ts::TIMESTAMP``
      truncation;
    - TIMESTAMP(MICROS) without UTC adjustment: Spark reads
      TIMESTAMP_NTZ; cast to session-time TimestampType (the session is
      pinned to UTC in ensure_session_confs) renders identically to
      DuckDB's naive TIMESTAMP.
    """
    from pyspark.sql import functions as F

    e = table(spark, sf_dir, "events")
    # DataFrame.dtypes renders LongType as "bigint" (never "long")
    ts_type = dict(e.dtypes).get("ts", "")
    if ts_type == "bigint":
        return e.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if ts_type == "timestamp_ntz":
        # the NTZ->timestamp cast is only DuckDB-identical when the
        # session renders in UTC; ensure_session_confs swallows conf
        # failures, so verify here rather than silently shifting
        tz = spark.conf.get("spark.sql.session.timeZone", "")
        if tz not in ("UTC", "Etc/UTC", "GMT", "Z", "+00:00"):
            raise RuntimeError(
                f"events.ts is TIMESTAMP_NTZ but session timeZone is {tz!r}; "
                "casting would shift values — set spark.sql.session.timeZone=UTC"
            )
        return e.withColumn("ts", F.col("ts").cast("timestamp"))
    if ts_type != "timestamp":
        raise TypeError(
            f"events.ts has unexpected dtype {ts_type!r}; expected bigint "
            "(nanos-as-long), timestamp_ntz, or timestamp — refusing a blind "
            "cast that could silently produce NULLs"
        )
    return e
