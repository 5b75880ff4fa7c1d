"""Deterministic scale-up of the driver's testdata: replicate an
existing sf directory K-fold with replica-shifted keys, producing a
larger scale factor for SCALING-SLOPE measurement (sf0.1 x 10 = sf1).

The driver's generator is not available to the repo, and /root/testdata
is read-only, so sf1 is derived from sf0.1 by K-fold replication that
preserves PER-REPLICA geometry exactly while keeping replicas disjoint —
the property a slope measurement needs (work should scale with data
volume, not explode super-linearly through artificial cross-replica
duplicates):

- **Keys**: every table's primary key is shifted by ``r * (max+1)``
  per replica, and every foreign key is shifted by the SAME stride, so
  referential integrity and join fan-outs are preserved replica-wise.
  ``region``/``nation`` are fixed dimensions, copied once; nationkey
  references are left unshifted.
- **documents**: replica r > 0 suffixes EVERY token with a letters-only
  replica tag (the family tokenizer strips non-alpha, so the tag must
  be alphabetic). Within a replica, shingle sets and document
  frequencies are bit-identical to the source; across replicas the
  shingle vocabularies are disjoint (Jaccard 0), so near-dup pair
  counts scale exactly K-fold. A plain copy would instead create
  K-way exact-duplicate clusters: pair counts would grow K(K-1)/2-fold
  and the "slope" would measure corpus geometry, not the engine.
- **embeddings**: replica r applies an ORTHOGONAL transform — cyclic
  dimension shift by 7r plus a deterministic sign flip per (replica,
  dim) — which preserves every within-replica inner product exactly
  (same top-k, same near-dup pairs per replica) while decorrelating
  replicas (expected cross-replica cosine ~0 for these dense vectors).
- **events**: ids/users shifted; timestamps kept (window populations
  scale K-fold). ``ts`` is written as TIMESTAMP_NTZ micros, one of the
  two encodings the engine's schema-adaptive loader accepts and the
  one DuckDB reads natively.

Usage:
    python scripts/gen_scale_testdata.py SRC_DIR OUT_DIR K
e.g.
    python scripts/gen_scale_testdata.py /root/testdata/sf0.1 testdata_sf1 10
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, functions as F


def _strides(spark, src: str, tables: set | None = None) -> dict[str, int]:
    """max+1 per primary key — the per-replica shift stride. ``tables``
    limits the footer scans to the tables a partial generation needs."""
    out = {}
    for tbl, key in [
        ("customer", "c_custkey"),
        ("supplier", "s_suppkey"),
        ("part", "p_partkey"),
        ("orders", "o_orderkey"),
        ("events", "event_id"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ]:
        if tables is not None and tbl not in tables:
            continue
        df = spark.read.parquet(f"{src}/{tbl}.parquet")
        out[tbl] = int(df.agg(F.max(key)).head()[0]) + 1
    if tables is None or "events" in tables:
        out["user"] = (
            int(
                spark.read.parquet(f"{src}/events.parquet")
                .agg(F.max("user_id"))
                .head()[0]
            )
            + 1
        )
    return out


def _replicas(df: DataFrame, k: int, build) -> DataFrame:
    """Union of build(r) for r in 0..k-1 — one scan per replica, all
    writes land in one job per table. None (a table skipped by the
    ``tables`` filter) flows through."""
    if df is None:
        return None
    parts = [build(df, r) for r in range(k)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def generate(
    spark, src: str, dst: str, k: int, tables: set | None = None
) -> None:
    """Replicate ``src`` K-fold into ``dst``. ``tables=None`` writes
    the full fixture set; a set (e.g. {"documents", "embeddings"})
    writes only those tables — the sf100-subset probe (r11 verdict #6)
    needs just the two dial-bound relations, and 8 unused 100x tables
    would waste an hour and 20 GB."""
    want = lambda t: tables is None or t in tables  # noqa: E731
    os.makedirs(dst, exist_ok=True)
    # orders shares the customer stride; lineitem shares orders/part/
    # supplier strides
    deps = {
        "orders": {"customer"},
        "lineitem": {"orders", "part", "supplier"},
    }
    need = None
    if tables is not None:
        need = set(tables)
        for t in tables:
            need |= deps.get(t, set())
    st = _strides(spark, src, need)
    # documents: the dedup corpus synthesizes a near-dup twin at
    # doc_id + 1_000_000 (dedup_queries.CORPUS_SQL), so generated
    # original ids must never cross into a twin's id. When k * stride
    # would exceed 1e6 (first hit: sf100 = 5M docs), stride in whole
    # EVEN-million blocks instead: originals occupy even-million bands,
    # their +1e6 twins the odd bands — collision-free at any k, and
    # recursively (a later x10 of such a corpus strides in even
    # multiples again). Base-id arithmetic (doc_id % 1e6) and twin
    # pairing are preserved. No previously generated corpus changes:
    # sf1 (50k ids) and sf10 (500k ids) stay below the threshold.
    import math

    if "documents" in st and k * st["documents"] > 1_000_000:
        st["documents"] = math.ceil(st["documents"] / 2_000_000) * 2_000_000

    def w(df: DataFrame, name: str, parts: int = 32) -> None:
        if df is None:  # table skipped by the ``tables`` filter
            return
        df.repartition(parts).write.mode("overwrite").parquet(
            f"{dst}/{name}.parquet"
        )

    # fixed dimensions: straight copies
    for name in ("region", "nation"):
        if not want(name):
            continue
        spark.read.parquet(f"{src}/{name}.parquet").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{dst}/{name}.parquet")

    if not want("customer"):
        cust = None
    else:
        cust = spark.read.parquet(f"{src}/customer.parquet")
    w(
        _replicas(
            cust,
            k,
            lambda d, r: d.select(
                (F.col("c_custkey") + r * st["customer"]).alias("c_custkey"),
                F.format_string(
                    "Customer#%09d", F.col("c_custkey") + r * st["customer"]
                ).alias("c_name"),
                "c_nationkey",
                "c_acctbal",
                "c_mktsegment",
            ),
        ),
        "customer",
    )

    if not want("supplier"):
        supp = None
    else:
        supp = spark.read.parquet(f"{src}/supplier.parquet")
    w(
        _replicas(
            supp,
            k,
            lambda d, r: d.select(
                (F.col("s_suppkey") + r * st["supplier"]).alias("s_suppkey"),
                F.format_string(
                    "Supplier#%09d", F.col("s_suppkey") + r * st["supplier"]
                ).alias("s_name"),
                "s_nationkey",
                "s_acctbal",
            ),
        ),
        "supplier",
    )

    if not want("part"):
        part = None
    else:
        part = spark.read.parquet(f"{src}/part.parquet")
    w(
        _replicas(
            part,
            k,
            lambda d, r: d.select(
                (F.col("p_partkey") + r * st["part"]).alias("p_partkey"),
                "p_name",
                "p_brand",
                "p_type",
                "p_size",
                "p_retailprice",
            ),
        ),
        "part",
    )

    if not want("orders"):
        orders = None
    else:
        orders = spark.read.parquet(f"{src}/orders.parquet")
    w(
        _replicas(
            orders,
            k,
            lambda d, r: d.select(
                (F.col("o_orderkey") + r * st["orders"]).alias("o_orderkey"),
                (F.col("o_custkey") + r * st["customer"]).alias("o_custkey"),
                "o_orderstatus",
                "o_totalprice",
                "o_orderdate",
                "o_orderpriority",
            ),
        ),
        "orders",
    )

    if not want("lineitem"):
        li = None
    else:
        li = spark.read.parquet(f"{src}/lineitem.parquet")
    w(
        _replicas(
            li,
            k,
            lambda d, r: d.select(
                (F.col("l_orderkey") + r * st["orders"]).alias("l_orderkey"),
                (F.col("l_partkey") + r * st["part"]).alias("l_partkey"),
                (F.col("l_suppkey") + r * st["supplier"]).alias("l_suppkey"),
                "l_linenumber",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
                "l_tax",
                "l_returnflag",
                "l_linestatus",
                "l_shipdate",
            ),
        ),
        "lineitem",
        parts=64,
    )

    ev = (
        spark.read.parquet(f"{src}/events.parquet") if want("events") else None
    )
    ts_type = dict(ev.dtypes).get("ts", "") if ev is not None else ""
    ts_col = (
        F.timestamp_micros((F.col("ts") / 1000).cast("long")).cast("timestamp_ntz")
        if ts_type == "bigint"  # TIMESTAMP(NANOS) read under nanosAsLong
        else F.col("ts").cast("timestamp_ntz")
    )
    w(
        _replicas(
            ev,
            k,
            lambda d, r: d.select(
                (F.col("event_id") + r * st["events"]).alias("event_id"),
                ts_col.alias("ts"),
                (F.col("user_id") + r * st["user"]).alias("user_id"),
                "event_type",
                "value",
                "props",
            ),
        ),
        "events",
    )

    docs = (
        spark.read.parquet(f"{src}/documents.parquet")
        if want("documents")
        else None
    )
    tag = lambda r: chr(ord("a") + r % 26) + chr(ord("a") + (r // 26) % 26)

    def doc_replica(d, r):
        if r == 0:
            return d.select("doc_id", "text", "lang", "source", "n_chars")
        # suffix only non-empty tokens (ADVICE r6): consecutive/leading/
        # trailing spaces split into "" elements which would otherwise
        # become bare "qXY" tokens in replicas r>0 but not replica 0,
        # breaking the within-replica shingle-geometry invariant
        text = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda t: F.when(t == "", t).otherwise(
                    F.concat(t, F.lit("q" + tag(r)))
                ),
            ),
            " ",
        )
        return d.select(
            (F.col("doc_id") + r * st["documents"]).alias("doc_id"),
            text.alias("text"),
            "lang",
            "source",
            F.length(text).cast(dict(d.dtypes)["n_chars"]).alias("n_chars"),
        )

    w(_replicas(docs, k, doc_replica), "documents")

    emb = (
        spark.read.parquet(f"{src}/embeddings.parquet")
        if want("embeddings")
        else None
    )
    dim = len(emb.head()["embedding"]) if emb is not None else 0
    el_type = (
        emb.schema["embedding"].dataType.elementType.simpleString()
        if emb is not None
        else "double"
    )

    def emb_replica(d, r):
        if r == 0:
            return d.select("vec_id", "embedding", "label")
        shift = (7 * r) % dim
        rot = F.expr(
            f"transform(sequence(0, {dim - 1}), j -> "
            f"CAST(element_at(embedding, pmod(j + {shift}, {dim}) + 1) * "
            f"(CASE WHEN pmod(hash({r}, j), 2) = 0 THEN 1.0 ELSE -1.0 END) "
            f"AS {el_type}))"
        )
        return d.select(
            (F.col("vec_id") + r * st["embeddings"]).alias("vec_id"),
            rot.alias("embedding"),
            "label",
        )

    w(_replicas(emb, k, emb_replica), "embeddings")


def generate_hard_embeddings(
    spark, src: str, dst: str, n: int = 2000, dim: int = 64, planted: int = 400
) -> None:
    """ADVERSARIAL ANN fixture (r7 verdict #4): the driver corpus is
    label-clustered, so IVF coarse quantization never loses a true
    neighbor and ``ivf_recall_eval`` saturates at 1.00 from nprobe=1 —
    a dial that cannot fail. This fixture replaces the embeddings table
    with md5-seeded ISOTROPIC vectors (uniform [-1, 1] per dimension —
    no cluster structure for cells to align with) plus ``planted``
    near-neighbor pairs: vector n-planted+i = partner i's vector plus
    0.35x an independent isotropic perturbation (cos ≈ 0.94), so exact
    top-5 sets have real structure that Voronoi cells of arbitrary
    centroids genuinely split. Every other table is HARD-LINKED from
    ``src`` so the full oracle harness runs against the dir unchanged.

    Deterministic by construction (pure md5 of (vec_id, dim) — no RNG,
    no time), so the committed fixture and a regenerated one are
    byte-comparable."""
    import shutil

    os.makedirs(dst, exist_ok=True)
    for name in (
        "region nation customer supplier part orders lineitem events documents"
    ).split():
        s, d = f"{src}/{name}.parquet", f"{dst}/{name}.parquet"
        if os.path.exists(d):
            continue
        try:
            if os.path.isdir(s):
                shutil.copytree(s, d, copy_function=os.link)
            else:
                os.link(s, d)
        except OSError:
            shutil.copy2(s, d) if os.path.isfile(s) else shutil.copytree(s, d)

    def u(seed_expr: str) -> str:
        # uniform [-1, 1] from a 32-bit md5 slice — the family's one
        # hash idiom (h32), rescaled
        return (
            f"(conv(substring(md5({seed_expr}), 25, 8), 16, 10)"
            f" / 2147483648.0 - 1.0)"
        )

    base = n - planted
    iso = u("concat(cast(id AS string), '_', cast(j AS string))")
    part = u(
        f"concat(cast(id - {base} AS string), '_', cast(j AS string))"
    )
    pert = u("concat('p', cast(id AS string), '_', cast(j AS string))")
    emb = spark.range(n).selectExpr(
        "id AS vec_id",
        f"""transform(sequence(0, {dim - 1}), j ->
              CAST(CASE WHEN id < {base} THEN {iso}
                        ELSE {part} + 0.35 * {pert} END AS FLOAT)
           ) AS embedding""",
        "CAST(id % 40 AS INT) AS label",
    )
    emb.repartition(8).write.mode("overwrite").parquet(
        f"{dst}/embeddings.parquet"
    )


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark import (
        session,
    )

    if sys.argv[1] == "--hard-embeddings":
        src, dst = sys.argv[2], sys.argv[3]
        spark = session.get_spark()
        generate_hard_embeddings(spark, src, dst)
        n = spark.read.parquet(f"{dst}/embeddings.parquet").count()
        print(f"GEN hard embeddings {n}")
        sys.exit(0)
    args = [a for a in sys.argv[1:] if not a.startswith("--tables")]
    tables = None
    for a in sys.argv[1:]:
        if a.startswith("--tables="):
            tables = set(a.split("=", 1)[1].split(","))
    src, dst, k = args[0], args[1], int(args[2])
    spark = session.get_spark()
    generate(spark, src, dst, k, tables=tables)
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        if tables is not None and name not in tables:
            continue
        n = spark.read.parquet(f"{dst}/{name}.parquet").count()
        print(f"GEN {name} {n}")
