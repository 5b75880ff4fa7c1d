"""Core relational operator coverage (SURVEY §2 A/B/D/E/F/G/H + the join
surface §2.C calls for), expressed over the driver's TPC-H-ish tables.

The reference itself has no joins (SURVEY §2.C) and only
count/mean/max aggregates; this module supplies the full relational
surface an engine user needs, each as a Catalyst-native plan with a
DuckDB oracle.

Scale notes (100 TB posture) are on each query: which side broadcasts,
where the shuffles are, why the plan survives 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.skew import salted_agg
from ..sources.tables import events_with_ts, table
from .registry import register

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


# ---------------------------------------------------------------------------
# Exact-money arithmetic (the house pattern, PERF.md rounds 5-6).
#
# Every money column in the testdata is a canonical 2-decimal double, so
# CAST(round(x * 100) AS BIGINT) recovers exact integer cents on both
# engines. Sums/averages of money are therefore computed over integer
# cents (products of 2dp factors over integer ten-thousandths), with ONE
# final float division — never round(sum(double), 2), whose last-cent
# value depends on float accumulation order and diverges between Spark
# and DuckDB once groups reach millions of rows (caught by the sf1
# sweep: brand_revenue/nation_revenue/returnflag_rollup failed at sf1
# while green at sf0.1). Headroom: cents*pct ten-thousandths sum in
# BIGINT supports ~9e14 max-priced lineitems per GROUP; wider deploys
# move the accumulator to DECIMAL(38, n).
# ---------------------------------------------------------------------------

def _cents(col: str):
    """Exact integer cents of a canonical-2dp money column."""
    return F.round(F.col(col) * 100).cast("bigint")


def _cents_sql(col: str) -> str:
    return f"CAST(round({col} * 100) AS BIGINT)"


def _rev_i():
    """l_extendedprice * (1 - l_discount) in exact integer
    ten-thousandths: cents x integer (100 - discount-pct)."""
    return _cents("l_extendedprice") * F.round(
        (1 - F.col("l_discount")) * 100
    ).cast("bigint")


_REV_I_SQL = (
    f"{_cents_sql('l_extendedprice')} * "
    "CAST(round((1 - l_discount) * 100) AS BIGINT)"
)


def sum_money(col: str, alias: str):
    """Exact sum of a 2dp money column, one final /100 division."""
    return (F.sum(_cents(col)) / F.lit(100.0)).alias(alias)


def sum_money_sql(col: str, alias: str) -> str:
    return f"CAST(sum({_cents_sql(col)}) AS BIGINT) / 100.0 AS {alias}"


def sum_revenue(alias: str = "revenue"):
    """Exact sum of price*(1-disc), one final /10000 division."""
    return (F.sum(_rev_i()) / F.lit(10000.0)).alias(alias)


def sum_revenue_sql(alias: str = "revenue") -> str:
    return f"CAST(sum({_REV_I_SQL}) AS BIGINT) / 10000.0 AS {alias}"


def avg_money(col: str, alias: str):
    """Exact-cents average: sum(cents)/100.0/count — identical division
    sequence on both engines, no engine-side rounding."""
    return (F.sum(_cents(col)) / F.lit(100.0) / F.count(F.lit(1))).alias(alias)


def avg_money_sql(col: str, alias: str) -> str:
    return f"CAST(sum({_cents_sql(col)}) AS BIGINT) / 100.0 / count(*) AS {alias}"


# Pre-projected-integer variants (round-7 perf reclaim): on the hot
# aggregates the round()+cast work is hoisted into ONE Project per scan
# (before any Expand/rollup/cube duplication and before joins widen the
# row), so each source row pays the double->int conversion exactly once;
# the aggregate then sums plain BIGINTs. Values are bit-identical to the
# inline forms — same integers, same single final division.

def sum_cents_col(col: str, alias: str):
    """Sum a pre-projected integer-cents column; one final /100."""
    return (F.sum(col) / F.lit(100.0)).alias(alias)


def sum_rev_col(col: str, alias: str = "revenue"):
    """Sum a pre-projected integer ten-thousandths revenue column."""
    return (F.sum(col) / F.lit(10000.0)).alias(alias)


# --------------------------------------------------------------------------
# G: aggregations
# --------------------------------------------------------------------------

@register(
    "pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       sum(l_quantity)                                                    AS sum_qty,
       {sum_money_sql('l_extendedprice', 'sum_base_price')},
       {sum_revenue_sql('sum_disc_price')},
       CAST(sum({_REV_I_SQL} * CAST(round((1 + l_tax) * 100) AS BIGINT)) AS BIGINT)
           / 1000000.0                                                    AS sum_charge,
       sum(l_quantity) / count(*)                                         AS avg_qty,
       {avg_money_sql('l_extendedprice', 'avg_price')},
       CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) / 100.0
           / count(*)                                                     AS avg_disc,
       count(*)                                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    tags=("agg", "filter"),
)
def pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped scan->filter->hash-agg. Scale: pure map-side
    partial agg + tiny final agg on (flag,status); the filter reaches the
    parquet scan as a pushed predicate; only 6 grouping keys so the final
    shuffle is a few KB regardless of input size. Money aggregates are
    exact integer cents/1e4ths/1e6ths with one final division (module
    header) — quantity sums stay plain doubles because l_quantity is
    integer-valued and float addition of integers is exact (and thus
    order-independent) below 2^53. Round-7: the double->int conversions
    are hoisted into one Project per scan row (ep_c/disc_rem/tax_f/
    disc_c computed once, reused by four aggregates) instead of being
    re-evaluated inside each aggregate expression."""
    l = table(spark, sf_dir, "lineitem")
    rows = (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .select(
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            _cents("l_extendedprice").alias("ep_c"),
            F.round((1 - F.col("l_discount")) * 100).cast("bigint").alias("disc_rem"),
            F.round((1 + F.col("l_tax")) * 100).cast("bigint").alias("tax_f"),
            F.round(F.col("l_discount") * 100).cast("bigint").alias("disc_c"),
        )
    )
    return (
        rows.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            sum_cents_col("ep_c", "sum_base_price"),
            (F.sum(F.col("ep_c") * F.col("disc_rem")) / F.lit(10000.0)).alias(
                "sum_disc_price"
            ),
            (
                F.sum(F.col("ep_c") * F.col("disc_rem") * F.col("tax_f"))
                / F.lit(1000000.0)
            ).alias("sum_charge"),
            (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum("ep_c") / F.lit(100.0) / F.count(F.lit(1))).alias("avg_price"),
            (F.sum("disc_c") / F.lit(100.0) / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "acctbal_stats_by_segment",
    oracle="""
SELECT c_mktsegment,
       count(*)                       AS n_customers,
       round(min(c_acctbal), 2)       AS min_bal,
       round(max(c_acctbal), 2)       AS max_bal,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) / 100.0
           / count(*)                 AS avg_bal,
       count(DISTINCT c_nationkey)    AS n_nations
FROM customer
GROUP BY c_mktsegment
""",
    tags=("agg",),
)
def acctbal_stats_by_segment(spark, sf_dir):
    """min/max/avg/count + count-distinct in one hash aggregate (G2-G5
    generalized). count(DISTINCT) expands to a two-phase agg Spark plans
    automatically; 5 segments x 25 nations keeps state tiny at any SF."""
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        avg_money("c_acctbal", "avg_bal"),
        F.countDistinct("c_nationkey").alias("n_nations"),
    )


@register(
    "monthly_order_stats",
    oracle="""
SELECT strftime(o_orderdate, '%Y-%m')      AS order_month,
       count(*)                            AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0
                                           AS sum_total,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0
           / count(*)                      AS avg_total
FROM orders
GROUP BY order_month
""",
    tags=("agg", "date"),
)
def monthly_order_stats(spark, sf_dir):
    """Date-bucketed aggregate (dashboard G2/G4 on event time). The month
    string is computed pre-shuffle; ~80 groups independent of SF."""
    o = table(spark, sf_dir, "orders")
    return (
        o.withColumn("order_month", F.date_format("o_orderdate", "yyyy-MM"))
        .groupBy("order_month")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            sum_money("o_totalprice", "sum_total"),
            avg_money("o_totalprice", "avg_total"),
        )
    )


@register(
    "value_histogram",
    oracle="""
SELECT CAST(floor("value" / 50) AS BIGINT)  AS bucket,
       round(CAST(floor("value" / 50) AS BIGINT) * CAST(50.0 AS DOUBLE), 1) AS bucket_lo,
       count(*)                             AS cnt
FROM events
GROUP BY 1, 2
""",
    tags=("agg", "histogram"),
)
def value_histogram(spark, sf_dir):
    """Fixed-width histogram (G6, dashboard's px.histogram nbins) as
    floor-bucket + count — a one-shuffle hash agg with ~10 groups, vs the
    reference shipping every row to the browser to bin client-side."""
    e = events_with_ts(spark, sf_dir)
    bucket = F.floor(F.col("value") / 50).cast("bigint")
    return (
        e.select(bucket.alias("bucket"))
        .withColumn("bucket_lo", F.round(F.col("bucket") * 50.0, 1))
        .groupBy("bucket", "bucket_lo")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "event_type_pct",
    oracle="""
SELECT event_type,
       count(*) AS cnt,
       round(100.0 * count(*) / CAST(sum(count(*)) OVER () AS DOUBLE), 4) AS pct
FROM events
GROUP BY event_type
""",
    tags=("agg", "window"),
)
def event_type_pct(spark, sf_dir):
    """Percentage-of-total (F10: work.py:298-301). Aggregate first (5
    rows), then an unpartitioned window over the tiny aggregate — the
    single-partition window touches 5 rows, never the raw data."""
    e = events_with_ts(spark, sf_dir)
    agg = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    total = F.sum("cnt").over(Window.partitionBy())
    return agg.withColumn("pct", F.round(100.0 * F.col("cnt") / total.cast("double"), 4))


# --------------------------------------------------------------------------
# C: joins (broadcast / shuffle / semi / anti / multi-way)
# --------------------------------------------------------------------------

@register(
    "brand_revenue",
    oracle="""
SELECT p_brand,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) * CAST(round((1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue,
       round(sum(l.l_quantity), 2)                           AS sum_qty,
       count(*)                                              AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p_brand
""",
    tags=("join", "broadcast", "agg"),
)
def brand_revenue(spark, sf_dir):
    """Fact x small-dim join. `part` is explicitly broadcast: at 100 TB
    the lineitem side never shuffles for the join — only the final 25-ish
    brand groups move. The integer revenue column is projected before the
    join, so the probe rows carry (partkey, qty, rev_i) only and the
    double->int conversion happens once per scan row."""
    l = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", _rev_i().alias("rev_i")
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            sum_rev_col("rev_i", "revenue"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "top_revenue_orders",
    oracle="""
SELECT o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) * CAST(round((1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY o.o_orderkey, order_date
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
""",
    tags=("join", "topk", "agg"),
)
def top_revenue_orders(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter -> 3-way join -> agg -> top-K.
    customer(filtered) broadcasts; orders<->lineitem co-shuffle on
    orderkey; orderBy+limit compiles to TakeOrderedAndProject (per-
    partition top-K + driver merge of 10 rows, never a full sort).
    Deterministic order: (rounded revenue desc, orderkey)."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01 00:00:00").cast("timestamp")
    )
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01 00:00:00").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"))
        .agg(sum_revenue("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "nation_revenue",
    oracle="""
SELECT n.n_name,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) * CAST(round((1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue,
       count(*) AS n_lines
FROM region r
JOIN nation n   ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name
""",
    tags=("join", "agg"),
)
def nation_revenue(spark, sf_dir):
    """TPC-H Q5-shaped 5-way star join. region/nation/customer broadcast
    up the chain; the only real shuffle is lineitem<->orders on orderkey.
    At 100 TB that shuffle is unavoidable (both are facts) — bucketing
    both by orderkey at write time would remove it entirely."""
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", _rev_i().alias("rev_i")
    )
    dims = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dims), o.o_custkey == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(
            sum_rev_col("rev_i", "revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "supplier_nation_revenue",
    oracle="""
SELECT n.n_name,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) * CAST(round((1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue,
       count(*) AS n_lines
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
    tags=("join", "broadcast", "agg"),
)
def supplier_nation_revenue(spark, sf_dir):
    """Chained broadcast joins (supplier, nation both tiny): lineitem is
    never shuffled pre-aggregation; zero exchange until the 25-row final
    agg. Integer revenue projected pre-join (once per scan row)."""
    l = table(spark, sf_dir, "lineitem").select(
        "l_suppkey", _rev_i().alias("rev_i")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            sum_rev_col("rev_i", "revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "big_order_customers_by_segment",
    oracle="""
SELECT c_mktsegment, count(*) AS n_customers
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
GROUP BY c_mktsegment
""",
    tags=("join", "semi", "agg"),
)
def big_order_customers_by_segment(spark, sf_dir):
    """LEFT SEMI join (EXISTS). The filtered orders side is aggregated
    to distinct custkeys by the semi-join itself — no duplication, no
    row explosion, and the probe side streams."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "customers_without_orders",
    oracle="""
SELECT count(*) AS n_customers
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
    tags=("join", "anti", "agg"),
)
def customers_without_orders(spark, sf_dir):
    """LEFT ANTI join (NOT EXISTS) -> global count."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "salted_event_type_stats",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_value
FROM events GROUP BY event_type
""",
    tags=("agg", "skew", "salted"),
)
def salted_event_type_stats(spark, sf_dir):
    """Two-phase SALTED aggregation over the 5-value ``event_type``
    column — the explicit skew rendering for a hot grouping key AQE
    can't split (operators/skew.py). Phase 1 spreads each hot key over
    16 (key, salt) reducers; phase 2 merges 16 partial rows per key.
    The result is identical to the plain groupBy (salting only reorders
    the algebraic merge), so the oracle is the plain SQL aggregate —
    exactly the property that makes salting safe to deploy."""
    e = table(spark, sf_dir, "events").select("event_type", "value")
    merged = salted_agg(
        e,
        "event_type",
        {
            "n_events": (F.count(F.lit(1)), F.sum("n_events")),
            "total_value": (F.sum(_cents("value")), F.sum("total_value")),
        },
    )
    return merged.select(
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        (F.col("total_value") / F.lit(100.0)).alias("total_value"),
    )


@register(
    "waiting_suppliers",
    oracle="""
WITH late AS (
    SELECT DISTINCT l.l_orderkey, l.l_suppkey
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS n_waiting_orders
FROM late t
JOIN supplier s ON s.s_suppkey = t.l_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = t.l_orderkey AND l2.l_suppkey <> t.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = t.l_orderkey AND l3.l_suppkey <> t.l_suppkey)
GROUP BY s.s_name
ORDER BY n_waiting_orders DESC, s.s_name ASC
LIMIT 10
""",
    tags=("join", "semi", "anti", "topk"),
)
def waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape (suppliers who kept orders waiting), adapted to
    this schema: lateness = shipped > 90 days after the order date. For
    each late (order, supplier): the order must involve ANOTHER supplier
    (correlated EXISTS -> left-semi with an extra non-equi conjunct) but
    NO other supplier may be late on it (correlated NOT EXISTS ->
    left-anti) — the densest correlated-subquery shape in the TPC-H
    suite, planned as two hash joins on l_orderkey.

    Scale: every join is keyed on l_orderkey, so all three legs co-
    partition on one shuffle key; the `late` set is filtered before
    either semi/anti probe, and the final agg carries one row per
    (supplier, order)."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    s = table(spark, sf_dir, "supplier")
    late = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    others = l.select(F.col("l_orderkey").alias("o_key"), F.col("l_suppkey").alias("o_supp"))
    late_others = late.select(
        F.col("l_orderkey").alias("a_key"), F.col("l_suppkey").alias("a_supp")
    )
    t = late.join(
        others,
        (F.col("l_orderkey") == F.col("o_key")) & (F.col("l_suppkey") != F.col("o_supp")),
        "left_semi",
    ).join(
        late_others,
        (F.col("l_orderkey") == F.col("a_key")) & (F.col("l_suppkey") != F.col("a_supp")),
        "left_anti",
    )
    return (
        t.join(F.broadcast(s), t.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_waiting_orders"))
        .orderBy(F.desc("n_waiting_orders"), F.asc("s_name"))
        .limit(10)
    )


@register(
    "order_priority_counts",
    oracle="""
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
""",
    tags=("join", "semi", "agg"),
)
def order_priority_counts(spark, sf_dir):
    """TPC-H Q4 shape: correlated EXISTS with an extra non-equi
    conjunct, decorrelated to a left-semi join with a post-join predicate
    (shipped-after-ordered)."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    cond = (l.l_orderkey == o.o_orderkey) & (l.l_shipdate > o.o_orderdate)
    return (
        o.join(l, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# --------------------------------------------------------------------------
# D/E: set ops + dedup
# --------------------------------------------------------------------------

@register(
    "orders_union_dedup",
    oracle="""
SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 150000
UNION
SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'O'
""",
    tags=("union", "dedup"),
)
def orders_union_dedup(spark, sf_dir):
    """Union-then-dedup — the dashboard's multi-file concat +
    drop_duplicates (D1+E1, streamlit_app.py:114,147) as a distinct
    union. unionByName keeps it schema-safe; dropDuplicates on the full
    row = SQL UNION."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 150000).select("o_orderkey", "o_totalprice")
    b = o.filter(F.col("o_orderstatus") == "O").select("o_orderkey", "o_totalprice")
    return a.unionByName(b).dropDuplicates()


@register(
    "latest_event_per_user",
    oracle="""
WITH ev AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type, "value", props FROM events)
SELECT user_id, event_id, event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str
FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id ASC) AS rn
    FROM ev
) WHERE rn = 1
""",
    tags=("window", "dedup"),
)
def latest_event_per_user(spark, sf_dir):
    """Deterministic keep-latest dedup (E1 done right): the reference's
    drop_duplicates(keep='first') depends on file order; we pin it with
    row_number over (ts DESC, event_id) — same shuffle cost as
    dropDuplicates but reproducible. Scale: one shuffle on user_id."""
    e = events_with_ts(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.asc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.date_format("ts", TS_FMT_SPARK).alias("ts_str"),
        )
    )


@register(
    "top_orders_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
    FROM orders
) WHERE rn <= 2
""",
    tags=("window", "topk"),
)
def top_orders_per_customer(spark, sf_dir):
    """Per-group top-K via ranking window (I-class capability the
    reference lacks). At scale this is the grouped-top-K idiom: single
    shuffle on the partition key, rank applied streaming per group —
    never a global sort."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


# --------------------------------------------------------------------------
# H: sorts / top-K / recency
# --------------------------------------------------------------------------

@register(
    "events_topk_recent",
    oracle="""
WITH ev AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type, "value", props FROM events)
SELECT event_id, event_type, "value",
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str
FROM ev
ORDER BY ts DESC, event_id ASC
LIMIT 20
""",
    tags=("topk", "sort"),
)
def events_topk_recent(spark, sf_dir):
    """Top-K by recency (H1: streamlit_app.py:317). orderBy().limit()
    compiles to TakeOrderedAndProject — per-partition heaps + a 20-row
    driver merge, not a cluster-wide sort."""
    e = events_with_ts(spark, sf_dir)
    return (
        e.orderBy(F.desc("ts"), F.asc("event_id"))
        .limit(20)
        .select(
            "event_id",
            "event_type",
            "value",
            F.date_format("ts", TS_FMT_SPARK).alias("ts_str"),
        )
    )


@register(
    "events_hourly",
    oracle="""
WITH ev AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type, "value", props FROM events)
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
       event_type,
       count(*) AS cnt,
       CAST(sum(CAST(round("value" * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
FROM ev
GROUP BY 1, 2
""",
    tags=("agg", "date", "streaming-parity"),
)
def events_hourly(spark, sf_dir):
    """Tumbling-hour aggregate — the batch twin of the streaming
    watermarked window count (streaming/pipeline.py); the streaming test
    asserts equality with this query's results."""
    e = events_with_ts(spark, sf_dir)
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            (F.sum(_cents("value")) / F.lit(100.0)).alias("sum_value"),
        )
    )


@register(
    "event_props_json",
    oracle="""
SELECT event_type,
       count(*) AS cnt,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k
FROM events
GROUP BY event_type
""",
    tags=("json", "agg"),
)
def event_props_json(spark, sf_dir):
    """Semi-structured extraction: pull a typed field out of the JSON
    ``props`` string and aggregate it — the schema-on-read repair family
    (B3/F6) applied to nested payloads. get_json_object is evaluated in
    the scan projection; at scale, promote hot JSON fields to real
    columns at ingest (from_json with an explicit schema)."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
        )
    )


def _event_user_cap_mod_for(spark, sf_dir: str) -> int:
    """Resolve the r13 sessionization user-slab cap
    (dials._event_user_cap_mod) from the events parquet footer — the
    same count source the callable oracle uses, so both engines
    provably resolve the same M. No-op (M=1) through sf10."""
    from .dials import _event_user_cap_mod
    from .similarity_queries import _parquet_total_count

    n = _parquet_total_count(sf_dir, "events")
    if n is None:
        n = table(spark, sf_dir, "events").count()
    return _event_user_cap_mod(n)


def _event_sessions_oracle(sf_dir: str) -> str | None:
    """Callable oracle for event_sessions: same SQL as the historical
    frozen string, with the user-slab predicate inlined when the r13
    cap is active (sf100: M=10). Returns the unpredicated SQL verbatim
    at every committed fixture, keeping all prior hashes frozen."""
    from .dials import _event_user_cap_mod
    from .similarity_queries import _parquet_total_count

    n = _parquet_total_count(sf_dir, "events")
    if n is None:
        return None
    m = _event_user_cap_mod(n)
    pred = f" WHERE user_id % {m} = 0" if m > 1 else ""
    return _EVENT_SESSIONS_SQL.format(pred=pred)


_EVENT_SESSIONS_SQL = """
WITH ev AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id FROM events{pred}),
lagged AS (
    SELECT user_id, ts, event_id,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM ev
),
flagged AS (
    SELECT user_id, ts, event_id,
           CASE WHEN prev_ts IS NULL
                  OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                THEN 1 ELSE 0 END AS is_new
    FROM lagged
),
sess AS (
    SELECT user_id, ts,
           CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
    FROM flagged
)
SELECT user_id, session_id,
       count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       CAST(max(epoch_us(ts)) - min(epoch_us(ts)) AS BIGINT) AS duration_us
FROM sess
GROUP BY user_id, session_id
"""


@register(
    "event_sessions",
    oracle=_event_sessions_oracle,
    tags=("window", "session"),
)
def event_sessions(spark, sf_dir):
    """Sessionization: a 30-minute inactivity gap starts a new session —
    lag() flags session starts, a running sum numbers them, then a
    per-session rollup. The batch twin of a session_window streaming
    aggregation. Scale: everything is windowed over user_id — one
    shuffle, state proportional to one user's events per partition.
    Output is ∝ events, so above 10 M events the r13 user-slab dial
    (dials._event_user_cap_mod, mirrored in the callable oracle)
    restricts both engines to the same `user_id % M = 0` subset —
    exact per kept user, no-op at every committed fixture."""
    e = events_with_ts(spark, sf_dir)
    m = _event_user_cap_mod_for(spark, sf_dir)
    if m > 1:
        e = e.filter(F.col("user_id") % m == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = w.rowsBetween(Window.unboundedPreceding, 0)
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = e.withColumn(
        "is_new",
        F.when(F.lag("ts").over(w).isNull() | (gap_us > 1800 * 1000 * 1000), 1).otherwise(0),
    )
    sess = flagged.withColumn("session_id", F.sum("is_new").over(w_cum).cast("bigint"))
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), TS_FMT_SPARK).alias("session_start"),
        (F.max(F.unix_micros(F.col("ts"))) - F.min(F.unix_micros(F.col("ts"))))
        .cast("bigint")
        .alias("duration_us"),
    )


@register(
    "promo_revenue",
    oracle="""
SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) / 10000.0 AS promo_revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    tags=("agg", "filter", "pushdown"),
)
def promo_revenue(spark, sf_dir):
    """TPC-H Q6 shape — the predicate-pushdown showcase: all four
    conjuncts reach the parquet scan (PushedFilters + row-group min/max
    skipping), only 2 columns are read beyond the filter columns, and
    the result is a single partial-aggregated row. The cheapest possible
    plan for a 100 TB scan-heavy query."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(_cents("l_extendedprice") * F.round(F.col("l_discount") * 100).cast("bigint")) / F.lit(10000.0)).alias("promo_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "returnflag_rollup",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(grouping(l_returnflag) AS INTEGER) AS g_flag,
       CAST(grouping(l_linestatus) AS INTEGER) AS g_status,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue,
       count(*) AS n_lines
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
""",
    tags=("agg", "rollup"),
)
def returnflag_rollup(spark, sf_dir):
    """Hierarchical totals via ROLLUP (subtotal per flag, grand total) —
    multi-level aggregation in ONE pass instead of three queries.
    grouping() flags disambiguate real nulls from rollup nulls. Spark
    expands this to a single Expand + hash agg; the shuffle still
    carries only (flags x statuses x 3) groups. The integer revenue is
    projected BEFORE the rollup, so Expand's 3x row duplication copies a
    precomputed bigint instead of re-running round()+cast per copy."""
    l = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", _rev_i().alias("rev_i")
    )
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            sum_rev_col("rev_i", "revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .select("l_returnflag", "l_linestatus", "g_flag", "g_status", "revenue", "n_lines")
    )


@register(
    "priority_price_quantiles",
    oracle="""
SELECT o_orderpriority,
       count(*) AS n_orders,
       round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
       round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.75), 4) AS p75
FROM orders
GROUP BY o_orderpriority
""",
    tags=("agg", "percentile"),
)
def priority_price_quantiles(spark, sf_dir):
    """Exact interpolated percentiles per group (linear interpolation at
    p*(n-1) — identical formula in Spark's percentile() and DuckDB's
    quantile_cont). Exact percentiles need the full group in one place;
    at 100 TB swap in approx_percentile (t-digest) and accept the
    documented error bound — same query shape."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("o_totalprice", F.lit(0.50)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.75)), 4).alias("p75"),
    )


@register(
    "user_value_moving_avg",
    oracle="""
WITH ev AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, "value" FROM events)
SELECT user_id, event_id,
       round(avg("value") OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS moving_avg
FROM ev
""",
    tags=("window", "timeseries"),
)
def user_value_moving_avg(spark, sf_dir):
    """Sliding-frame analytics: 4-row moving average per user ordered by
    event time — the window-frame operator family (I-class) the reference
    lacks. One shuffle on user_id; the frame is evaluated streaming per
    partition."""
    e = events_with_ts(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 4).alias("moving_avg"),
    )


@register(
    "user_value_trend",
    oracle="""
WITH ev AS (
    SELECT user_id,
           CAST(epoch_us(ts::TIMESTAMP) AS DOUBLE) / 3600000000.0 AS hours,
           "value"
    FROM events
)
SELECT user_id,
       count(*) AS n_events,
       round(regr_slope("value", hours), 6) AS slope,
       round(regr_r2("value", hours), 6) AS r2
FROM ev GROUP BY user_id
""",
    tags=("agg", "regression", "timeseries"),
)
def user_value_trend(spark, sf_dir):
    """Per-user linear trend of value over time via the SQL-standard
    regression aggregates (regr_slope/regr_r2) — closed-form, one hash
    agg, no iterative fitting. The grouped-ML primitive for 'is this
    metric drifting' over millions of keys."""
    e = events_with_ts(spark, sf_dir)
    hours = (F.unix_micros(F.col("ts")).cast("double") / 3600000000.0).alias("hours")
    return (
        e.select("user_id", hours, "value")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.regr_slope("value", "hours"), 6).alias("slope"),
            F.round(F.regr_r2("value", "hours"), 6).alias("r2"),
        )
    )


@register(
    "large_orders",
    oracle="""
SELECT c.c_name, o.o_orderkey, round(sum(l.l_quantity), 2) AS total_qty
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY c.c_name, o.o_orderkey
HAVING sum(l.l_quantity) > 150
""",
    tags=("join", "agg", "having"),
)
def large_orders(spark, sf_dir):
    """TPC-H Q18 shape: join -> group -> HAVING on the aggregate. Spark
    plans HAVING as a post-agg filter, so the predicate runs on the
    already-tiny aggregate, and at 100 TB the orderkey groupBy reuses the
    join's partitioning (no extra shuffle)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "o_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )


@register(
    "segment_set_ops",
    oracle="""
WITH big AS (
    SELECT DISTINCT o_custkey AS c FROM orders WHERE o_totalprice > 150000
),
building AS (
    SELECT c_custkey AS c FROM customer WHERE c_mktsegment = 'BUILDING'
)
SELECT
    CAST((SELECT count(*) FROM (SELECT c FROM big INTERSECT SELECT c FROM building)) AS BIGINT) AS n_both,
    CAST((SELECT count(*) FROM (SELECT c FROM building EXCEPT SELECT c FROM big)) AS BIGINT)    AS n_building_only
""",
    tags=("setop",),
)
def segment_set_ops(spark, sf_dir):
    """INTERSECT / EXCEPT (distinct set semantics) — the set-operation
    surface beyond UNION (SURVEY §2.D notes the reference has none).
    Spark plans these as left-semi / left-anti aggregates, so they cost
    one shuffle each on the compared column.

    Rendered as ONE lazy plan: each set-op count is a single-row
    aggregate and the two scalars meet in a crossJoin of 1x1 frames —
    no driver action inside the query function, one job at execution
    time instead of two collect-then-re-upload round trips."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    big = o.filter(F.col("o_totalprice") > 150000).select(F.col("o_custkey").alias("c")).distinct()
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(F.col("c_custkey").alias("c"))
    n_both = big.intersect(building).agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    n_building_only = (
        building.exceptAll(big)
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_building_only"))
    )
    return n_both.crossJoin(n_building_only)


@register(
    "fixed_class_counts",
    oracle="""
WITH classes(o_orderstatus) AS (VALUES ('O'), ('F'), ('P'), ('X')),
counts AS (
    SELECT o_orderstatus, count(*) AS cnt FROM orders GROUP BY o_orderstatus
)
SELECT c.o_orderstatus, CAST(coalesce(k.cnt, 0) AS BIGINT) AS cnt
FROM classes c LEFT JOIN counts k USING (o_orderstatus)
""",
    tags=("agg", "join", "nullfill"),
)
def fixed_class_counts(spark, sf_dir):
    """Fixed-class counts with default 0 — the reference looks up each
    of its three sentiment classes with a 0 default (G2:
    work.py:295-300, F9 fillna): rendered as a LEFT JOIN from a literal
    class table with coalesce. 'X' never occurs, proving the default
    path. The literal side broadcasts trivially."""
    o = table(spark, sf_dir, "orders")
    classes = spark.createDataFrame([("O",), ("F",), ("P",), ("X",)], "o_orderstatus string")
    counts = o.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("cnt"))
    return classes.join(counts, "o_orderstatus", "left").select(
        "o_orderstatus", F.coalesce(F.col("cnt"), F.lit(0)).cast("bigint").alias("cnt")
    )


@register(
    "nation_supplier_roster",
    oracle="""
SELECT n.n_name,
       count(*) AS n_suppliers,
       array_to_string((list(s.s_name ORDER BY s.s_name))[1:8], ',') AS roster
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
    tags=("agg", "array"),
)
def nation_supplier_roster(spark, sf_dir):
    """Array aggregation with deterministic ordering AND a bounded
    payload (r5 verdict #5): collect_list is unordered in a distributed
    engine, so the roster is sorted; and because the roster is
    display-bound it is capped to the first 8 names PER GROUP *before*
    the aggregate — row_number over (nation, s_name) marks the top-8,
    and collect_list only ever sees those (nulls are skipped), so the
    aggregation buffer is O(8) per group however hot the key. A
    slice() after collect_list would bound the output row but still
    buffer every member; this shape bounds the buffer itself. The full
    population stays visible via n_suppliers."""
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    w = Window.partitionBy("s_nationkey").orderBy("s_name")
    ranked = s.withColumn("rn", F.row_number().over(w))
    return (
        ranked.join(F.broadcast(n), ranked.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.array_join(
                F.array_sort(
                    F.collect_list(F.when(F.col("rn") <= 8, F.col("s_name")))
                ),
                ",",
            ).alias("roster"),
        )
    )


@register(
    "doc_preview_topk",
    oracle="""
SELECT doc_id, n_chars,
       substr(text, 1, 60) || '...' AS text_short
FROM documents
ORDER BY n_chars DESC, doc_id ASC
LIMIT 5
""",
    tags=("topk", "string"),
)
def doc_preview_topk(spark, sf_dir):
    """Substring preview (F5: streamlit_app.py:130 text[:200]+'...')
    over a top-K by length — string projection + TakeOrderedAndProject."""
    d = table(spark, sf_dir, "documents")
    return (
        d.orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(5)
        .select(
            "doc_id",
            "n_chars",
            F.concat(F.substring("text", 1, 60), F.lit("...")).alias("text_short"),
        )
    )


@register(
    "events_asof_orders",
    oracle="""
WITH ev AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, "value" FROM events),
od AS (
    SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
    FROM (
        SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                     ORDER BY o_orderkey DESC) AS rn
        FROM orders
    ) WHERE rn = 1
),
j AS (
    SELECT ev.*, od.o_orderkey, od.o_orderdate, od.o_totalprice
    FROM ev ASOF LEFT JOIN od
      ON ev.user_id = od.o_custkey AND ev.ts >= od.o_orderdate
)
SELECT count(*) AS n_events,
       CAST(sum(CASE WHEN o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
       round(avg(CASE WHEN o_orderkey IS NOT NULL
                      THEN (epoch_us(ts) - epoch_us(o_orderdate)) / 86400000000.0 END), 4)
           AS avg_lag_days,
       CAST(sum(coalesce(CAST(round(o_totalprice * 100) AS BIGINT), CAST(0 AS BIGINT))) AS BIGINT) / 100.0 AS matched_totalprice
FROM j
""",
    tags=("join", "asof"),
)
def events_asof_orders(spark, sf_dir):
    """AS-OF JOIN (operators/asof.py): each event picks up the user's
    most recent order as of the event time — the point-in-time join
    Spark lacks natively, rendered as union + ordered window with
    last(ignorenulls), one shuffle on the key, no range-join blowup.
    Orders are pre-deduped per (custkey, orderdate) so the ASOF pick is
    deterministic on both engines."""
    from ..operators.asof import asof_join

    ev = events_with_ts(spark, sf_dir)
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(F.desc("o_orderkey"))
    od = (
        table(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        # parquet NTZ -> session-TZ timestamp so unix_micros works and the
        # union key type matches the events ts
        .select(
            "o_custkey",
            F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
            "o_orderkey",
            "o_totalprice",
        )
    )
    j = asof_join(
        ev,
        od,
        left_on="user_id",
        right_on="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_orderdate", "o_totalprice"],
    )
    matched = F.col("o_orderkey").isNotNull()
    lag_days = (
        F.unix_micros(F.col("ts")) - F.unix_micros(F.col("o_orderdate"))
    ) / 86400000000.0
    return j.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(matched.cast("int")).cast("bigint").alias("n_matched"),
        F.round(F.avg(F.when(matched, lag_days)), 4).alias("avg_lag_days"),
        (F.sum(F.coalesce(_cents("o_totalprice"), F.lit(0).cast("bigint"))) / F.lit(100.0)).alias("matched_totalprice"),
    )


@register(
    "nation_pair_trade",
    oracle="""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS DOUBLE)
           / 10000 AS revenue,
       count(*) AS n_lines
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
WHERE ns.n_name <> nc.n_name
GROUP BY supp_nation, cust_nation
""",
    tags=("join", "agg"),
)
def nation_pair_trade(spark, sf_dir):
    """TPC-H Q7 shape: cross-border trade volume by (supplier nation,
    customer nation) pair — a 6-way join where every dimension
    broadcasts and the single fact-fact shuffle (lineitem x orders on
    orderkey) is shared with every other orderkey-keyed query.

    Revenue uses exact cent math (prices/discounts are 2-decimal, so
    cents x (100 - disc_pct) is an exact integer sum; one final
    division) — with 600 groups the chance of some float sum landing on
    a round() boundary gets real, and it did here."""
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    ns = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    nc = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), s.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), c.c_nationkey == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation")
        .agg(
            (
                F.sum(
                    F.round(F.col("l_extendedprice") * 100).cast("bigint")
                    * (100 - F.round(F.col("l_discount") * 100).cast("bigint"))
                ).cast("double")
                / 10000
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "event_types_above_avg",
    oracle="""
WITH t AS (SELECT event_type, sum("value") AS tot FROM events GROUP BY event_type)
SELECT event_type, round(tot, 2) AS total_value
FROM t
WHERE tot > (SELECT avg(tot) FROM t)
""",
    tags=("agg", "subquery"),
)
def event_types_above_avg(spark, sf_dir):
    """TPC-H Q11 shape: filter groups against a scalar computed from the
    same aggregate (scalar subquery). In the DataFrame API the scalar is
    a 1-row broadcast cross join — the aggregate is computed once and
    reused, not recomputed per row."""
    e = table(spark, sf_dir, "events")
    t = e.groupBy("event_type").agg(F.sum("value").alias("tot"))
    avg_tot = t.agg(F.avg("tot").alias("avg_tot"))
    return (
        t.crossJoin(F.broadcast(avg_tot))
        .filter(F.col("tot") > F.col("avg_tot"))
        .select("event_type", F.round(F.col("tot"), 2).alias("total_value"))
    )


@register(
    "best_month",
    oracle="""
WITH m AS (
    SELECT strftime(o_orderdate, '%Y-%m') AS order_month, sum(o_totalprice) AS rev
    FROM orders GROUP BY 1
)
SELECT order_month AS best_month, round(rev, 2) AS revenue
FROM m ORDER BY rev DESC, order_month ASC LIMIT 1
""",
    tags=("agg", "topk"),
)
def best_month(spark, sf_dir):
    """TPC-H Q15 shape: the argmax group (best revenue month) — rank the
    aggregate, take the top with a deterministic tiebreak."""
    o = table(spark, sf_dir, "orders")
    m = (
        o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    return (
        m.orderBy(F.desc("rev"), F.asc("order_month"))
        .limit(1)
        .select(F.col("order_month").alias("best_month"), F.round("rev", 2).alias("revenue"))
    )


@register(
    "value_band_join",
    oracle="""
WITH bands(band_name, lo, hi) AS (VALUES
    ('low',    CAST(0.0 AS DOUBLE),   CAST(100.0 AS DOUBLE)),
    ('mid',    CAST(100.0 AS DOUBLE), CAST(300.0 AS DOUBLE)),
    ('high',   CAST(300.0 AS DOUBLE), CAST(1000.0 AS DOUBLE))
)
SELECT b.band_name,
       count(*) AS cnt,
       CAST(sum(CAST(round(e."value" * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
FROM events e JOIN bands b ON e."value" >= b.lo AND e."value" < b.hi
GROUP BY b.band_name
""",
    tags=("join", "range"),
)
def value_band_join(spark, sf_dir):
    """Range (interval) join: facts against a tiny banding table on a
    BETWEEN predicate. Spark plans this as a BroadcastNestedLoopJoin —
    fine exactly because the build side is rows-not-data; for
    fact x fact interval joins the scale path is bucketing both sides
    by coarsened range keys. Bands here are half-open [lo, hi)."""
    e = table(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [("low", 0.0, 100.0), ("mid", 100.0, 300.0), ("high", 300.0, 1000.0)],
        "band_name string, lo double, hi double",
    )
    return (
        e.join(
            F.broadcast(bands),
            (e["value"] >= bands.lo) & (e["value"] < bands.hi),
        )
        .groupBy("band_name")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            (F.sum(_cents("value")) / F.lit(100.0)).alias("sum_value"),
        )
    )


@register(
    "daily_active_users",
    oracle="""
WITH ev AS (SELECT ts::TIMESTAMP AS ts, user_id FROM events)
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       count(DISTINCT user_id) AS dau,
       count(*) AS n_events
FROM ev GROUP BY 1
""",
    tags=("agg", "distinct", "date"),
)
def daily_active_users(spark, sf_dir):
    """Daily distinct users — the exact count-distinct per time bucket.
    Spark expands this to a two-phase distinct aggregate; at 100 TB the
    drop-in replacement is approx_count_distinct (HyperLogLog) at a documented
    error bound, same query shape."""
    e = events_with_ts(spark, sf_dir)
    return e.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.countDistinct("user_id").alias("dau"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "events_sliding_2h",
    oracle="""
WITH ev AS (SELECT ts::TIMESTAMP AS ts, event_type FROM events),
w AS (
    SELECT date_trunc('hour', ts) AS wstart, event_type FROM ev
    UNION ALL
    SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS wstart, event_type FROM ev
)
SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS cnt
FROM w GROUP BY 1, 2
""",
    tags=("agg", "window", "sliding", "streaming-parity"),
)
def events_sliding_2h(spark, sf_dir):
    """Sliding event-time windows (2h size, 1h slide) — each event lands
    in exactly two overlapping windows. Spark's window() expands rows
    window-count times before the hash agg (the oracle mirrors that as a
    two-offset UNION ALL). Drop-in streaming twin: the identical
    groupBy(window(...)) under a watermark."""
    e = events_with_ts(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "cnt",
        )
    )


# ---------------------------------------------------------------------------
# Partition-pruning twins (r10 verdict #7): the same time-window
# queries against the date-partitioned events layout
# (sources.tables.events_partitioned), sliced to a fixed week so the
# plan carries PartitionFilters and the scan reads 7 of 30 date
# directories. Every TESTDATA table is flat parquet, so these twins
# are the repo's partition-pruning evidence: same results as slicing
# the flat table (the oracle does exactly that), a fraction of the
# scan. tests/test_plans.py asserts the pruned plan + equal results;
# PLANS.md's `pruned` column records it for every query.
# ---------------------------------------------------------------------------

_PRUNE_LO, _PRUNE_HI = "2024-01-08", "2024-01-14"
_PRUNE_ORACLE_PRED = (
    f"ts::DATE BETWEEN DATE '{_PRUNE_LO}' AND DATE '{_PRUNE_HI}'"
)


def _events_pruned_week(spark, sf_dir):
    from ..sources.tables import events_partitioned

    e = events_partitioned(spark, sf_dir)
    return e.filter(F.col("event_date").between(_PRUNE_LO, _PRUNE_HI))


@register(
    "events_hourly_pruned",
    oracle=f"""
WITH ev AS (SELECT ts::TIMESTAMP AS ts, event_type, "value" FROM events
            WHERE {_PRUNE_ORACLE_PRED})
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
       event_type,
       count(*) AS cnt,
       CAST(sum(CAST(round("value" * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
FROM ev
GROUP BY 1, 2
""",
    tags=("agg", "date", "partition-pruning"),
)
def events_hourly_pruned(spark, sf_dir):
    """``events_hourly`` over one week of the DATE-PARTITIONED events
    twin: the week filter is a PartitionFilter — the scan plans 7 of
    30 date directories and never opens the rest (the flat-fixture
    path can only row-filter after reading). At 100 TB this is the
    difference between a 23%-of-table scan and a full scan; the oracle
    computes the identical slice from the flat table, so equal hashes
    prove pruning changed the I/O, not the answer."""
    e = _events_pruned_week(spark, sf_dir)
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            (F.sum(_cents("value")) / F.lit(100.0)).alias("sum_value"),
        )
    )


@register(
    "daily_active_users_pruned",
    oracle=f"""
WITH ev AS (SELECT ts::TIMESTAMP AS ts, user_id FROM events
            WHERE {_PRUNE_ORACLE_PRED})
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       count(DISTINCT user_id) AS dau,
       count(*) AS n_events
FROM ev GROUP BY 1
""",
    tags=("agg", "distinct", "date", "partition-pruning"),
)
def daily_active_users_pruned(spark, sf_dir):
    """``daily_active_users`` over the pruned week — the partition
    column IS the group key, so the scan's directory layout already
    co-locates each group's rows."""
    e = _events_pruned_week(spark, sf_dir)
    return e.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.countDistinct("user_id").alias("dau"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "events_sliding_2h_pruned",
    oracle=f"""
WITH ev AS (SELECT ts::TIMESTAMP AS ts, event_type FROM events
            WHERE {_PRUNE_ORACLE_PRED}),
w AS (
    SELECT date_trunc('hour', ts) AS wstart, event_type FROM ev
    UNION ALL
    SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS wstart, event_type FROM ev
)
SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS cnt
FROM w GROUP BY 1, 2
""",
    tags=("agg", "window", "sliding", "partition-pruning"),
)
def events_sliding_2h_pruned(spark, sf_dir):
    """``events_sliding_2h`` over the pruned week. Note the window
    boundary semantics are unchanged: events land in their own 2h/1h
    windows; only the EVENT set is week-sliced (exactly what the
    oracle slices), so the first/last windows straddling the cut
    contain the cut's events only — same on both engines."""
    e = _events_pruned_week(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "cnt",
        )
    )


# --- dynamic partition pruning (r11 verdict #3) ----------------------------
#
# The static twins above carry LITERAL date predicates, which Catalyst
# folds into PartitionFilters at plan time. The 100 TB star-schema
# mechanism is stronger: the date predicate arrives THROUGH A DIM JOIN
# (filter on the dim's attribute, join on the fact's partition column),
# so the prunable date set is only known at runtime — Spark must inject
# a dynamicpruningexpression subquery into the fact scan that is fed by
# the dim's broadcast. This is the scale rendering of the dashboard's
# time-filtered reads (reference streamlit_app.py:136-141) when "the
# last week" is a dimension attribute, not a literal.

_DPP_EPOCH = "2024-01-01"
_DPP_WEEK_ID = 1  # days 7-13 since epoch == 2024-01-08..2024-01-14,
#                   the same slice the static twins use


def calendar_dim(spark: SparkSession) -> DataFrame:
    """366-row calendar dimension: one row per 2024 date with a derived
    week_id (days-since-epoch // 7 — integer arithmetic, identical on
    any engine, deliberately NOT ISO weeks whose year-boundary rules
    differ across engines). Tiny by construction: always broadcast."""
    return spark.range(366).select(
        F.date_add(F.lit(_DPP_EPOCH).cast("date"), F.col("id").cast("int")).alias(
            "event_date"
        ),
        (F.col("id") / 7).cast("int").alias("week_id"),
    )


@register(
    "events_dynamic_pruned",
    oracle=f"""
WITH ev AS (
    SELECT ts::TIMESTAMP AS ts, event_type, "value" FROM events
    WHERE (ts::DATE - DATE '{_DPP_EPOCH}') // 7 = {_DPP_WEEK_ID}
)
SELECT event_type,
       count(*) AS cnt,
       CAST(sum(CAST(round("value" * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
FROM ev GROUP BY event_type
""",
    tags=("join", "agg", "date", "partition-pruning", "dynamic-partition-pruning"),
)
def events_dynamic_pruned(spark, sf_dir):
    """DYNAMIC partition pruning: the week slice reaches the
    date-partitioned fact only through ``calendar_dim`` — the query
    filters the dim on ``week_id`` and joins on ``event_date``; no
    literal date predicate touches the fact. Spark plans the scan with
    ``dynamicpruningexpression(event_date IN dynamicpruning#N)`` fed by
    the dim's broadcast (asserted in tests/test_plans.py the way
    broadcast joins are), so at 100 TB the fact scan opens only the 7
    matching date directories even though the dates are data, not
    literals. The oracle derives the same slice arithmetically from the
    flat table — equal hashes prove runtime pruning changed the I/O,
    not the answer."""
    from ..sources.tables import events_partitioned

    e = events_partitioned(spark, sf_dir)
    dim = calendar_dim(spark).filter(F.col("week_id") == _DPP_WEEK_ID)
    return (
        e.join(F.broadcast(dim), "event_date")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            (F.sum(_cents("value")) / F.lit(100.0)).alias("sum_value"),
        )
    )


@register(
    "promo_type_share",
    oracle="""
WITH j AS (
    SELECT p.p_type,
           CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS rev_e4
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
)
SELECT 100 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_e4 ELSE 0 END) AS DOUBLE)
           / CAST(sum(rev_e4) AS DOUBLE) AS promo_share_pct,
       count(*) AS n_lines
FROM j
""",
    tags=("join", "agg", "ratio"),
)
def promo_type_share(spark, sf_dir):
    """TPC-H Q14 shape: conditional-share ratio (promo revenue / total
    revenue) over a date-sliced broadcast join. Numerator and denominator
    are exact integer sums (cent math), so the share is ONE float
    division with identical operands on both engines — no rounding
    needed even for a ratio."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part")
    rev_e4 = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        100 - F.round(F.col("l_discount") * 100).cast("bigint")
    )
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey).select(
        "p_type", rev_e4.alias("rev_e4")
    )
    promo = F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev_e4")).otherwise(F.lit(0)))
    return j.agg(
        (100 * promo.cast("double") / F.sum("rev_e4").cast("double")).alias("promo_share_pct"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "customer_order_fill",
    oracle="""
SELECT c.c_custkey,
       c.c_mktsegment,
       CAST(coalesce(o.n_orders, 0) AS BIGINT) AS n_orders,
       round(coalesce(o.total_spend, CAST(0.0 AS DOUBLE)), 2) AS total_spend
FROM customer c
LEFT JOIN (
    SELECT o_custkey, count(*) AS n_orders, sum(o_totalprice) AS total_spend
    FROM orders GROUP BY o_custkey
) o ON o.o_custkey = c.c_custkey
""",
    tags=("join", "outer", "nullfill"),
)
def customer_order_fill(spark, sf_dir):
    """LEFT OUTER join with null-fill (F9): every customer keeps a row,
    order-less customers get 0s — aggregate-then-join so the outer join
    probes a pre-shrunk (one row per custkey) build side instead of raw
    orders."""
    c = table(spark, sf_dir, "customer")
    o = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("total_spend"),
        )
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey",
        "c_mktsegment",
        F.coalesce(F.col("n_orders"), F.lit(0)).cast("bigint").alias("n_orders"),
        F.round(F.coalesce(F.col("total_spend"), F.lit(0.0)), 2).alias("total_spend"),
    )


@register(
    "user_customer_full_outer",
    oracle="""
WITH eu AS (SELECT DISTINCT user_id FROM events),
ck AS (SELECT c_custkey FROM customer)
SELECT CAST(sum(CASE WHEN user_id IS NOT NULL AND c_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
       CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_event_only,
       CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_customer_only
FROM eu FULL OUTER JOIN ck ON eu.user_id = ck.c_custkey
""",
    tags=("join", "outer"),
)
def user_customer_full_outer(spark, sf_dir):
    """FULL OUTER join reconciliation: which event users exist in the
    customer dimension, which don't, and which customers never event —
    the classic two-system audit query, reduced to three counts."""
    eu = table(spark, sf_dir, "events").select("user_id").distinct()
    ck = table(spark, sf_dir, "customer").select("c_custkey")
    j = eu.join(ck, eu.user_id == ck.c_custkey, "full_outer")
    both = (F.col("user_id").isNotNull() & F.col("c_custkey").isNotNull()).cast("int")
    return j.agg(
        F.sum(both).cast("bigint").alias("n_both"),
        F.sum(F.col("c_custkey").isNull().cast("int")).cast("bigint").alias("n_event_only"),
        F.sum(F.col("user_id").isNull().cast("int")).cast("bigint").alias("n_customer_only"),
    )


@register(
    "region_status_grid",
    oracle="""
SELECT r.r_name, s.o_orderstatus, count(*) AS n_cells
FROM region r CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
GROUP BY r.r_name, s.o_orderstatus
""",
    tags=("join", "cross"),
)
def region_status_grid(spark, sf_dir):
    """Explicit CROSS JOIN: the dimension-grid generator (5 regions x 3
    statuses) used to densify sparse aggregates before a left join —
    only ever sane when both sides are tiny, which is exactly when
    Spark plans it as a broadcast nested loop."""
    r = table(spark, sf_dir, "region").select("r_name")
    s = table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(s).groupBy("r_name", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_cells")
    )


@register(
    "user_value_trend_pandas",
    oracle="""
WITH ev AS (
    SELECT user_id,
           CAST(epoch_us(ts::TIMESTAMP) AS DOUBLE) / 3600000000.0 AS hours,
           "value"
    FROM events
)
SELECT user_id,
       count(*) AS n_events,
       round(regr_slope("value", hours), 6) AS slope
FROM ev GROUP BY user_id
""",
    tags=("agg", "regression", "pandas-udf"),
)
def user_value_trend_pandas(spark, sf_dir):
    """The per-group OLS slope computed by grouped applyInPandas (numpy
    closed form) instead of the SQL regr_slope aggregate — same oracle
    as user_value_trend, proving the Arrow-grouped-UDF path produces
    numbers the declarative path (and DuckDB) agree with. This is the
    template for per-group Python computations with no SQL equivalent:
    one shuffle on the group key, Arrow batch per group, numpy inside."""
    import numpy as np
    import pandas as pd

    e = events_with_ts(spark, sf_dir)
    base = e.select(
        "user_id",
        (F.unix_micros(F.col("ts")).cast("double") / 3600000000.0).alias("hours"),
        "value",
    )

    def ols(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["hours"].to_numpy(dtype=np.float64)
        y = pdf["value"].to_numpy(dtype=np.float64)
        n = len(x)
        # same two-pass covariance/variance form the SQL aggregate uses
        xm, ym = x.mean(), y.mean()
        denom = ((x - xm) ** 2).sum()
        slope = float(((x - xm) * (y - ym)).sum() / denom) if denom else None
        return pd.DataFrame(
            {"user_id": [pdf["user_id"].iloc[0]], "n_events": [n],
             "slope": [round(slope, 6) if slope is not None else None]}
        )

    # pin the group-exchange width (debounce rationale: AQE coalesces
    # the few-MB shuffle to 1 partition and serializes every group
    # through one Python worker; the explicit key repartition satisfies
    # the required distribution, so no second exchange appears)
    base = base.repartition(
        spark.sparkContext.defaultParallelism, "user_id"
    )
    return base.groupBy("user_id").applyInPandas(
        ols, "user_id bigint, n_events bigint, slope double"
    )


@register(
    "acctbal_quartiles",
    oracle="""
WITH q AS (
    SELECT c_acctbal,
           ntile(4) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS quartile
    FROM customer
)
SELECT quartile,
       count(*) AS n_customers,
       round(min(c_acctbal), 2) AS min_bal,
       round(max(c_acctbal), 2) AS max_bal
FROM q GROUP BY quartile
""",
    tags=("window", "ntile", "agg"),
)
def acctbal_quartiles(spark, sf_dir):
    """NTILE quartile bucketing over a global order (deterministic via
    the custkey tiebreak) + per-bucket stats — the equal-population
    binning counterpart of the fixed-width histogram (G6). The global
    sort is the scale caveat: at 100 TB use approx quantile cut points
    instead of a total order."""
    c = table(spark, sf_dir, "customer")
    w = Window.orderBy(F.asc("c_acctbal"), F.asc("c_custkey"))
    q = c.select("c_acctbal", F.ntile(4).over(w).alias("quartile"))
    return q.groupBy("quartile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
    )


@register(
    "acctbal_quartiles_approx",
    oracle="""
WITH c AS (
    SELECT c_acctbal, CAST(round(c_acctbal * 100) AS BIGINT) AS cents FROM customer
),
cuts AS (
    SELECT quantile_cont(cents, 0.25) AS q1,
           quantile_cont(cents, 0.50) AS q2,
           quantile_cont(cents, 0.75) AS q3
    FROM c
)
SELECT CASE WHEN cents <= q1 THEN 1
            WHEN cents <= q2 THEN 2
            WHEN cents <= q3 THEN 3
            ELSE 4 END AS quartile,
       count(*) AS n_customers,
       round(min(c_acctbal), 2) AS min_bal,
       round(max(c_acctbal), 2) AS max_bal
FROM c, cuts
GROUP BY quartile
""",
    tags=("agg", "quantile", "scale"),
)
def acctbal_quartiles_approx(spark, sf_dir):
    """Quartile binning WITHOUT a global sort — the 100 TB rendering of
    ``acctbal_quartiles``. Cut points come from a distributed percentile
    aggregate (partial-merge, one output row), broadcast back onto the
    table, and rows are bucketed by pure CASE expressions. The plan has
    no window at all, so there is no single-partition funnel; cost is
    two scans + an O(1) broadcast.

    Determinism across engines: balances are converted to integer CENTS
    first, so the quartile interpolation ``a + (b - a) * {0.25,0.5,0.75}``
    runs on integer-valued doubles with power-of-two fractions — exact
    in IEEE arithmetic, bit-identical on Spark and DuckDB, and the
    bucket comparison needs no rounding at all (the round-before-
    threshold convention is unnecessary when the math is exact).

    Tie semantics differ from NTILE by design: equal balances land in
    the same bucket (value-based binning), whereas NTILE splits ties to
    force equal populations — the classic accuracy/scalability trade of
    percentile bucketing."""
    c = table(spark, sf_dir, "customer").select(
        "c_acctbal",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("cents"),
    )
    cuts = c.agg(
        F.expr("percentile(cents, 0.25)").alias("q1"),
        F.expr("percentile(cents, 0.50)").alias("q2"),
        F.expr("percentile(cents, 0.75)").alias("q3"),
    )
    bucketed = c.crossJoin(F.broadcast(cuts)).select(
        "c_acctbal",
        F.when(F.col("cents") <= F.col("q1"), 1)
        .when(F.col("cents") <= F.col("q2"), 2)
        .when(F.col("cents") <= F.col("q3"), 3)
        .otherwise(4)
        .alias("quartile"),
    )
    return bucketed.groupBy("quartile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
    )


@register(
    "status_pivot_by_segment",
    oracle="""
SELECT c.c_mktsegment,
       CAST(sum(CASE WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
       CAST(sum(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
       CAST(sum(CASE WHEN o.o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
    tags=("pivot", "agg", "join"),
)
def status_pivot_by_segment(spark, sf_dir):
    """Long->wide PIVOT: order counts per (segment, status) spread into
    one column per status via ``groupBy().pivot(col, values)``. Pinning
    the pivot value list keeps the plan a single pass (no extra
    distinct-values job) and makes the output schema static — exactly
    what a 100 TB pivot needs; Catalyst compiles it to the same
    conditional aggregates the oracle spells out."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    wide = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
    )
    return wide.select(
        "c_mktsegment",
        F.coalesce(F.col("O"), F.lit(0)).cast("bigint").alias("n_open"),
        F.coalesce(F.col("F"), F.lit(0)).cast("bigint").alias("n_finished"),
        F.coalesce(F.col("P"), F.lit(0)).cast("bigint").alias("n_pending"),
    )


@register(
    "top_decile_values_by_type",
    oracle="""
WITH ranked AS (
    SELECT event_type, "value",
           percent_rank() OVER (PARTITION BY event_type
                                ORDER BY round("value", 6) DESC, event_id ASC) AS pr
    FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_top,
       round(avg("value"), 4) AS avg_top_value,
       round(min("value"), 4) AS cutoff_value
FROM ranked WHERE pr <= 0.1
GROUP BY event_type
""",
    tags=("window", "rank", "agg"),
)
def top_decile_values_by_type(spark, sf_dir):
    """percent_rank windows: the top decile of event values WITHIN each
    event_type — distribution-relative filtering (heavy-user cutoffs,
    outlier trimming). The window partitions on a real key (5 types),
    so every partition sorts in parallel — no single-reducer funnel;
    ordering uses the 6dp-rounded value + event_id tiebreak so both
    engines rank identically."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.desc(F.round(F.col("value"), 6)), F.asc("event_id")
    )
    ranked = e.select("event_type", "value", F.percent_rank().over(w).alias("pr"))
    return (
        ranked.filter(F.col("pr") <= 0.1)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_top"),
            F.round(F.avg("value"), 4).alias("avg_top_value"),
            F.round(F.min("value"), 4).alias("cutoff_value"),
        )
    )


@register(
    "stratified_sample_by_lang",
    oracle="""
WITH s AS (
    SELECT lang, n_chars,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 18, 15))::BIGINT % 10 = 0 AS picked
    FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN picked THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       round(avg(CASE WHEN picked THEN n_chars END), 4) AS sample_avg_chars,
       round(avg(n_chars), 4) AS full_avg_chars
FROM s GROUP BY lang
""",
    tags=("sampling", "agg"),
)
def stratified_sample_by_lang(spark, sf_dir):
    """DETERMINISTIC stratified sampling — the reproducible-subset
    primitive of a training-data pipeline (eval splits, ablation
    corpora): pick ~10% per language stratum by md5(doc_id) parity, not
    rand(). Hash-based selection is stable across runs, engines, and
    partitionings (sample() is not), joins cleanly against other tables
    picked the same way, and the per-stratum sample-vs-full length
    comparison doubles as the selection-bias check."""
    d = table(spark, sf_dir, "documents")
    picked = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 18, 15), 16, 10)
        .cast("bigint") % 10 == 0
    )
    s = d.select("lang", "n_chars", picked.alias("picked"))
    return s.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("picked"), 1).otherwise(0)).cast("bigint").alias("n_sampled"),
        F.round(F.avg(F.when(F.col("picked"), F.col("n_chars"))), 4).alias("sample_avg_chars"),
        F.round(F.avg("n_chars"), 4).alias("full_avg_chars"),
    )


@register(
    "click_purchase_funnel",
    oracle="""
WITH clicks AS (
    SELECT user_id, ts FROM events WHERE event_type = 'click'
),
purchases AS (
    SELECT user_id, ts FROM events WHERE event_type = 'purchase'
),
converted AS (
    SELECT DISTINCT c.user_id
    FROM clicks c JOIN purchases p
      ON p.user_id = c.user_id
     AND p.ts > c.ts
     AND p.ts <= c.ts + INTERVAL 1 HOUR
)
SELECT CAST((SELECT count(DISTINCT user_id) FROM clicks) AS BIGINT) AS n_clickers,
       CAST((SELECT count(*) FROM converted) AS BIGINT) AS n_converted
""",
    tags=("join", "range", "funnel"),
)
def click_purchase_funnel(spark, sf_dir):
    """Event-sequence funnel: users with a purchase within 1 hour AFTER
    a click — the behavioral-analytics join class (range self-join on
    user_id + event-time window). The equi-key carries the join; the
    time range is a residual predicate, so this stays a hash join, and
    the batch rendering mirrors the stream-stream interval join tested
    in streaming (same condition shape). One lazy plan: both funnel
    stages are single-row aggs crossJoined."""
    e = events_with_ts(spark, sf_dir)
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    converted = (
        clicks.join(
            purchases,
            (F.col("p_user") == F.col("user_id"))
            & (F.col("p_ts") > F.col("ts"))
            & (F.col("p_ts") <= F.col("ts") + F.expr("INTERVAL 1 HOUR")),
            "left_semi",
        )
        .select("user_id")
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_converted"))
    )
    n_clickers = clicks.agg(
        F.count_distinct(F.col("user_id")).cast("bigint").alias("n_clickers")
    )
    return n_clickers.crossJoin(converted)


@register(
    "approx_distinct_contract",
    oracle="""
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact,
       TRUE AS approx_within_5pct
FROM events
GROUP BY event_type
""",
    tags=("sketch", "approx", "agg"),
)
def approx_distinct_contract(spark, sf_dir):
    """HyperLogLog++ cardinality sketch with an error-bound contract:
    per event_type, the exact distinct-user count PLUS a flag asserting
    Spark's approx_count_distinct landed within 5% of exact. Sketch
    values themselves are engine-specific, so the oracle checks the
    CONTRACT (exact count + bound holds), not the raw estimate — the
    honest way to diff a sketch across engines. rsd=0.02 (not the 0.05
    default): measured at sf0.1, rsd=0.05 sits in the HLL++
    sparse-to-dense bias region and errs 6.7% on ~1.5k-user groups —
    asserting a 1-sigma bound as certain is exactly the trap this
    query exists to document; 0.02 keeps 12x margin at every tested
    scale. At 100 TB the sketch is the point: HLL partial states merge
    associatively map-side, so the shuffle carries ~kilobyte sketches
    instead of the distinct-user set a count_distinct would spill."""
    e = table(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("bigint").alias("n_users_exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("n_users_approx"),
    )
    within = (
        F.abs(F.col("n_users_approx") - F.col("n_users_exact"))
        / F.col("n_users_exact").cast("double")
        <= 0.05
    )
    return agg.select("event_type", "n_users_exact", within.alias("approx_within_5pct"))


@register(
    "acctbal_stats_unpivot",
    oracle="""
WITH wide AS (
    SELECT c_mktsegment,
           round(min(c_acctbal), 2) AS min_bal,
           round(avg(c_acctbal), 2) AS avg_bal,
           round(max(c_acctbal), 2) AS max_bal
    FROM customer GROUP BY c_mktsegment
)
SELECT c_mktsegment, 'min_bal' AS stat, min_bal AS value FROM wide
UNION ALL
SELECT c_mktsegment, 'avg_bal' AS stat, avg_bal AS value FROM wide
UNION ALL
SELECT c_mktsegment, 'max_bal' AS stat, max_bal AS value FROM wide
""",
    tags=("unpivot", "melt", "agg"),
)
def acctbal_stats_unpivot(spark, sf_dir):
    """Wide->long UNPIVOT (melt): per-segment balance stats spread back
    into (segment, stat, value) rows — the inverse of
    status_pivot_by_segment and the standard feed for long-format chart
    / metric sinks. ``DataFrame.unpivot`` compiles to a single Expand
    node (each input row emitted once per stat column, no join, no
    shuffle beyond the 5-group agg that feeds it)."""
    c = table(spark, sf_dir, "customer")
    wide = c.groupBy("c_mktsegment").agg(
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.avg("c_acctbal"), 2).alias("avg_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
    )
    return wide.unpivot(
        ids=["c_mktsegment"],
        values=["min_bal", "avg_bal", "max_bal"],
        variableColumnName="stat",
        valueColumnName="value",
    )


@register(
    "daily_events_gapfill",
    oracle="""
WITH ev AS (
    SELECT event_type, CAST(ts::TIMESTAMP AS DATE) AS day FROM events
),
counts AS (
    SELECT event_type, day, CAST(count(*) AS BIGINT) AS n FROM ev GROUP BY event_type, day
),
bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
spine AS (
    SELECT t.event_type, s.day::DATE AS day
    FROM (SELECT DISTINCT event_type FROM ev) t
    CROSS JOIN bounds
    CROSS JOIN LATERAL (SELECT unnest(generate_series(bounds.d0, bounds.d1, INTERVAL 1 DAY)) AS day) s
)
SELECT strftime(spine.day, '%Y-%m-%d') AS day,
       spine.event_type,
       coalesce(counts.n, 0) AS n_events
FROM spine LEFT JOIN counts
  ON counts.event_type = spine.event_type AND counts.day = spine.day
""",
    tags=("timeseries", "gapfill", "join"),
)
def daily_events_gapfill(spark, sf_dir):
    """Time-series gap-fill: daily event counts per type over a dense
    date spine — missing (type, day) cells emitted as explicit zeros,
    the shape every downstream chart / anomaly detector needs. The
    spine is generated IN the plan (sequence(min,max) exploded, cross
    joined with the distinct-type dimension): both sides of the cross
    join are aggregate-derived and tiny (days x types), so the spine
    broadcasts against the counts — the fact table is only scanned
    once, for the groupBy. No driver-side date loop, no collect."""
    e = events_with_ts(spark, sf_dir)
    ev = e.select("event_type", F.to_date("ts").alias("day"))
    counts = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    bounds = ev.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = (
        ev.select("event_type")
        .distinct()
        .crossJoin(bounds)
        .select(
            "event_type",
            F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day"),
        )
    )
    return (
        spine.join(counts, ["event_type", "day"], "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
        )
    )


@register(
    "region_status_cube",
    oracle="""
SELECT coalesce(r.r_name, '(all)') AS region,
       coalesce(o.o_orderstatus, '(all)') AS status,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_price
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY CUBE (r.r_name, o.o_orderstatus)
""",
    tags=("cube", "grouping-sets", "agg"),
)
def region_status_cube(spark, sf_dir):
    """CUBE grouping sets: order counts and revenue for every
    (region, status) combination PLUS each one-dimensional margin and
    the grand total in a single pass — the OLAP cross-tab feed. Spark
    compiles cube() to one Expand + one aggregate (each input row
    emitted once per grouping set), so the fact side is still scanned
    and shuffled once; the dimension joins stay broadcast. Integer cents
    are projected at the fact scan — before the joins widen the row and
    before Expand's 4x duplication — so the conversion runs once per
    order row."""
    o = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderstatus", _cents("o_totalprice").alias("tp_c")
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    joined = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.cube("r_name", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            sum_cents_col("tp_c", "total_price"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("(all)")).alias("region"),
            F.coalesce(F.col("o_orderstatus"), F.lit("(all)")).alias("status"),
            "n_orders",
            "total_price",
        )
    )


@register(
    "approx_quantile_contract",
    oracle="""
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 2) AS p50_exact,
       TRUE AS approx_within_1pct
FROM orders
GROUP BY o_orderpriority
""",
    tags=("sketch", "approx", "quantile"),
)
def approx_quantile_contract(spark, sf_dir):
    """Quantile sketch with an error contract: per order priority, the
    exact median order price PLUS a flag asserting Spark's
    percentile_approx (accuracy 10000) landed within 1% of exact. Like
    approx_distinct_contract, the oracle checks the CONTRACT, not the
    engine-specific sketch value. At 100 TB the sketch is mandatory:
    exact percentiles need a full sort per group, while the KLL-style
    sketch merges map-side partial states of bounded size."""
    o = table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority").agg(
        F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice)").alias("p50"),
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("p50_approx"),
    )
    within = (
        F.abs(F.col("p50_approx") - F.col("p50")) / F.col("p50") <= 0.01
    )
    return agg.select(
        "o_orderpriority",
        F.round("p50", 2).alias("p50_exact"),
        within.alias("approx_within_1pct"),
    )


@register(
    "shipping_priority",
    oracle="""
SELECT o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) * CAST(round((1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o.o_orderkey ASC
LIMIT 10
""",
    tags=("join", "topk", "tpch-q3"),
)
def shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: top-10 highest-revenue orders placed before a
    date but (partially) shipped after it, for one market segment.
    Both date predicates and the segment filter push into the scans
    (PushedFilters); customer is broadcast; the only shuffle is the
    per-order aggregate, and the final ordering compiles to
    TakeOrderedAndProject — no global sort of the aggregate output."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            sum_revenue("revenue")
        )
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "returned_item_ranking",
    oracle="""
SELECT c.c_custkey, c.c_name,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) * CAST(round((1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-07-01'
GROUP BY c.c_custkey, c.c_name
ORDER BY revenue DESC, c.c_custkey ASC
LIMIT 20
""",
    tags=("join", "topk", "tpch-q10"),
)
def returned_item_ranking(spark, sf_dir):
    """TPC-H Q10 shape: customers ranked by revenue lost to returned
    items in a six-month window — the 'who is returning things'
    report. returnflag + date predicates push down; the
    fact-fact join (lineitem x orders) shuffles on orderkey once,
    then re-keys to the customer grain; top-20 is
    TakeOrderedAndProject with a deterministic tiebreak."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            sum_revenue("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "nation_market_share",
    oracle="""
WITH rev AS (
    SELECT CAST(strftime(o.o_orderdate, '%Y') AS INT) AS o_year,
           CAST(round(l.l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS rev_e4,
           n.n_name AS supp_nation
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
)
SELECT o_year,
       round(sum(CASE WHEN supp_nation = 'NATION_2' THEN rev_e4 ELSE 0 END)
             / CAST(sum(rev_e4) AS DOUBLE), 6) AS mkt_share,
       ((sum(rev_e4) + 50) // 100) / 100.0 AS region_revenue
FROM rev GROUP BY o_year
""",
    tags=("join", "share", "tpch-q8"),
)
def nation_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one nation's share of its region's supplier
    revenue per order year. Revenue is held as an exact integer
    (price-cents x integer discount-percent, the house e4 pattern)
    through both aggregates — the share is a ratio of two sums, and
    float summation order would drift between engines at the 6th
    decimal; integer sums cannot. One pass: conditional sum over the
    same grouped relation, no self-join. All four dimension joins
    broadcast; the region filter prunes before any shuffle."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            (
                F.round(F.col("l_extendedprice") * 100).cast("bigint")
                * (100 - F.round(F.col("l_discount") * 100).cast("bigint"))
            ).alias("rev_e4"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    return rev.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_2", F.col("rev_e4")).otherwise(0))
            / F.sum("rev_e4").cast("double"),
            6,
        ).alias("mkt_share"),
        # Integer half-up to cents BEFORE the one float division — a
        # round() on sum/10000.0 can land on an exact ...5 tie, where
        # Spark and DuckDB round differently (registry gotcha).
        (F.expr("(sum(rev_e4) + 50) div 100") / 100.0).alias("region_revenue"),
    )


@register(
    "discounted_brand_revenue",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) * CAST(round((1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_quantity <= 30
  AND p.p_size <= 15
  AND ((p.p_brand = 'Brand#1' AND p.p_size <= 5  AND l.l_quantity <= 11)
    OR (p.p_brand = 'Brand#2' AND p.p_size <= 10 AND l.l_quantity BETWEEN 10 AND 20)
    OR (p.p_brand = 'Brand#3' AND p.p_size <= 15 AND l.l_quantity BETWEEN 20 AND 30))
""",
    tags=("join", "disjunction", "tpch-q19"),
)
def discounted_brand_revenue(spark, sf_dir):
    """TPC-H Q19 shape: an OR of (brand, size, quantity) conjunct
    groups spanning BOTH join sides. The classic optimization is spelled
    out rather than hoped for: the WEAKEST per-side bounds implied by
    the disjunction (l_quantity <= 30, p_size <= 15) are written as
    standalone conjuncts, so each reaches its own scan as a pushed
    filter BEFORE the join, while the full OR runs as the residual
    post-join predicate. Catalyst cannot split an OR across sides on
    its own — without the redundant bounds, every lineitem row would
    reach the join. part stays broadcast."""
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") <= 30)
    p = table(spark, sf_dir, "part").filter(F.col("p_size") <= 15)
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    disj = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 5) & (F.col("l_quantity") <= 11))
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size") <= 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size") <= 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(disj).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        sum_revenue("revenue"),
    )


@register(
    "lineitem_numeric_profile",
    oracle="""
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       round(avg(l_quantity), 4) AS mean_qty,
       round(stddev_samp(l_quantity), 4) AS sd_qty,
       round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
       round(covar_samp(l_quantity, l_discount), 6) AS cov_qty_disc
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("profile", "statistics", "agg"),
)
def lineitem_numeric_profile(spark, sf_dir):
    """Column-profiler aggregates — the data-quality/EDA pass over a
    fact table: per return flag, spread (stddev_samp) and bivariate
    structure (Pearson corr, sample covariance). All five moments are
    single-pass partial aggregates (sum, sum-of-squares, cross-sums
    merge associatively), so the shuffle carries a handful of doubles
    per group — the same plan profiles 100 TB. Both engines compute
    textbook two-pass-free formulas; 4-6dp rounding absorbs summation-
    order drift."""
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.avg("l_quantity"), 4).alias("mean_qty"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("cov_qty_disc"),
    )


@register(
    "daily_anomaly_zscore",
    oracle="""
WITH ev AS (
    SELECT event_type, CAST(ts::TIMESTAMP AS DATE) AS day FROM events
),
daily AS (
    SELECT event_type, day, CAST(count(*) AS BIGINT) AS n_events
    FROM ev GROUP BY event_type, day
),
scored AS (
    SELECT event_type, day, n_events,
           count(*) OVER w AS n_hist,
           avg(n_events) OVER w AS mu,
           stddev_samp(n_events) OVER w AS sd
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT event_type,
       strftime(day, '%Y-%m-%d') AS day,
       n_events,
       round((n_events - mu) / sd, 4) AS zscore
FROM scored
WHERE n_hist = 7 AND sd > 0 AND abs(round((n_events - mu) / sd, 4)) >= 2
""",
    tags=("timeseries", "anomaly", "window"),
)
def daily_anomaly_zscore(spark, sf_dir):
    """Monitoring-surface anomaly detection: days whose event volume
    sits >= 2 trailing-window standard deviations from the prior
    7 days' mean, per event type. Composition of the engine's window
    machinery: daily partial-agg, then mean/stddev over a bounded
    trailing frame (PARTITION BY event_type — parallel windows, no
    single-reducer sort), z-score rounded before thresholding so both
    engines flag identical days. The production alerting query shape:
    at 100 TB the daily rollup shrinks the window input to
    days x types rows regardless of event volume."""
    e = events_with_ts(spark, sf_dir)
    daily = (
        e.select("event_type", F.to_date("ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    )
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-7, -1)
    scored = daily.select(
        "event_type",
        "day",
        "n_events",
        F.count(F.lit(1)).over(w).alias("n_hist"),
        F.avg("n_events").over(w).alias("mu"),
        F.stddev_samp("n_events").over(w).alias("sd"),
    )
    z = F.round((F.col("n_events") - F.col("mu")) / F.col("sd"), 4)
    return (
        scored.filter((F.col("n_hist") == 7) & (F.col("sd") > 0))
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_events",
            z.alias("zscore"),
        )
        .filter(F.abs(F.col("zscore")) >= 2)
    )


@register(
    "late_shipment_priority",
    oracle="""
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o.o_orderpriority
""",
    tags=("semi", "exists", "tpch-q4"),
)
def late_shipment_priority(spark, sf_dir):
    """TPC-H Q4 shape: orders (in a window) having AT LEAST ONE line
    shipped >90 days after ordering, counted per priority — correlated
    EXISTS rendered as a left-semi join whose date-arithmetic predicate
    rides the join condition. The semi join short-circuits per order
    (no fan-out, no dedup needed) and the orderdate window pushes into
    the orders scan."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    semi = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (l.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )


@register(
    "idle_rich_customers",
    oracle="""
WITH avg_bal AS (
    SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0
)
SELECT n.n_name,
       CAST(count(*) AS BIGINT) AS n_custs,
       CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_bal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
CROSS JOIN avg_bal
WHERE c.c_acctbal > avg_bal.a
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2001-01-01')
GROUP BY n.n_name
""",
    tags=("anti", "scalar-subquery", "tpch-q22"),
)
def idle_rich_customers(spark, sf_dir):
    """TPC-H Q22 shape: customers with above-average balance and no
    RECENT orders (none since 2001), rolled up per nation — the
    anti-join + scalar-subquery combination (who has money but stopped
    buying). The global average is a single-row aggregate crossJoined
    (broadcast scalar), the no-recent-orders test a left-anti join on
    custkey with the date filter PUSHED INTO the anti side's scan,
    nation broadcast."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2001-01-01")
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("a"))
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("a"))
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return (
        idle.join(F.broadcast(n), idle.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_custs"),
            sum_money("c_acctbal", "total_bal"),
        )
    )


@register(
    "local_supplier_volume",
    oracle="""
SELECT n.n_name,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) * CAST(round((1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
               AND s.s_nationkey = c.c_nationkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN region r   ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n.n_name
""",
    tags=("join", "tpch-q5"),
)
def local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: revenue where the supplier and the customer live
    in the SAME nation, per nation of one region, one order year. Five
    joins, one shuffle: region/nation/supplier/customer are all
    broadcast (the nationkey-equality rides the supplier join
    condition), so the lineitem fact flows through BroadcastHashJoins
    straight into the per-nation partial aggregate. The orderdate
    window pushes into the orders scan, the region filter prunes the
    broadcast side before it ships."""
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    l = table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .groupBy("n_name")
        .agg(
            sum_revenue("revenue")
        )
    )


@register(
    "top_supplier_revenue",
    oracle="""
WITH rev AS (
    SELECT l_suppkey AS supplier_no,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT) / 10000.0 AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1997-04-01'
    GROUP BY l_suppkey
),
m AS (SELECT max(total_revenue) AS mx FROM rev)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
CROSS JOIN m WHERE r.total_revenue = m.mx
""",
    tags=("join", "scalar-subquery", "tpch-q15"),
)
def top_supplier_revenue(spark, sf_dir):
    """TPC-H Q15 shape: the supplier(s) with maximum revenue in one
    quarter. The reference formulation is a view consumed twice (once
    to aggregate, once for its max); here the per-supplier aggregate is
    computed ONCE and its single-row max is broadcast back as a filter
    (a cross join with a 1-row aggregate — NLJ by construction, O(rows)
    not O(rows^2)). Ties on the max are all returned — deterministic
    without an arbitrary row_number pick."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        sum_revenue("total_revenue")
    )
    m = rev.agg(F.max("total_revenue").alias("mx"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(m), F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "small_qty_order_revenue",
    oracle="""
WITH avg_qty AS (
    SELECT l_partkey, avg(l_quantity) AS aq
    FROM lineitem GROUP BY l_partkey
)
SELECT CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 700.0 AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN avg_qty a ON a.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND l.l_quantity < 0.2 * a.aq
""",
    tags=("join", "scalar-subquery", "tpch-q17"),
)
def small_qty_order_revenue(spark, sf_dir):
    """TPC-H Q17 shape: revenue lost by small-quantity orders — lines
    whose quantity is below 20% of that part's average quantity, for one
    brand. The correlated per-part average is a separate keyed aggregate
    joined back on partkey (Catalyst's own decorrelation shape); the
    brand filter pushes into the part scan and prunes the probe side
    early. One lineitem shuffle for the per-part average, broadcast for
    part — at 100 TB the average table is |parts|, not |lineitem|."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1").select(
        "p_partkey"
    )
    avg_qty = l.groupBy(F.col("l_partkey").alias("ak")).agg(
        F.avg("l_quantity").alias("aq")
    )
    j = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(avg_qty, F.col("l_partkey") == F.col("ak"))
        .filter(F.col("l_quantity") < 0.2 * F.col("aq"))
    )
    return j.agg(
        (F.sum(_cents("l_extendedprice")) / F.lit(700.0)).alias("avg_yearly")
    )


@register(
    "orders_upsert_merge",
    oracle="""
WITH ch AS (
    SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
           o_totalprice + 100 AS o_totalprice, o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 10 = 0
    UNION ALL
    SELECT o_orderkey + 10000000, o_custkey, 'N',
           o_totalprice, o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 97 = 0
),
m AS (
    SELECT coalesce(ch.o_orderkey, o.o_orderkey) AS k,
           coalesce(ch.o_orderstatus, o.o_orderstatus) AS status,
           coalesce(ch.o_totalprice, o.o_totalprice) AS price,
           CASE WHEN ch.o_orderkey IS NOT NULL AND o.o_orderkey IS NOT NULL
                THEN 'update'
                WHEN o.o_orderkey IS NULL THEN 'insert'
                ELSE 'keep' END AS action
    FROM orders o FULL OUTER JOIN ch ON o.o_orderkey = ch.o_orderkey
)
SELECT action,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(round(price * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_price
FROM m GROUP BY action
""",
    tags=("merge", "upsert", "join"),
)
def orders_upsert_merge(spark, sf_dir):
    """Delta-style MERGE audit: a deterministic changes batch (every
    10th order re-statused 'U' with +100 price; every 97th cloned to a
    new key as an insert) upserted into orders via
    ``operators.merge.merge_upsert``, summarized per merge action. The
    ORACLE expresses the same merge as one full-outer join — the
    semantics twin; the ENGINE path is the scale shape (base LEFT JOIN
    broadcast(changes) + key-only anti join: shuffled bytes are
    O(|changes| + |base keys|), never a full-width base shuffle)."""
    from ..operators.merge import merge_upsert

    o = table(spark, sf_dir, "orders")
    updates = o.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") + 100).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    inserts = o.filter(F.col("o_orderkey") % 97 == 0).select(
        (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )
    changes = updates.unionByName(inserts)
    merged = merge_upsert(o.select(*changes.columns), changes, "o_orderkey")
    return merged.groupBy(F.col("_merge_action").alias("action")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        sum_money("o_totalprice", "total_price"),
    )


@register(
    "customer_scd2_batch",
    oracle="""
WITH hist AS (
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
           '2020-01-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to
    FROM customer
),
ch AS (
    SELECT c_custkey, c_name, c_nationkey, c_acctbal + 500 AS c_acctbal, c_mktsegment
    FROM customer WHERE c_custkey % 7 = 0
),
closed AS (
    SELECT h.c_custkey, h.c_acctbal,
           h.valid_from,
           CASE WHEN h.valid_to IS NULL AND ch.c_custkey IS NOT NULL
                THEN '2025-06-01' ELSE h.valid_to END AS valid_to
    FROM hist h LEFT JOIN ch ON h.c_custkey = ch.c_custkey
),
merged AS (
    SELECT c_custkey, c_acctbal, valid_from, valid_to FROM closed
    UNION ALL
    SELECT c_custkey, c_acctbal, '2025-06-01', CAST(NULL AS VARCHAR) FROM ch
)
SELECT CASE WHEN valid_to IS NULL THEN 'current' ELSE 'closed' END AS state,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_acctbal
FROM merged GROUP BY 1
""",
    tags=("scd2", "merge", "join"),
)
def customer_scd2_batch(spark, sf_dir):
    """SCD Type-2 batch apply over the customer dimension: every 7th
    customer gets a +500 balance revision effective 2025-06-01; the
    operator (``operators.scd.scd2_apply``) closes their current rows
    and opens revised ones, summarized by current/closed state. Scale
    shape: the changes batch broadcasts; the history table is rewritten
    in place by a conditional column expression — shuffled bytes are
    O(|changes|), never O(|history|). The oracle replays the identical
    close/open logic in SQL."""
    from ..operators.scd import scd2_apply

    c = table(spark, sf_dir, "customer")
    hist = c.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
        F.lit("2020-01-01").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
    )
    changes = c.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        (F.col("c_acctbal") + 500).alias("c_acctbal"),
        "c_mktsegment",
    )
    merged = scd2_apply(hist, changes, "c_custkey", "2025-06-01")
    return merged.groupBy(
        F.when(F.col("valid_to").isNull(), "current").otherwise("closed").alias("state")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        sum_money("c_acctbal", "total_acctbal"),
    )


@register(
    "cheapest_supplier_per_part",
    oracle="""
WITH cost AS (
    SELECT l_partkey, l_suppkey,
           min(CAST(round(l_extendedprice * 100) AS BIGINT)
               * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS min_cost_i
    FROM lineitem GROUP BY l_partkey, l_suppkey
),
best AS (
    SELECT l_partkey, l_suppkey, min_cost_i,
           row_number() OVER (PARTITION BY l_partkey
                              ORDER BY min_cost_i ASC, l_suppkey ASC) AS rn
    FROM cost
)
SELECT p.p_partkey, p.p_name, s.s_name, b.min_cost_i / 10000.0 AS min_cost
FROM best b
JOIN part p ON p.p_partkey = b.l_partkey
JOIN supplier s ON s.s_suppkey = b.l_suppkey
WHERE b.rn = 1 AND p.p_size <= 3
""",
    tags=("join", "window", "argmin", "tpch-q2"),
)
def cheapest_supplier_per_part(spark, sf_dir):
    """TPC-H Q2 shape: the cheapest supplier for each (small) part —
    the argmin-per-group pattern. Q2's correlated MIN subquery over
    partsupp is rendered as a keyed (part, supplier) aggregate followed
    by a row_number argmin, which is how Catalyst decorrelates it
    anyway; dimension lookups (part, supplier) broadcast.

    Determinism: price and discount are both clean 2dp decimals, so the
    cost is computed in integer TEN-THOUSANDTHS (cents x discount-pct —
    each factor rounds from a value within 1e-9 of an integer, never at
    .5), the argmin ranks on that BIGINT with a supplier tiebreak, and
    the output divides the integer by 10000.0 (identical IEEE division
    on both engines). round(product, 2) was measurably NOT portable:
    a half-cent cost (1675.785) rounded .78 on Spark and .79 on DuckDB
    at sf0.1. One lineitem shuffle on the composite key; the size
    filter prunes the part probe side before the join."""
    l = table(spark, sf_dir, "lineitem")
    cost_i = F.round(F.col("l_extendedprice") * 100).cast("bigint") * F.round(
        (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    cost = l.groupBy("l_partkey", "l_suppkey").agg(F.min(cost_i).alias("min_cost_i"))
    w = Window.partitionBy("l_partkey").orderBy(
        F.asc("min_cost_i"), F.asc("l_suppkey")
    )
    best = cost.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_size") <= 3)
        .select("p_partkey", "p_name")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        best.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            (F.col("min_cost_i") / 10000.0).alias("min_cost"),
        )
    )


@register(
    "nation_value_concentration",
    oracle="""
WITH val AS (
    SELECT s.s_nationkey,
           sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS cents
    FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
    GROUP BY s.s_nationkey
),
tot AS (SELECT sum(cents) AS t FROM val)
SELECT n.n_name, round(val.cents / 100.0, 2) AS value
FROM val
JOIN nation n ON n.n_nationkey = val.s_nationkey
CROSS JOIN tot
WHERE val.cents * 20 > tot.t
""",
    tags=("join", "scalar-subquery", "having", "tpch-q11"),
)
def nation_value_concentration(spark, sf_dir):
    """TPC-H Q11 shape: nations whose supplied value exceeds a fraction
    (5%) of the GLOBAL total — a keyed aggregate HAVING-filtered against
    a scalar subquery over itself. The per-nation aggregate is computed
    once; its single-row total is broadcast back as a cross-join filter
    (same shape as top_supplier_revenue). Determinism: values are
    summed as integer CENTS (the product is cent-rounded per row, which
    is engine-identical; integer sums are order-independent), and the
    5% threshold compares cents*20 > total — pure integer arithmetic,
    so no float-sum ordering difference can flip a borderline nation."""
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "bigint"
    )
    val = (
        l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_nationkey")
        .agg(F.sum(cents).alias("cents"))
    )
    tot = val.agg(F.sum("cents").alias("t"))
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("cents") * 20 > F.col("t"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name", F.round(F.col("cents") / 100.0, 2).alias("value"))
    )


@register(
    "supplier_diversity_by_brand",
    oracle="""
WITH eligible AS (
    SELECT DISTINCT l.l_partkey, l.l_suppkey
    FROM lineitem l
    WHERE l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
)
SELECT p.p_brand,
       CAST(count(DISTINCT e.l_suppkey) AS BIGINT) AS supplier_cnt,
       CAST(count(DISTINCT e.l_partkey) AS BIGINT) AS part_cnt
FROM eligible e JOIN part p ON p.p_partkey = e.l_partkey
WHERE p.p_type <> 'PROMO' AND p.p_size <= 25
GROUP BY p.p_brand
""",
    tags=("join", "anti", "count-distinct", "tpch-q16"),
)
def supplier_diversity_by_brand(spark, sf_dir):
    """TPC-H Q16 shape: how many distinct suppliers (and parts) serve
    each brand, excluding a supplier blacklist — NOT IN rendered as a
    broadcast anti join (s_suppkey is non-null, so the semantics are
    identical and the nullable-NOT-IN trap never arises), dimension
    filters pushed into the part scan, and a multi-distinct aggregate
    (Spark plans it with one Expand — both distincts share a single
    shuffle). The DISTINCT (part, supplier) projection dedups lineitem
    BEFORE the brand join, so the join and Expand see |partsupp|-sized
    input, not |lineitem|-sized."""
    bad = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    l = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    eligible = l.join(
        F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
    ).distinct()
    p = (
        table(spark, sf_dir, "part")
        .filter((F.col("p_type") != "PROMO") & (F.col("p_size") <= 25))
        .select("p_partkey", "p_brand")
    )
    return (
        eligible.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"),
            F.countDistinct("l_partkey").cast("bigint").alias("part_cnt"),
        )
    )


@register(
    "debounced_event_counts",
    oracle="""
WITH RECURSIVE ordered AS (
    SELECT user_id, ts, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events
),
kept(user_id, ts, rn) AS (
    SELECT user_id, ts, rn FROM ordered WHERE rn = 1
    UNION ALL
    SELECT o.user_id, o.ts, o.rn
    FROM kept k JOIN ordered o
      ON o.user_id = k.user_id
     AND o.rn = (SELECT min(o2.rn) FROM ordered o2
                 WHERE o2.user_id = k.user_id AND o2.ts > k.ts + INTERVAL 2 HOUR)
),
counts AS (SELECT user_id, count(*) AS n_kept FROM kept GROUP BY user_id),
totals AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id)
SELECT t.user_id, CAST(t.n_events AS BIGINT) AS n_events, CAST(c.n_kept AS BIGINT) AS n_kept
FROM totals t JOIN counts c ON c.user_id = t.user_id
""",
    tags=("dedup", "debounce", "pandas-udf", "streaming-parity", "iterative"),
)
def debounced_event_counts(spark, sf_dir):
    """Chained 2-hour debounce per user — the batch rendering of
    streaming ``dropDuplicatesWithinWatermark`` state semantics (keep a
    row only when strictly more than 2h past the last KEPT row of its
    key; the clock restarts on kept rows only). Not window-expressible:
    survival of row N depends on which earlier rows survived, so the
    operator is an ordered per-key scan (``operators.debounce``,
    applyInPandas — per-group state is ONE timestamp, the only shuffle
    is the key exchange, exactly the streaming state store's
    partitioning). The oracle is a recursive CTE hopping from each kept
    row to the next row beyond the threshold — an independent rendering
    of the same chain."""
    from ..operators.debounce import debounce
    from ..sources.tables import events_with_ts

    e = events_with_ts(spark, sf_dir).select("event_id", "user_id", "ts")
    kept = debounce(
        e, key_cols=["user_id"], ts_col="ts", threshold_seconds=7200.0,
        tiebreak_col="event_id",
    )
    totals = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    counts = kept.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept")
    )
    return totals.join(counts, "user_id").select("user_id", "n_events", "n_kept")


@register(
    "nation_year_profit",
    oracle="""
WITH li AS (
    SELECT l_orderkey, l_suppkey, l_partkey,
           CAST(round(l_extendedprice * 100) AS BIGINT)
             * CAST(round((1 - l_discount) * 100) AS BIGINT) AS revenue_tenk,
           CAST(round(l_quantity) AS BIGINT) AS qty
    FROM lineitem
),
cost AS (
    SELECT p_partkey,
           (CAST(round(p_retailprice * 100) AS BIGINT) * 6) // 10 AS supplycost_cents
    FROM part
),
profit AS (
    SELECT s.s_nationkey, year(o.o_orderdate) AS o_year,
           li.revenue_tenk - cost.supplycost_cents * li.qty * 100 AS profit_tenk
    FROM li
    JOIN orders o ON o.o_orderkey = li.l_orderkey
    JOIN supplier s ON s.s_suppkey = li.l_suppkey
    JOIN cost ON cost.p_partkey = li.l_partkey
)
SELECT n.n_name AS nation, CAST(o_year AS INTEGER) AS o_year,
       sum(profit_tenk) / 10000.0 AS profit
FROM profit JOIN nation n ON n.n_nationkey = profit.s_nationkey
GROUP BY n.n_name, o_year
""",
    tags=("join", "fact-fact", "agg", "tpch-q9"),
)
def nation_year_profit(spark, sf_dir):
    """TPC-H Q9 shape: supplier-nation profit by order year — the query
    whose plan MUST route one fact-fact join (lineitem x orders for the
    order date) plus three dimension lookups. The dimensions (supplier,
    part-cost, nation) broadcast; the fact-fact join shuffles on
    orderkey and is exactly the join the bucketed handoff
    (tests/test_scale_infra.py) removes at 100 TB. Supply cost is the
    deterministic stand-in 60% of retail price (the dataset carries no
    partsupp table). Determinism: revenue in integer ten-thousandths
    (cents x discount-pct), cost in cents x qty x 100 — integer sums
    are order-independent, and the output divides by 10000.0 (identical
    IEEE division on both engines), never rounds."""
    l = table(spark, sf_dir, "lineitem")
    li = l.select(
        "l_orderkey",
        "l_suppkey",
        "l_partkey",
        (
            F.round(F.col("l_extendedprice") * 100).cast("bigint")
            * F.round((1 - F.col("l_discount")) * 100).cast("bigint")
        ).alias("revenue_tenk"),
        F.round(F.col("l_quantity")).cast("bigint").alias("qty"),
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cost = table(spark, sf_dir, "part").select(
        "p_partkey",
        F.expr("(cast(round(p_retailprice * 100) as bigint) * 6) div 10").alias(
            "supplycost_cents"
        ),
    )
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cost), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.col("o_year").cast("int").alias("o_year"),
            (
                F.col("revenue_tenk")
                - F.col("supplycost_cents") * F.col("qty") * 100
            ).alias("profit_tenk"),
        )
    )
    return profit.groupBy("nation", "o_year").agg(
        (F.sum("profit_tenk") / 10000.0).alias("profit")
    )


@register(
    "skew_split_event_spend",
    oracle="""
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_value,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_spend
FROM events e JOIN orders o ON e.user_id = o.o_custkey
GROUP BY e.event_type
""",
    tags=("join", "skew", "salted"),
)
def skew_split_event_spend(spark, sf_dir):
    """Fact-fact equi-join with an explicit hot-key skew split
    (operators/skew.py `skew_split_join`) — the manual rendering of
    AQE's skew-join handling for the case AQE can't see in advance.
    events x orders on user_id = o_custkey is many-to-many: a user
    holding x% of events joins every one of their orders, so a hot user
    multiplies; `hot_keys` routes users holding >= 1% of events through
    the salted path (left side salted over 16 shards, right side
    replicated per salt), the long tail takes the plain hash join.
    Salting only reorders the join's row multiset, so the aggregate —
    and the oracle, a plain join — are identical to the unsalted plan;
    that invariance is exactly what makes the split safe to deploy.
    Money columns aggregate as exact integer cents."""
    from ..operators.skew import hot_keys, skew_split_join

    left = table(spark, sf_dir, "events").select("user_id", "event_type", "value")
    right = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_totalprice"
    )
    hot = hot_keys(left, "user_id", min_share=0.01)
    j = skew_split_join(left, right, "user_id", hot, n_salts=16)
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        (F.sum(_cents("value")).cast("bigint") / 100.0).alias("total_value"),
        (F.sum(_cents("o_totalprice")).cast("bigint") / 100.0).alias("total_spend"),
    )


def _pagerank_oracle(n_iters: int = 5, d: str = "0.85", leak: str = "0.15") -> str:
    """Unrolled weighted-PageRank oracle: one LEFT-JOIN step per
    iteration over the MATERIALIZED normalized edge relation."""
    sql = """
WITH edges AS MATERIALIZED (
    SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
           sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS w
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE s.s_nationkey <> c.c_nationkey
    GROUP BY src, dst
),
e AS MATERIALIZED (
    SELECT src, dst,
           CAST(w AS DOUBLE) / CAST(sum(w) OVER (PARTITION BY src) AS DOUBLE) AS p
    FROM edges
),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nation),
nodes AS (SELECT n_nationkey AS node, n_name FROM nation),
pr0 AS (SELECT node, 1.0 / nn.n AS pr FROM nodes CROSS JOIN nn)
"""
    prev = "pr0"
    for i in range(1, n_iters + 1):
        sql += f""",
pr{i} AS (
    SELECT nd.node,
           round({leak} / nn.n + {d} * coalesce(s.m, 0.0), 12) AS pr
    FROM nodes nd CROSS JOIN nn
    LEFT JOIN (SELECT e.dst, sum(e.p * {prev}.pr) AS m
               FROM e JOIN {prev} ON e.src = {prev}.node
               GROUP BY e.dst) s ON s.dst = nd.node
)"""
        prev = f"pr{i}"
    sql += f"""
SELECT nd.n_name, round({prev}.pr, 6) AS pagerank,
       CAST(row_number() OVER (ORDER BY round({prev}.pr, 6) DESC, nd.n_name ASC) AS INTEGER) AS rank
FROM nodes nd JOIN {prev} ON nd.node = {prev}.node
"""
    return sql


@register(
    "nation_trade_pagerank",
    oracle=_pagerank_oracle(),
    tags=("graph", "iterative", "join"),
)
def nation_trade_pagerank(spark, sf_dir):
    """Weighted PageRank over the nation trade graph — the engine's
    iterative-algorithm rendering (the same loop shape as distributed
    PageRank over a web graph). Edge (i -> j) = supplier-nation i sells
    to customer-nation j, weighted by exact integer revenue; weights
    normalize per source; 5 power iterations with damping 0.85.
    Nodes without out-edges leak their damped mass (the common
    simplification; the contract is in this docstring and the oracle
    replays it exactly).

    Plan/scale shape: the O(edges) relation is built ONCE (the Q7 join,
    fact-fact shuffle shared with every orderkey query), normalized with
    one keyed aggregate, and cached; each iteration is then one
    edges-x-pr hash join + one dst-keyed aggregate — pr is O(nodes),
    the iteration loop never re-reads the fact tables, and at web scale
    each step is the classic join-agg round with pr co-partitioned by
    node. Intermediate ranks round at 12dp so cross-engine float-sum
    ordering can never drift across iterations; the output rounds at
    6dp."""
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")

    w_int = F.sum(
        _cents("l_extendedprice")
        * (100 - F.round(F.col("l_discount") * 100).cast("bigint"))
    ).alias("w")
    edges = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst"))
        .agg(w_int)
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("outw"))
    # localCheckpoint, not cache(): the edge relation is re-probed once
    # per iteration, so it must be materialized, but a cache() entry
    # would pin executor storage until an explicit unpersist that a
    # lazy plan-builder can never safely issue (the consuming action
    # happens after we return).  Checkpoint blocks are released by the
    # ContextCleaner when the plan is garbage-collected, and the lineage
    # truncation is exactly what an iterative loop wants anyway.
    e = edges.join(outw, "src").select(
        "src",
        "dst",
        (F.col("w").cast("double") / F.col("outw").cast("double")).alias("p"),
    ).localCheckpoint(eager=False)  # lazy (r14): the final action's
    # first PR round materializes the edge blocks; rounds 2-5 read them

    nodes = n.select(F.col("n_nationkey").alias("node"), "n_name")
    n_nodes = nodes.count()
    pr = nodes.select("node", F.lit(1.0 / n_nodes).alias("pr"))
    for _ in range(5):
        contrib = (
            e.join(pr, e.src == pr.node)
            .groupBy("dst")
            .agg(F.sum(F.col("p") * F.col("pr")).alias("m"))
        )
        pr = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                F.round(
                    F.lit(0.15 / n_nodes) + 0.85 * F.coalesce(F.col("m"), F.lit(0.0)),
                    12,
                ).alias("pr"),
            )
        )
    w_rank = Window.orderBy(F.desc("pagerank"), F.asc("n_name"))
    return (
        nodes.join(pr, "node")
        .select("n_name", F.round("pr", 6).alias("pagerank"))
        .withColumn("rank", F.row_number().over(w_rank).cast("int"))
    )


_BLOOM_M, _BLOOM_K, _BLOOM_PROBES = 4096, 4, 4000

def _bloom_pos_sql(r: str, key: str) -> str:
    return (
        f"('0x' || substr(md5(CAST({r} AS VARCHAR) || '_' || CAST({key} AS VARCHAR)), 25, 8))"
        f"::BIGINT % {_BLOOM_M}"
    )


@register(
    "bloom_filter_contract",
    oracle=f"""
WITH bits AS MATERIALIZED (
    SELECT DISTINCT {_bloom_pos_sql('r', 'c_custkey')} AS b
    FROM customer, range({_BLOOM_K}) t(r)
),
probes AS (
    SELECT CAST(p AS BIGINT) AS probe_key, r, {_bloom_pos_sql('r', 'p')} AS b
    FROM range(1, {_BLOOM_PROBES} + 1) tp(p), range({_BLOOM_K}) t(r)
),
hit AS (
    SELECT p.probe_key,
           (count(*) = {_BLOOM_K}) AS bloom_hit
    FROM probes p JOIN bits USING (b)
    GROUP BY p.probe_key
    HAVING count(DISTINCT p.r) = {_BLOOM_K}
),
graded AS (
    SELECT tp.p AS probe_key,
           coalesce(h.bloom_hit, FALSE) AS bloom_hit,
           EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = tp.p) AS exact_present
    FROM range(1, {_BLOOM_PROBES} + 1) tp(p)
    LEFT JOIN hit h ON h.probe_key = tp.p
)
SELECT CAST(count(*) AS BIGINT) AS n_probes,
       CAST(sum(CASE WHEN exact_present THEN 1 ELSE 0 END) AS BIGINT) AS n_present,
       CAST(sum(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_hits,
       CAST(sum(CASE WHEN exact_present AND NOT bloom_hit THEN 1 ELSE 0 END) AS BIGINT)
           AS n_false_negatives,
       CAST(sum(CASE WHEN bloom_hit AND NOT exact_present THEN 1 ELSE 0 END) AS BIGINT)
           AS n_false_positives,
       round(sum(CASE WHEN bloom_hit AND NOT exact_present THEN 1 ELSE 0 END)
             / greatest(sum(CASE WHEN NOT exact_present THEN 1 ELSE 0 END), 1)::DOUBLE, 4)
           AS fp_rate
FROM graded
""",
    tags=("sketch", "bloom", "contract"),
)
def bloom_filter_contract(spark, sf_dir):
    """Bloom-filter membership contract — the sketch family's set-
    membership member (HLL++ counts, KLL quantiles, CMS frequencies,
    MinHash similarity all have contract queries; this closes the set).
    A {_BLOOM_M}-bit / {_BLOOM_K}-hash filter over customer keys is
    built as the DISTINCT set of md5-derived bit positions (engine-
    exact, <= {_BLOOM_M} rows however large the build side); a fixed
    {_BLOOM_PROBES}-key probe sweep is graded against exact membership:
    ZERO false negatives by construction (the query proves it, not
    asserts it) and the measured false-positive rate next to the
    theoretical (1-e^(-kn/m))^k.

    Scale: the bit set is a broadcast <= {_BLOOM_M}-row table no matter
    the corpus — the 100 TB use is exactly this shape (ship the bits to
    every scan as a pre-join prune, pay only FP-rate extra rows);
    the build aggregate partial-collapses to <= {_BLOOM_M} rows per
    task map-side."""
    cust = table(spark, sf_dir, "customer").select("c_custkey")

    def pos_of(r_col, key_col):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            r_col.cast("string"), F.lit("_"), key_col.cast("string")
                        )
                    ),
                    25,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % _BLOOM_M
        )

    rs = F.explode(F.sequence(F.lit(0), F.lit(_BLOOM_K - 1))).alias("r")
    bits = (
        cust.select("c_custkey", rs)
        .select(pos_of(F.col("r"), F.col("c_custkey")).alias("b"))
        .distinct()
    )
    probes = (
        spark.range(1, _BLOOM_PROBES + 1)
        .select(F.col("id").alias("probe_key"), rs)
        .select("probe_key", "r", pos_of(F.col("r"), F.col("probe_key")).alias("b"))
    )
    matched = (
        probes.join(F.broadcast(bits.withColumn("hit", F.lit(1))), "b", "left")
        .groupBy("probe_key")
        .agg((F.count("hit") == _BLOOM_K).alias("bloom_hit"))
    )
    exact = cust.select(F.col("c_custkey").alias("probe_key"), F.lit(True).alias("exact_present"))
    graded = (
        matched.join(exact, "probe_key", "left")
        .select(
            "bloom_hit",
            F.coalesce("exact_present", F.lit(False)).alias("exact_present"),
        )
    )
    b, x = F.col("bloom_hit"), F.col("exact_present")
    return graded.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probes"),
        F.sum(F.when(x, 1).otherwise(0)).cast("bigint").alias("n_present"),
        F.sum(F.when(b, 1).otherwise(0)).cast("bigint").alias("n_bloom_hits"),
        F.sum(F.when(x & ~b, 1).otherwise(0)).cast("bigint").alias("n_false_negatives"),
        F.sum(F.when(b & ~x, 1).otherwise(0)).cast("bigint").alias("n_false_positives"),
        F.round(
            F.sum(F.when(b & ~x, 1).otherwise(0))
            / F.greatest(F.sum(F.when(~x, 1).otherwise(0)), F.lit(1)).cast("double"),
            4,
        ).alias("fp_rate"),
    )


@register(
    "shipmode_priority_counts",
    oracle="""
SELECT l.l_returnflag || '-' || l.l_linestatus AS ship_mode,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1
""",
    tags=("join", "conditional-agg", "tpch-q12"),
)
def shipmode_priority_counts(spark, sf_dir):
    """TPC-H Q12 shape: per ship mode, how many lines belong to
    high-priority vs low-priority orders, restricted to one ship year —
    the conditional-aggregation-after-join pattern (sum(CASE WHEN ...)).
    The testdata lineitem carries no l_shipmode column, so the mode
    dimension is the (returnflag, linestatus) pair — same cardinality
    class (6 modes), same shape. Scale: the year predicate pushes into
    the lineitem parquet scan (~1/6 of rows survive before the join);
    both sides are fact tables so this is the one intentional
    fact-fact shuffle join on orderkey, and the aggregate collapses to
    6 groups map-side before the final 6-row exchange."""
    l = (
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .select(
            "l_orderkey",
            F.concat_ws("-", "l_returnflag", "l_linestatus").alias("ship_mode"),
        )
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("ship_mode")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("bigint").alias(
                "low_line_count"
            ),
        )
    )


@register(
    "large_volume_customers",
    oracle="""
WITH big AS (
    SELECT l_orderkey,
           CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem GROUP BY l_orderkey
    HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 300
)
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
       CAST(round(o.o_totalprice * 100) AS BIGINT) / 100.0 AS o_totalprice,
       b.sum_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
""",
    tags=("join", "having", "in-subquery", "tpch-q18"),
)
def large_volume_customers(spark, sf_dir):
    """TPC-H Q18 shape (large-volume customers): orders whose total
    line quantity exceeds 300, with the owning customer — the
    IN-subquery-against-grouped-HAVING pattern. Catalyst's decorrelated
    rendering: the lineitem aggregate+HAVING produces a tiny keyed
    relation (0.3% of orders), which then BROADCASTS into orders — the
    IN-list never round-trips through the driver — and the surviving
    handful of orders broadcast-joins customer. One lineitem shuffle
    (the per-order quantity agg, map-side partials first); zero
    full-width fact shuffles. Quantities are integral by data contract,
    so the sum is exact BIGINT on both engines; o_totalprice re-rounds
    through integer cents (house pattern)."""
    l = table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.round("l_quantity").cast("bigint")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            (_cents("o_totalprice") / 100.0).alias("o_totalprice"),
            F.col("sum_qty").cast("bigint").alias("sum_qty"),
        )
    )


@register(
    "excess_stock_suppliers",
    oracle="""
WITH sp AS (
    SELECT l.l_suppkey, l.l_partkey,
           CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS total_qty,
           CAST(sum(CASE WHEN l.l_shipdate >= TIMESTAMP '1997-01-01'
                          AND l.l_shipdate < TIMESTAMP '1998-01-01'
                    THEN CAST(round(l.l_quantity) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS qty_1997
    FROM lineitem l GROUP BY 1, 2
),
qual_parts AS (SELECT p_partkey FROM part WHERE p_name LIKE 'small%'),
qual_supp AS (
    SELECT DISTINCT sp.l_suppkey
    FROM sp JOIN qual_parts qp ON qp.p_partkey = sp.l_partkey
    WHERE sp.total_qty > 2 * sp.qty_1997
)
SELECT s.s_suppkey, s.s_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_3'
WHERE s.s_suppkey IN (SELECT l_suppkey FROM qual_supp)
""",
    tags=("semi", "join", "tpch-q20"),
)
def excess_stock_suppliers(spark, sf_dir):
    """TPC-H Q20 shape (suppliers with excess stock): the nested
    semi-join chain — part-name filter -> per-(supplier, part) shipped
    quantities -> qualifying suppliers -> supplier filtered to one
    nation. The testdata has no partsupp table, so availability is
    proxied by all-time shipped quantity and the Q20 predicate
    availqty > 0.5 * year_qty becomes total_qty > 2 * qty_1997 (most of
    the part's movement lies OUTSIDE the focal year). Scale: one
    lineitem shuffle for the (suppkey, partkey) aggregate with the
    year split computed as a conditional sum in the SAME pass (no
    second scan); the 8-row part-name filter broadcasts into the
    aggregate output; the distinct supplier set is tiny and
    broadcast-SEMI-joins supplier; nation (25 rows) broadcasts. No
    step materializes more than |supplier| rows past the first agg."""
    l = table(spark, sf_dir, "lineitem")
    in_1997 = (F.col("l_shipdate") >= "1997-01-01") & (
        F.col("l_shipdate") < "1998-01-01"
    )
    qty_i = F.round("l_quantity").cast("bigint")
    sp = l.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(qty_i).alias("total_qty"),
        F.sum(F.when(in_1997, qty_i).otherwise(F.lit(0))).alias("qty_1997"),
    )
    qual_parts = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    qual_supp = (
        sp.join(F.broadcast(qual_parts), sp.l_partkey == F.col("p_partkey"))
        .filter(F.col("total_qty") > 2 * F.col("qty_1997"))
        .select("l_suppkey")
        .distinct()
    )
    s = table(spark, sf_dir, "supplier")
    n = (
        table(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_3")
        .select("n_nationkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == F.col("n_nationkey"))
        .join(
            F.broadcast(qual_supp),
            s.s_suppkey == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name")
    )
