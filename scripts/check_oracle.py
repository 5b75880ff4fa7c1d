"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
over the same parquet tables; compare row count, column names, and
order-insensitive values (floats to 1e-9 relative).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402
from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark import (  # noqa: E402
    get_spark,
)
from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.sources.tables import (  # noqa: E402
    TABLE_NAMES,
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    # bound the oracle's memory and give it a spill path: DuckDB's
    # default limit (~80% of RAM) plus a 24 GB sweep JVM OOM-killed the
    # r12 sf100 probe at 103 GB RSS — a capped oracle spills (or times
    # out into the rows-only contract) instead of taking the process
    # down. Overridable for small hosts via SPARK_GRAFT_DUCK_MEM.
    mem = os.environ.get("SPARK_GRAFT_DUCK_MEM", "48GB")
    try:
        con.execute(f"SET memory_limit='{mem}'")
        con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    except duckdb.Error:
        pass  # older duckdb without these pragmas: keep defaults
    for t in TABLE_NAMES:
        path = f"{sf_dir}/{t}.parquet"
        # partial fixture dirs (the sf100-subset probe generates only
        # documents+embeddings): skip missing tables — only queries
        # that touch them will fail, which is exactly the signal a
        # subset sweep wants
        if not os.path.exists(path):
            continue
        # driver testdata ships single parquet FILES; locally generated
        # scale-ups (scripts/gen_scale_testdata.py) are Spark parquet
        # DIRECTORIES — glob those for DuckDB
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def norm_cell(v):
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", round(v, 9))
    if isinstance(v, int):
        return ("i", v)
    return ("s", str(v))


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def approx_equal(a, b):
    if a == b:
        return True
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        if ra == rb:
            continue
        if len(ra) != len(rb):
            return False
        for ca, cb in zip(ra, rb):
            if ca == cb:
                continue
            if ca[0] == "f" and cb[0] == "f":
                x, y = ca[1], cb[1]
                if isinstance(x, float) and isinstance(y, float):
                    if math.isclose(x, y, rel_tol=1e-6, abs_tol=1e-6):
                        continue
            return False
    return True


# Sentinel problem prefix: the oracle did not finish within the given
# budget (DuckDB interrupted). Callers that sweep EXTRA scale factors
# treat it as a rows-only pass with a recorded reason — the
# hash-verified gate for such queries is the standard sf0.01/sf0.1
# legs, where every oracle completes.
ORACLE_TIMEOUT = "ORACLE_TIMEOUT"


def compare_one(
    spark, con, name: str, sf_dir: str, oracle_timeout_s: float | None = None
) -> tuple[str | None, int]:
    """Run one registry query on Spark and (if present) its DuckDB
    oracle; return (problem, n_rows) where problem=None means pass.
    Importable — tests/test_oracle_full.py parametrizes over this so
    ``pytest tests/`` certifies the FULL registry, not the driver's
    sampled window. ``oracle_timeout_s`` (optional) interrupts a DuckDB
    oracle that exceeds the budget and returns the ORACLE_TIMEOUT
    sentinel instead of failing — used by the large-scale sweep where a
    few oracles (interpreted per-row list arithmetic over quadratic
    candidate fan-out) are infeasible in DuckDB although the Spark side
    finishes in seconds."""
    import threading

    qs = entry_mod.queries()
    sdf = qs[name](spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    # Resolve oracles AFTER the Spark side ran: callable oracles read
    # per-corpus committed pins, and on a fresh corpus the first Spark
    # run is what writes them (train_on_documents).
    oracles = entry_mod.oracle_sql(sf_dir)
    if name not in oracles:
        if not scols:
            return ("rows-only query produced no columns", len(srows))
        return (None, len(srows))  # rows-only contract
    timer = None
    if oracle_timeout_s:
        timer = threading.Timer(oracle_timeout_s, con.interrupt)
        timer.start()
    try:
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
    except duckdb.InterruptException:
        return (f"{ORACLE_TIMEOUT}>{oracle_timeout_s:.0f}s", len(srows))
    finally:
        if timer is not None:
            timer.cancel()
    problems = []
    if len(srows) != len(drows):
        problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
    if sorted(scols) != sorted(dcols):
        problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
    if not problems:
        ns, nd = norm_rows(scols, srows), norm_rows(dcols, drows)
        if ns != nd:
            if approx_equal(ns, nd):
                problems.append("values differ only within float tolerance")
            else:
                diff = [(a, b) for a, b in zip(ns, nd) if a != b][:3]
                problems.append(f"VALUES differ, e.g. {diff}")
    return ("; ".join(problems) if problems else None, len(srows))


def main():
    import os

    args = [a for a in sys.argv[1:]]
    # --sf-dir is the explicit, unambiguous spelling; positional
    # directory sniffing stays as a convenience but a SECOND directory
    # arg is an error rather than silently dropped, and a query name
    # colliding with a cwd directory can always be disambiguated via
    # the flag (r7 advice)
    sf_dir = None
    if "--sf-dir" in args:
        i = args.index("--sf-dir")
        if i + 1 >= len(args):
            sys.exit("--sf-dir requires a path argument")
        sf_dir = args[i + 1]
        if not os.path.isdir(sf_dir):
            sys.exit(f"--sf-dir {sf_dir!r} is not a directory")
        args = args[:i] + args[i + 2 :]
        wanted = list(args)
    else:
        dirs = [a for a in args if os.path.isdir(a)]
        if len(dirs) > 1:
            sys.exit(
                f"ambiguous: multiple directory args {dirs} — pass the "
                "scale-factor dir via --sf-dir and query names bare"
            )
        sf_dir = dirs[0] if dirs else None
        wanted = [a for a in args if a not in dirs]
    sf_dir = sf_dir or "/root/testdata/sf0.01"

    spark = get_spark("oracle-check")
    con = duck_con(sf_dir)
    oracles = entry_mod.oracle_sql(sf_dir)

    names = wanted or list(entry_mod.queries())
    n_pass = n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            problem, n_rows = compare_one(spark, con, name, sf_dir)
        except Exception:
            print(f"FAIL  {name}: ERROR")
            traceback.print_exc()
            n_fail += 1
            continue
        spark_t = time.time() - t0
        if problem:
            print(f"FAIL  {name}: {problem} [{spark_t:.1f}s]")
            n_fail += 1
        elif name not in oracles:
            print(f"pass* {name}: rows={n_rows} (no oracle, rows-only) [{spark_t:.1f}s]")
            n_pass += 1
        else:
            print(f"pass  {name}: rows={n_rows} [{spark_t:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
