"""Registry mapping query names to (spark_fn, oracle_sql) pairs.

``__spark_entry__.py`` re-exports this as the driver contract:
``queries()`` and ``oracle_sql()``. Each spark_fn takes
``(spark, sf_dir)`` and returns a DataFrame whose column names match the
oracle SQL's output aliases exactly (the driver sorts columns by name
before hashing values).

Conventions that keep the DuckDB comparison byte-stable:

- every double aggregate is ``round(x, N)`` on BOTH engines (float
  summation order differs between engines; rounding absorbs it);
- thresholds are compared on the rounded value;
- timestamps are emitted as formatted strings, never raw timestamps;
- any BIGINT ``sum`` is cast back to BIGINT in DuckDB (DuckDB widens
  integer sums to HUGEINT, Spark keeps LongType);
- top-K queries carry a deterministic total order (value, then key).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: SparkFn
    # str: static ANSI SQL.  Callable[[sf_dir], str | None]: oracle SQL
    # derived from per-corpus committed artifacts (e.g. the MLlib pin's
    # literal-VALUES table); returning None means "no pin yet for this
    # corpus — rows-only until the first run writes it".
    oracle: str | Callable[[str], str | None] | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | Callable[[str], str | None] | None = None,
    tags: tuple[str, ...] = (),
):
    def deco(fn: SparkFn) -> SparkFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or "")
        return fn

    return deco
