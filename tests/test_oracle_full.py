"""Registry-wide correctness certification.

The driver's CORRECTNESS gate samples ~50 queries per round; this module
parametrizes the SAME Spark-vs-DuckDB compare (scripts/check_oracle.py)
over the FULL registry at sf0.01, so a green ``pytest tests/`` implies
every query the driver might sample is oracle-correct — no query can go
rounds unchecked again.

Deselect with ``-m "not oracle"`` for fast iteration on other modules.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans import (  # noqa: E402
    REGISTRY,
)

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")

pytestmark = [
    pytest.mark.oracle,
    pytest.mark.skipif(
        not os.path.isdir(SF_DIR), reason=f"test data {SF_DIR} not present"
    ),
]


@pytest.fixture(scope="module")
def duck(spark):  # depends on spark only to share session ordering
    from scripts.check_oracle import duck_con

    con = duck_con(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck):
    from scripts.check_oracle import compare_one

    problem, n_rows = compare_one(spark, duck, name, SF_DIR)
    assert problem is None, f"{name}: {problem}"
    assert n_rows >= 0


def test_cc_oracle_sentinel_poisons_unconverged_runs():
    """The clustering oracles' unrolled min-label propagation must be
    self-auditing: with too few rounds for the graph's diameter, the
    cc_unconverged sentinel row (cluster_id = -1) must appear — a
    non-converged oracle fails VISIBLY instead of producing a silently
    wrong component count. With enough rounds, no sentinel and the
    exact component structure."""
    import duckdb

    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.plans.dedup_queries import (
        _min_label_cc_ctes,
    )

    # path graph 0-1-2-...-9 plus an isolated pair (10, 11)
    edges = [(i, i + 1) for i in range(9)] + [(10, 11)]
    values = ", ".join(f"({a}, {b})" for a, b in edges)
    base = f"""
WITH pairs(vec_a, vec_b) AS (VALUES {values}),
edges AS MATERIALIZED (
    SELECT vec_a AS s, vec_b AS d FROM pairs
    UNION ALL
    SELECT vec_b AS s, vec_a AS d FROM pairs
),
{{cc}}
SELECT cluster_id, CAST(count(*) AS BIGINT) AS size
FROM comp GROUP BY cluster_id
UNION ALL
SELECT CAST(-1 AS BIGINT), n FROM cc_unconverged WHERE n > 0
ORDER BY cluster_id
"""
    con = duckdb.connect()
    # 1 round cannot converge a diameter-9 path: sentinel present
    rows = con.execute(base.format(cc=_min_label_cc_ctes(rounds=1))).fetchall()
    assert any(cid == -1 for cid, _ in rows)
    # default rounds: exact components, no sentinel
    rows = con.execute(base.format(cc=_min_label_cc_ctes())).fetchall()
    assert rows == [(0, 10), (10, 2)]
