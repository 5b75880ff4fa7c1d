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
