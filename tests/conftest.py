from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark import (  # noqa: E402
    get_spark,
)

SF0_001 = "/root/testdata/sf0.001"
SF0_01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    warehouse = str(tmp_path_factory.mktemp("warehouse"))
    s = get_spark(
        "pytest",
        cpus=8,
        shuffle_partitions=8,
        extra={"spark.sql.warehouse.dir": warehouse},
    )
    yield s
    s.stop()
