"""Custom stateful streaming operator via applyInPandasWithState —
the arbitrary-state API the reference never touches (SURVEY §2.J:
'no stateful operators').

``running_sentiment_totals`` maintains per-key cumulative counts +
polarity sums across micro-batches: the streaming-native version of the
dashboard's recompute-everything TTL cache (J7, streamlit_app.py:76) —
instead of re-aggregating the whole corpus every 10 s, state is updated
incrementally with O(batch) work and O(keys) memory, checkpointed for
exactly-once recovery.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "sentiment string, total_count bigint, total_polarity double, avg_polarity double"
)
STATE_SCHEMA = "count bigint, polarity_sum double"


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (sentiment,) = key
    if state.exists:
        count, polarity_sum = state.get
    else:
        count, polarity_sum = 0, 0.0
    for pdf in pdfs:
        count += len(pdf)
        polarity_sum += float(pdf["polarity"].sum())
    state.update((count, polarity_sum))
    yield pd.DataFrame(
        {
            "sentiment": [sentiment],
            "total_count": [count],
            "total_polarity": [polarity_sum],
            "avg_polarity": [polarity_sum / count if count else 0.0],
        }
    )


def running_sentiment_totals(scored_stream: DataFrame) -> DataFrame:
    """Cumulative per-class totals, updated incrementally each
    micro-batch. Output mode must be ``update``. State: 2 numbers per
    sentiment class — bounded regardless of stream length."""
    return (
        scored_stream.select("sentiment", "polarity")
        .groupBy("sentiment")
        .applyInPandasWithState(
            _update_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
