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


# --- Spark 4 transformWithStateInPandas rendering of the same operator ---
# The modern arbitrary-state API (SPARK-49564): typed state handles
# (ValueState/ListState/MapState), timers, and RocksDB-backed storage.
# Same semantics as running_sentiment_totals above; kept side by side so
# both API generations are covered (applyInPandasWithState is the
# stable/legacy surface, transformWithState the forward path).

try:  # pragma: no cover - import surface depends on pyspark build
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningTotalsProcessor(StatefulProcessor):
        """Per-sentiment cumulative (count, polarity_sum) via a typed
        ValueState — O(keys) state, update-mode output each batch."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):  # noqa: N802
            count, polarity_sum = (
                tuple(self._state.get()) if self._state.exists() else (0, 0.0)
            )
            for pdf in rows:
                count += len(pdf)
                polarity_sum += float(pdf["polarity"].sum())
            self._state.update((count, polarity_sum))
            yield pd.DataFrame(
                {
                    "sentiment": [key[0]],
                    "total_count": [count],
                    "total_polarity": [polarity_sum],
                    "avg_polarity": [polarity_sum / count if count else 0.0],
                }
            )

        def close(self) -> None:
            pass

    def running_sentiment_totals_tws(scored_stream: DataFrame) -> DataFrame:
        """transformWithStateInPandas rendering — requires the RocksDB
        state store provider (set
        ``spark.sql.streaming.stateStore.providerClass`` to
        RocksDBStateStoreProvider before starting the query) AND a
        working ``google.protobuf`` (the TWS state protocol is
        protobuf-encoded; this container ships a broken protobuf, so
        the pytest for this operator skips there — the legacy-API twin
        above is the one exercised end-to-end)."""
        return (
            scored_stream.select("sentiment", "polarity")
            .groupBy("sentiment")
            .transformWithStateInPandas(
                RunningTotalsProcessor(),
                outputStructType=OUTPUT_SCHEMA,
                outputMode="Update",
                timeMode="None",
            )
        )

except ImportError:  # pragma: no cover
    RunningTotalsProcessor = None  # type: ignore[assignment]
    running_sentiment_totals_tws = None  # type: ignore[assignment]
