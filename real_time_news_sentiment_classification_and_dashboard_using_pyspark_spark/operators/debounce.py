"""Chained event debounce — the BATCH twin of streaming
``dropDuplicatesWithinWatermark`` state semantics.

A row is kept iff its event time is strictly more than ``threshold``
after the last KEPT row of the same key. This is *chained* suppression
(the clock restarts only on kept rows), which plain window functions
cannot express: whether row N survives depends on which earlier rows
survived — e.g. events at t=0, 1.5h, 3h with a 2h threshold keep
{0, 3h}, but a session-gap rendering (gap > 2h from the *previous
event*) would merge all three into one session and keep only {0}.

Rendering: ``applyInPandas`` per key — an ordered linear scan inside an
Arrow batch. Per-group state is one timestamp; per-group input is that
key's rows, so executor memory is bounded by the hottest key, and the
only shuffle is the groupBy exchange on the key (identical to what the
streaming operator's state store partitioning does). The streaming
rendering of the same contract is
``streaming.dedup_within_watermark``; the DuckDB oracle is a recursive
CTE hopping from each kept row to the next row beyond the threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def debounce(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    threshold_seconds: float,
    tiebreak_col: str,
) -> DataFrame:
    """Keep the first row per key, then every row strictly more than
    ``threshold_seconds`` after the previously KEPT row of that key.
    Rows are ordered by (ts, tiebreak) inside each key, so the result
    is deterministic under timestamp ties. Output schema = input
    schema."""
    import numpy as np
    import pandas as pd

    threshold_ns = int(threshold_seconds * 1_000_000_000)

    # pin the group exchange's width: the narrow (key, ts) rows are a
    # few MB at sf0.1, so AQE coalesces the applyInPandas shuffle to ONE
    # partition and every group funnels through a single Python worker
    # (measured 6-8s serial vs ~2s at 32-way). An explicit hash
    # repartition on the key satisfies the groupBy's required
    # distribution, so no second exchange is added — at real scale the
    # shuffle out-partitions the executor count and this is a no-op
    # width-wise.
    target = df.sparkSession.sparkContext.defaultParallelism
    df = df.repartition(target, *key_cols)

    def _scan(pdf: pd.DataFrame) -> pd.DataFrame:
        # integer-nanosecond scan: iterating pd.Timestamp objects costs
        # ~10x more per row (measured 5.3s -> 2.4s at sf0.1 over 1,500
        # groups); lexsort gives the (ts, tiebreak) order without a full
        # DataFrame sort
        order = np.lexsort(
            (pdf[tiebreak_col].to_numpy(), pdf[ts_col].to_numpy())
        )
        ts_ns = pdf[ts_col].to_numpy().astype("datetime64[ns]").astype(np.int64)[order]
        keep = []
        last = None
        for pos in range(ts_ns.size):
            t = ts_ns[pos]
            if last is None or t - last > threshold_ns:
                keep.append(pos)
                last = t
        return pdf.iloc[order[keep]]

    return df.groupBy(*key_cols).applyInPandas(_scan, df.schema)
