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
    import pandas as pd

    threshold = pd.Timedelta(seconds=threshold_seconds)

    def _scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, tiebreak_col], kind="mergesort")
        keep_idx = []
        last = None
        for pos, ts in enumerate(pdf[ts_col]):
            if last is None or (ts - last) > threshold:
                keep_idx.append(pos)
                last = ts
        return pdf.iloc[keep_idx]

    return df.groupBy(*key_cols).applyInPandas(_scan, df.schema)
