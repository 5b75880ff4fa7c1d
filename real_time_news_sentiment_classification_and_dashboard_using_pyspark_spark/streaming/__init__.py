from .pipeline import (
    batch_fanout,
    dedup_within_watermark,
    scored_stream,
    session_counts,
    start_pipeline,
    windowed_counts,
)

__all__ = [
    "batch_fanout",
    "dedup_within_watermark",
    "scored_stream",
    "session_counts",
    "start_pipeline",
    "windowed_counts",
]
