from .pipeline import (
    dedup_within_watermark,
    scored_stream,
    start_pipeline,
    windowed_counts,
)

__all__ = [
    "dedup_within_watermark",
    "scored_stream",
    "start_pipeline",
    "windowed_counts",
]
