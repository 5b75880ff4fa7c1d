from .dedup_index import (
    compact_store,
    current_store_path,
    dedup_index_fanout,
    finalize_dedup_index,
    gc_generations,
    init_empty_shingle_store,
    merge_backlog,
    start_dedup_index_stream,
    wait_maintenance,
)
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
    "compact_store",
    "current_store_path",
    "dedup_index_fanout",
    "dedup_within_watermark",
    "finalize_dedup_index",
    "gc_generations",
    "init_empty_shingle_store",
    "merge_backlog",
    "scored_stream",
    "session_counts",
    "start_dedup_index_stream",
    "start_pipeline",
    "wait_maintenance",
    "windowed_counts",
]
