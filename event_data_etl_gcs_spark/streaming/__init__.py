from .incremental import run_incremental_available_now, streaming_log_source
from .neardedup import (
    check_batch_against_index,
    run_streaming_ivf_ingest,
    run_streaming_knn_maintenance,
    run_streaming_near_dedup,
)
from .sessions import stateful_sessionize
from .windowed import stateful_running_max, windowed_event_counts

__all__ = [
    "run_incremental_available_now",
    "streaming_log_source",
    "run_streaming_near_dedup",
    "run_streaming_ivf_ingest",
    "run_streaming_knn_maintenance",
    "check_batch_against_index",
    "stateful_sessionize",
    "stateful_running_max",
    "windowed_event_counts",
]
