from .corpus import (
    corpus_ingest_batch,
    read_streamed_corpus,
    run_streaming_corpus_ingest,
)
from .incremental import run_incremental_available_now, streaming_log_source
from .neardedup import (
    check_batch_against_index,
    read_knn_topk,
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
    "read_knn_topk",
    "check_batch_against_index",
    "corpus_ingest_batch",
    "run_streaming_corpus_ingest",
    "read_streamed_corpus",
    "stateful_sessionize",
    "stateful_running_max",
    "windowed_event_counts",
]
