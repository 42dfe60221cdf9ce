from .pipelines import (
    docs_stream,
    events_stream,
    foreach_batch_upsert_run,
    kafka_sink,
    kafka_sink_options,
    kafka_stream,
    kafka_stream_options,
    run_to_memory,
    stateful_user_totals,
    stream_dedup_keys,
    streaming_corpus_dedup_run,
    tumbling_window_agg,
)

__all__ = [
    "docs_stream",
    "stateful_user_totals",
    "events_stream",
    "foreach_batch_upsert_run",
    "kafka_sink",
    "kafka_sink_options",
    "kafka_stream",
    "kafka_stream_options",
    "run_to_memory",
    "stream_dedup_keys",
    "streaming_corpus_dedup_run",
    "tumbling_window_agg",
]
