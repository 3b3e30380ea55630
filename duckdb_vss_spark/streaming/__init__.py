from duckdb_vss_spark.streaming.ops import (  # noqa: F401
    read_documents_stream,
    read_embeddings_stream,
    read_events_stream,
    read_staged_events_stream,
    session_window_stats,
    stream_interval_join,
    stream_static_enrich,
    streaming_dedup_against_store,
    streaming_dedup_first,
    streaming_index_refresh,
    streaming_matview,
    windowed_event_counts,
)
