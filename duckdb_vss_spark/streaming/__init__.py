from duckdb_vss_spark.streaming.ops import (  # noqa: F401
    read_events_stream,
    session_window_stats,
    streaming_index_refresh,
    windowed_event_counts,
)
