from pyspark_deduplication_spark.streaming.ops import (  # noqa: F401
    read_events_stream,
    sessionize_batch,
    streaming_dedup,
    streaming_fused_ingest,
    streaming_span_ingest,
    streaming_reservoir_ingest,
    streaming_session_window,
    streaming_tumbling_counts,
)
