"""Structured Streaming layer."""

from scrapy_cluster_spark.streaming.requests_stream import (  # noqa: F401
    stream_requests_to_frontier,
)
from scrapy_cluster_spark.streaming.corpus_stream import (  # noqa: F401
    stream_dedup_ingest,
    stream_frequent_tokens,
    stream_source_health,
    stream_user_sessions,
)
from scrapy_cluster_spark.streaming.stats_stream import (  # noqa: F401
    stream_windowed_status_counts,
)
