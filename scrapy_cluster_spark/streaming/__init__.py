"""Structured Streaming layer."""

from scrapy_cluster_spark.streaming.requests_stream import (  # noqa: F401
    stream_requests_to_frontier,
)
from scrapy_cluster_spark.streaming.stats_stream import (  # noqa: F401
    stream_windowed_status_counts,
)
