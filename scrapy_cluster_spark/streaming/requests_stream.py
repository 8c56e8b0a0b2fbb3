"""Streaming request ingest — the kafka-monitor main loop as
Structured Streaming.

Reference: KafkaMonitor consumes ``demo.incoming`` continuously,
validates each JSON message, and routes it to a handler
(kafka-monitor/kafka_monitor.py:251-314).  The rebuild's equivalent is
``readStream`` over a request feed (file source in-sandbox; the same
code takes ``format("kafka")`` + ``from_json`` on a cluster) with a
``foreachBatch`` sink that runs the ingest operator and commits one
frontier snapshot per micro-batch — giving the at-least-once → exactly-
once upgrade noted in SURVEY.md §2.7 (snapshot commit per batch).

State stays in the SnapshotStore, NOT in Spark streaming state stores,
so a killed stream resumes from table snapshots like the batch path
(north_rule checkpoint clause); the streaming checkpoint only tracks
source offsets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from scrapy_cluster_spark.config import DEFAULT_CONFIG, EngineConfig
from scrapy_cluster_spark.plans.crawl import feed_requests
from scrapy_cluster_spark.schemas import REQUEST_SCHEMA
from scrapy_cluster_spark.store import SnapshotStore


def stream_requests_to_frontier(
    store: SnapshotStore,
    requests_dir: str,
    checkpoint_dir: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    available_now: bool = True,
):
    """Start the ingest stream.  ``available_now=True`` drains pending
    input and stops (test/batch-catchup mode); ``False`` runs
    continuously like the reference monitor."""
    spark = store.spark
    stream = spark.readStream.schema(REQUEST_SCHEMA).json(requests_dir)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        feed_requests(store, batch_df, cfg)

    writer = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
