"""Streaming crawl-result statistics — windowed counts with WATERMARKED
late-data handling.

Reference: the stats_monitor's rolling windows are maintained by Redis
zset inserts as results arrive — an always-on consumer of the crawled
firehose (redis-monitor/plugins/stats_monitor.py; collectors in
utils/scutils/stats_collector.py:416-471).  Arrival order there is
whatever Kafka delivers: a late result still lands in its zset window
until the window's expiry prunes it.

Structured Streaming expresses the same contract declaratively
(SURVEY.md §2.7 "Windows"): event-time tumbling windows + a watermark
bound the state — a late event within the watermark still counts; one
arriving after the watermark passed its window is dropped, exactly the
zset-expiry-pruned case.  Append output mode emits a window once the
watermark closes it, so downstream (the metrics table / stats API)
sees each window exactly once.

In-sandbox the source is a JSON file feed; on a cluster the same plan
reads ``format("kafka")`` over the crawled firehose.  State lives in
the streaming checkpoint (bounded by the watermark) — this is the one
engine surface where Spark's own state store is the right tool, because
window state is small and watermark-bounded, unlike the frontier.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

CRAWL_EVENT_SCHEMA = StructType(
    [
        StructField("ts", TimestampType()),
        StructField("spiderid", StringType()),
        StructField("status_code", IntegerType()),
    ]
)


def stream_windowed_status_counts(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    store=None,
    on_batch=None,
    window: str = "60 seconds",
    watermark: str = "60 seconds",
):
    """Start the windowed rollup stream (availableNow trigger: drain
    pending input and stop — restart with the same checkpoint to
    continue, window state carries over in the streaming state store).

    APPEND mode emits a (win, spiderid, status_code, n) row only after
    the watermark guarantees no more in-window events will be accepted;
    the foreachBatch sink lands each closed window in the engine's
    ``metrics`` table (component='crawler-stream') — the same table the
    stats API aggregates — and/or hands the rows to ``on_batch``.  The
    per-batch collect is watermark-bounded (only windows that just
    closed), so it stays O(windows), never O(events)."""
    stream = spark.readStream.schema(CRAWL_EVENT_SCHEMA).json(events_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window).alias("win"), "spiderid", "status_code"
        )
        .agg(F.count("*").alias("n"))
        # epoch seconds computed INSIDE the query: collecting win.start
        # as a naive datetime and calling .timestamp() re-interprets it
        # in the PROCESS-local timezone, shifting the metric ts by the
        # tz offset whenever session and OS timezones differ (round-3
        # advice #5)
        .withColumn("ts_epoch", F.unix_micros(F.col("win.start")) / F.lit(1e6))
    )

    def handle(batch_df, batch_id: int) -> None:
        rows = batch_df.collect()
        if on_batch is not None:
            on_batch(rows)
        if store is not None and rows:
            from scrapy_cluster_spark.schemas import METRICS_SCHEMA

            store.append_rows(
                "metrics",
                [
                    {"round": None, "component": "crawler-stream",
                     "kind": f"status_{r['status_code']}", "plugin": None,
                     "spiderid": r["spiderid"], "status_code": r["status_code"],
                     "value": float(r["n"]),
                     "ts": r["ts_epoch"]}
                    for r in rows
                ],
                METRICS_SCHEMA,
                meta={"stream_batch": batch_id},
            )

    return (
        agg.writeStream.outputMode("append")
        .foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
