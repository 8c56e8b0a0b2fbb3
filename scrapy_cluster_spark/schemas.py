"""Explicit StructTypes for every engine table.

The reference is schema-on-convention (JSON dicts in Redis/Kafka; the
only declared schema is the ingest JSON Schema at
kafka-monitor/plugins/scraper_schema.json:1-98).  Here every table is
declared once.  Citations note which reference structure each table
replaces (SURVEY.md §1.1).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# Crawl request / frontier row — replaces the per-(spiderid,domain) Redis
# zsets (utils/scutils/redis_queue.py:121-128, distributed_scheduler.py:452-480).
# External fields per scraper_schema.json:1-98; scheduler-private meta
# fields curdepth/retry_times per distributed_scheduler.py:564-568.
# ---------------------------------------------------------------------------
REQUEST_FIELDS = [
    StructField("appid", StringType()),
    StructField("crawlid", StringType()),
    StructField("url", StringType()),
    StructField("spiderid", StringType()),
    StructField("priority", IntegerType()),
    StructField("maxdepth", IntegerType()),
    StructField("domain_max_pages", IntegerType()),
    StructField("allowed_domains", ArrayType(StringType())),
    StructField("allow_regex", ArrayType(StringType())),
    StructField("deny_regex", ArrayType(StringType())),
    StructField("deny_extensions", ArrayType(StringType())),
    StructField("expires", LongType()),
    StructField("useragent", StringType()),
    StructField("cookie", StringType()),
    StructField("attrs", MapType(StringType(), StringType())),
]

REQUEST_SCHEMA = StructType(REQUEST_FIELDS)

FRONTIER_SCHEMA = StructType(
    REQUEST_FIELDS
    + [
        # scheduler-private meta (distributed_scheduler.py:564-568)
        StructField("curdepth", IntegerType()),
        StructField("retry_times", IntegerType()),
        StructField("dont_filter", BooleanType()),
        # normalized provenance: 'feed' (API) vs 'spider' (discovered) —
        # the reference carries two serializations (SURVEY.md §1.3)
        StructField("source", StringType()),
        # derived, persisted at insert: registered domain + fingerprint
        StructField("domain", StringType()),
        StructField("fingerprint", StringType()),
        # physical partition key: hash-bucket of domain (scale layout)
        StructField("bucket", IntegerType()),
        # insertion round (lineage / FIFO-ish tiebreak provenance)
        StructField("inserted_round", LongType()),
    ]
)

# ---------------------------------------------------------------------------
# Input pages table — BASELINE.json input_hint (simulates the web).
# ---------------------------------------------------------------------------
PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)

# ---------------------------------------------------------------------------
# Crawl result — RawResponseItem, crawler/crawling/items.py:8-23 (+
# timestamp at pipelines.py:134-138; links array link_spider.py:65;
# multi-value headers redis_spider.py:36-61).
# ---------------------------------------------------------------------------
LINK_SCHEMA = StructType(
    [StructField("url", StringType()), StructField("text", StringType())]
)

CRAWLED_SCHEMA = StructType(
    [
        StructField("appid", StringType()),
        StructField("crawlid", StringType()),
        StructField("url", StringType()),
        StructField("response_url", StringType()),
        StructField("status_code", IntegerType()),
        StructField("status_msg", StringType()),
        StructField("response_headers", MapType(StringType(), ArrayType(StringType()))),
        StructField("request_headers", MapType(StringType(), ArrayType(StringType()))),
        StructField("body", BinaryType()),
        StructField("links", ArrayType(LINK_SCHEMA)),
        StructField("attrs", MapType(StringType(), StringType())),
        StructField("success", BooleanType()),
        StructField("exception", StringType()),
        StructField("encoding", StringType()),
        StructField("timestamp", StringType()),  # ISO-8601 UTC, pipelines.py:137
        StructField("spiderid", StringType()),
        StructField("curdepth", IntegerType()),
        StructField("domain", StringType()),
        StructField("round", LongType()),
    ]
)

# ---------------------------------------------------------------------------
# URL-seen set — replaces Redis SET <sid>:dupefilter:<crawlid>
# (crawler/crawling/redis_dupefilter.py:22-29).
# ---------------------------------------------------------------------------
SEEN_SCHEMA = StructType(
    [
        StructField("spiderid", StringType()),
        StructField("crawlid", StringType()),
        StructField("fingerprint", StringType()),
        StructField("seen_round", LongType()),
        StructField("bucket", IntegerType()),
    ]
)

# ---------------------------------------------------------------------------
# Fetch log — replaces the throttle-window zsets
# (utils/scutils/redis_throttled_queue.py:18-19,112-157).  One row per
# scheduled fetch; throttle state = trailing-window count per key.
# ---------------------------------------------------------------------------
FETCH_LOG_SCHEMA = StructType(
    [
        StructField("throttle_key", StringType()),
        StructField("domain", StringType()),
        StructField("spiderid", StringType()),
        StructField("url", StringType()),
        StructField("round", LongType()),
        StructField("slot_ts", DoubleType()),  # moderation slot within round
    ]
)

# ---------------------------------------------------------------------------
# Control-plane tables
# ---------------------------------------------------------------------------
# blacklist — Redis SET <sid>:blacklist of "{appid}||{crawlid}"
# (redis-monitor/plugins/stop_monitor.py:40-45)
BLACKLIST_SCHEMA = StructType(
    [
        StructField("spiderid", StringType()),
        StructField("appid", StringType()),
        StructField("crawlid", StringType()),
    ]
)

# crawl_jobs — replaces timeout:<sid>:<aid>:<cid> string keys
# (kafka-monitor/plugins/scraper_handler.py:54-59)
CRAWL_JOBS_SCHEMA = StructType(
    [
        StructField("spiderid", StringType()),
        StructField("appid", StringType()),
        StructField("crawlid", StringType()),
        StructField("expires", LongType()),
    ]
)

# actions — replaces action mailbox keys
# (kafka-monitor/plugins/action_handler.py:41-49, stats_handler.py:39-43,
#  zookeeper_handler.py:42-60)
ACTIONS_SCHEMA = StructType(
    [
        StructField("action", StringType()),  # stop | expire | info | stats | zk-update | zk-remove
        StructField("uuid", StringType()),
        StructField("spiderid", StringType()),
        StructField("appid", StringType()),
        StructField("crawlid", StringType()),
        StructField("stats", StringType()),  # for stats actions
        StructField("domain", StringType()),  # for zk actions
        StructField("hits", IntegerType()),
        StructField("window", IntegerType()),
        StructField("scale", DoubleType()),
        StructField("ts", DoubleType()),
        # failed-handling count — the reference retries a failing action
        # up to RETRY_FAILURES_MAX then deletes the poison key
        # (redis-monitor/redis_monitor.py:214-249); null = 0
        StructField("failures", IntegerType()),
    ]
)

# outbound — replaces Kafka outbound_firehose acks
# (redis-monitor/plugins/kafka_base_monitor.py:66-94)
OUTBOUND_SCHEMA = StructType(
    [
        StructField("uuid", StringType()),
        StructField("action", StringType()),
        StructField("spiderid", StringType()),
        StructField("appid", StringType()),
        StructField("crawlid", StringType()),
        StructField("server_time", LongType()),
        StructField("payload", StringType()),  # JSON body of the ack
    ]
)

# domain_config — replaces the Zookeeper znode YAML
# (crawler/config/example.yml:1-9, zookeeper_monitor.py:64-96)
DOMAIN_CONFIG_SCHEMA = StructType(
    [
        StructField("domain", StringType()),
        StructField("window", IntegerType()),
        StructField("hits", IntegerType()),
        StructField("scale", DoubleType()),
        StructField("blacklisted", BooleanType()),
    ]
)

# metrics — replaces the Redis stats zsets/HLL/counters
# (utils/scutils/stats_collector.py:416-576); appended per round
# (north_rule: per-round queue depth, domains active, pages/sec).
# Liveness self-reports — the reference's TTL'd
# ``stats:<component>:<host>:<uuid>`` / ``stats:crawler:<host>:<spider>:
# <uuid>`` keys (distributed_scheduler.py:310-320, kafka_monitor.py:407-415).
# A row is "live" while ts > now - heartbeat_ttl; expiry is a filter, not
# a delete.
HEARTBEATS_SCHEMA = StructType(
    [
        StructField("component", StringType()),  # crawler|kafka-monitor|redis-monitor
        StructField("host", StringType()),
        StructField("uuid", StringType()),
        StructField("spiderid", StringType()),  # null for non-crawler components
        StructField("ts", DoubleType()),
    ]
)

METRICS_SCHEMA = StructType(
    [
        StructField("round", LongType()),
        StructField("component", StringType()),
        StructField("kind", StringType()),
        # handler plugin that produced the count — the reference keys
        # monitor stats per plugin class name
        # (kafka_monitor.py:189-221 ``stats:kafka-monitor:<Plugin>``);
        # null for engine-internal round metrics
        StructField("plugin", StringType()),
        StructField("spiderid", StringType()),
        StructField("status_code", IntegerType()),
        StructField("value", DoubleType()),
        StructField("ts", DoubleType()),
    ]
)
