"""Mixed-feed plugin routing (kafka_monitor.py:270-314 precedence) +
sink projections."""

from pyspark.sql import functions as F

from scrapy_cluster_spark.operators.ingest import route_feed
from scrapy_cluster_spark.sources.sinks import crawled_firehose_json


def test_route_feed_precedence(spark):
    rows = [
        # crawl (has url — even with action present, scraper wins)
        {"url": "http://a.com/", "appid": "app001", "crawlid": "c1", "action": None,
         "stats": None, "domain": None},
        # zk (action + domain)
        {"url": None, "appid": "app001", "crawlid": None, "action": "domain-update",
         "stats": None, "domain": "a.com"},
        # action (action + crawlid, no domain)
        {"url": None, "appid": "app001", "crawlid": "c1", "action": "stop",
         "stats": None, "domain": None},
        # stats
        {"url": None, "appid": "app001", "crawlid": None, "action": None,
         "stats": "queue", "domain": None},
        # garbage
        {"url": None, "appid": "app001", "crawlid": None, "action": None,
         "stats": None, "domain": None},
    ]
    df = spark.createDataFrame(rows)
    routed = route_feed(df)
    assert routed["crawl"].count() == 1
    assert routed["zk"].count() == 1
    assert routed["action"].count() == 1
    assert routed["stats"].count() == 1
    assert routed["invalid"].count() == 1


def test_firehose_json_projection(spark, pages):
    import json

    from scrapy_cluster_spark.config import EngineConfig
    from scrapy_cluster_spark.plans.crawl import feed_requests, run_crawl
    from scrapy_cluster_spark.schemas import CRAWLED_SCHEMA
    from scrapy_cluster_spark.store import SnapshotStore
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="scs-sink-")
    store = SnapshotStore(spark, tmp)
    cfg = EngineConfig()
    feed_requests(store, [{"appid": "sinkapp", "crawlid": "s1",
                           "url": "http://site1.com/page/0", "maxdepth": 0,
                           "priority": 9}], cfg)
    run_crawl(store, pages, cfg, max_rounds=2)
    crawled = store.read("crawled", CRAWLED_SCHEMA)
    out = crawled_firehose_json(crawled, use_base64=True).collect()
    assert len(out) >= 1
    msg = json.loads(out[0].value)
    assert msg["appid"] == "sinkapp"
    assert msg["status_code"] == 200
    import base64

    assert base64.b64decode(msg["body"]).startswith(b"<html>")

    # wire parity with ujson.dumps(datum, sort_keys=True) (pipelines.py:198):
    # keys arrive in sorted order and null fields are serialized, not dropped
    raw_keys = [k for k, _ in json.loads(
        out[0].value, object_pairs_hook=lambda p: {"__pairs__": p}
    )["__pairs__"]]
    assert raw_keys == sorted(raw_keys)
    assert "exception" in raw_keys  # null on a successful fetch, still present
    assert msg["exception"] is None

    # log/console sink: bulky fields dropped, ack stamp added
    # (pipelines.py:140-154 _clean_item)
    from scrapy_cluster_spark.sources.sinks import log_sink_json

    logmsg = json.loads(log_sink_json(crawled).collect()[0].value)
    for dropped in ("body", "links", "response_headers", "request_headers",
                    "status_code", "status_msg"):
        assert dropped not in logmsg
    assert logmsg["action"] == "ack"
    assert logmsg["appid"] == "sinkapp"
    shutil.rmtree(tmp, ignore_errors=True)
