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
    shutil.rmtree(tmp, ignore_errors=True)
