"""Ordering-match metric — must be 1.0 for the engine's own scheduler
(SURVEY.md §5 metric; BASELINE 'crawl-ordering match rate')."""

from pyspark.sql import functions as F

from scrapy_cluster_spark.config import EngineConfig
from scrapy_cluster_spark.plans.crawl import feed_requests, run_crawl
from scrapy_cluster_spark.plans.ordering import ordering_match_rate, seen_set_equality
from scrapy_cluster_spark.schemas import CRAWLED_SCHEMA, FETCH_LOG_SCHEMA, FRONTIER_SCHEMA


def test_ordering_match_is_perfect(store, pages, spark):
    cfg = EngineConfig(queue_hits=3)  # small quota → ordering spans rounds
    seeds = [
        {"appid": "testapp", "crawlid": "om", "url": f"http://site0.com/page/{j}",
         "priority": p, "maxdepth": 0}
        for j, p in [(0, 90), (1, 90), (2, 70), (3, 70), (4, 50), (5, 50), (6, 30), (7, 10)]
    ] + [
        {"appid": "testapp", "crawlid": "om", "url": f"http://site1.com/page/{j}",
         "priority": 20 + j, "maxdepth": 0}
        for j in range(6)
    ]
    feed_requests(store, seeds, cfg)
    frontier_priorities = store.read("frontier", FRONTIER_SCHEMA).select(
        "spiderid", "domain", "url", "priority"
    )
    run_crawl(store, pages, cfg, max_rounds=8)

    log = store.read("fetch_log", FETCH_LOG_SCHEMA)
    m = ordering_match_rate(log, frontier_priorities)
    assert m["match_rate"] == 1.0
    assert m["domains"] == 2
    assert m["total_positions"] == 14

    # URL-seen set equality: everything fed was fetched exactly the
    # reference would (all unique urls exist in pages)
    crawled = store.read("crawled", CRAWLED_SCHEMA).filter("success = true")
    expected = spark.createDataFrame([(s["url"],) for s in seeds], ["url"])
    assert seen_set_equality(crawled, expected)
