"""Stats action payload assembly (stats_monitor.py:15-67 dispatch,
api.rst response shapes) + poll and wander modes."""

import json

from scrapy_cluster_spark.config import EngineConfig
from scrapy_cluster_spark.operators.control import feed_action, poll_outbound, process_actions
from scrapy_cluster_spark.plans.crawl import feed_requests, run_crawl

CFG = EngineConfig()


def test_stats_action_payload(store, pages):
    feed_requests(
        store,
        [{"appid": "statapp", "crawlid": "sc", "url": f"http://site0.com/page/{j}",
          "priority": 5, "maxdepth": 0} for j in range(4)]
        + [{"appid": "statapp", "crawlid": "sc2", "url": "http://site1.com/page/0",
            "priority": 5, "maxdepth": 0}],
        CFG,
    )
    run_crawl(store, pages, CFG, max_rounds=2)
    feed_action(store, {"action": "stats", "uuid": "u-stats", "stats": "all"})
    process_actions(store, round_id=5)

    ack = poll_outbound(store, "u-stats")
    assert ack is not None and ack["action"] == "stats"
    p = ack["payload"]
    assert p["stats"] == "all"
    # queue stats reflect the (drained) frontier; spider stats the crawl
    assert "total_backlog" in p["queue"]
    assert p["spider"]["link"]["200"]["lifetime"] == 5
    assert p["machine"]["localhost"]["200"]["lifetime"] == 5
    assert "kafka-monitor" in p and "redis-monitor" in p


def test_poll_unknown_uuid(store):
    assert poll_outbound(store, "nope") is None


def test_wander_mode(spark, pages):
    """WanderingSpider: one link per page, step counter in attrs."""
    from pyspark.sql import functions as F

    from scrapy_cluster_spark.operators import fetch
    from scrapy_cluster_spark.operators.ingest import to_frontier_rows, validate_requests
    from scrapy_cluster_spark.operators.parse import wander_candidates

    reqs = spark.createDataFrame(
        [("wapp", "wc", "http://site0.com/page/0", 50, 3)],
        "appid string, crawlid string, url string, priority int, maxdepth int",
    )
    valid, _ = validate_requests(reqs, CFG)
    batch = to_frontier_rows(valid, 1, CFG)
    items = fetch.assemble_items(fetch.fetch_batch(batch, pages), 1, 60)
    kids = wander_candidates(items, seed=42).collect()
    assert len(kids) == 1  # exactly one followed link
    assert kids[0].attrs["step"] == "1"
    assert kids[0].curdepth == 1
    # deterministic: same seed → same pick
    again = wander_candidates(
        fetch.assemble_items(fetch.fetch_batch(batch, pages), 1, 60), seed=42
    ).collect()
    assert again[0].url == kids[0].url
