"""robots.txt filter (north_star: "filters by robots.txt rules cached
per domain").  The rules table holds parsed Disallow prefixes (user-agent
'*'); the filter drops candidates whose url PATH starts with one.
"""

from __future__ import annotations

from pyspark.sql import types as T

from scrapy_cluster_spark.operators.robots import ROBOTS_SCHEMA, apply_robots

_CAND_SCHEMA = T.StructType(
    [
        T.StructField("domain", T.StringType()),
        T.StructField("url", T.StringType()),
    ]
)


def _cands(spark):
    rows = [
        ("a.com", "http://a.com/public/1"),
        ("a.com", "http://a.com/private/secret"),
        ("a.com", "http://a.com/private2"),       # prefix match: /private
        ("a.com", "http://a.com/admin"),
        ("a.com", "http://a.com"),                 # empty path → "/"
        ("b.com", "http://b.com/private/ok"),      # no rules for b.com
        ("c.com", "http://c.com/x?q=/private"),    # query is not path
    ]
    return spark.createDataFrame(rows, _CAND_SCHEMA)


def _rules(spark):
    rows = [
        ("a.com", "/private"),
        ("a.com", "/admin"),
        ("c.com", "/private"),
    ]
    return spark.createDataFrame(rows, ROBOTS_SCHEMA)


def test_robots_prefix_filter(spark):
    got = {r.url for r in apply_robots(_cands(spark), _rules(spark)).collect()}
    assert got == {
        "http://a.com/public/1",
        "http://a.com",
        "http://b.com/private/ok",
        "http://c.com/x?q=/private",
    }


def test_robots_disallow_all(spark):
    """'Disallow: /' blocks the whole domain."""
    rules = spark.createDataFrame([("a.com", "/")], ROBOTS_SCHEMA)
    got = {r.url for r in apply_robots(_cands(spark), rules).collect()}
    assert not any(u.startswith("http://a.com") for u in got)
    assert "http://b.com/private/ok" in got


def test_robots_empty_table_is_noop(spark):
    rules = spark.createDataFrame([], ROBOTS_SCHEMA)
    assert apply_robots(_cands(spark), rules).count() == _cands(spark).count()


def test_robots_e2e_blocks_children(spark, pages, store):
    """Rules in the store's robots_rules table stop child discovery on
    the disallowed prefix during a real crawl round."""
    from scrapy_cluster_spark.config import EngineConfig
    from scrapy_cluster_spark.plans.crawl import feed_requests, run_crawl
    from scrapy_cluster_spark.schemas import CRAWLED_SCHEMA

    cfg = EngineConfig()
    store.append("robots_rules", spark.createDataFrame(
        [("site1.com", "/page/1")], ROBOTS_SCHEMA))
    feed_requests(store, [{"appid": "robapp", "crawlid": "rb1",
                           "url": "http://site1.com/page/0", "priority": 50,
                           "maxdepth": 1}], cfg)
    run_crawl(store, pages, cfg, max_rounds=3)
    crawled = {r.url for r in store.read("crawled", CRAWLED_SCHEMA)
               .filter("success").collect()}
    assert "http://site1.com/page/0" in crawled  # the seed itself crawls
    # every discovered /page/1* child was robots-blocked
    assert not any(u.startswith("http://site1.com/page/1") for u in crawled)
    # sibling pages outside the prefix did crawl (depth-1 children exist)
    assert any(u != "http://site1.com/page/0" for u in crawled)
