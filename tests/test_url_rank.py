"""OPIC-style link-centrality scheduling (operators/rank_signal.py):
URL PageRank from the observed link graph, inherited by children as a
priority boost — opt-in, order-only (politeness budgets untouched),
default path byte-identical to the reference semantics.
"""

from pyspark.sql import functions as F

from scrapy_cluster_spark.config import EngineConfig
from scrapy_cluster_spark.operators import parse, rank_signal
from scrapy_cluster_spark.plans.crawl import feed_requests, run_crawl
from scrapy_cluster_spark.schemas import CRAWLED_SCHEMA

CFG = EngineConfig()


def _crawled_row(url, links, success=True):
    base = {f.name: None for f in CRAWLED_SCHEMA.fields}
    base.update(
        url=url,
        links=[{"url": u, "text": "t"} for u in links],
        success=success,
        domain="site1.com",
    )
    return base


class TestRefreshUrlRank:
    def test_rank_orders_by_observed_centrality(self, spark, store):
        """Hub page A links B and C; B links C → C (2 in-links) ranks
        above B (1) ranks above A (0); failed fetches contribute no
        edges; the table is a committed snapshot."""
        rows = [
            _crawled_row("http://site1.com/A", ["http://site1.com/B", "http://site1.com/C"]),
            _crawled_row("http://site1.com/B", ["http://site1.com/C"]),
            _crawled_row("http://site1.com/X", ["http://site1.com/A"], success=False),
        ]
        store.overwrite("crawled", spark.createDataFrame(rows, CRAWLED_SCHEMA))
        v = rank_signal.refresh_url_rank(store, CFG)
        got = {
            r.url: r.pagerank
            for r in store.read("url_rank", rank_signal.URL_RANK_SCHEMA, v).collect()
        }
        assert set(got) == {"http://site1.com/A", "http://site1.com/B", "http://site1.com/C"}
        assert got["http://site1.com/C"] > got["http://site1.com/B"] > got["http://site1.com/A"]

    def test_boost_is_scale_free(self, spark):
        """boost = round(weight × rank/uniform): an average page boosts
        ≈ weight on a 4-node and a 4000-node graph alike (raw ranks
        shrink as 1/N — unnormalized they'd round to 0 at scale)."""
        small = spark.createDataFrame(
            [("u1", 0.5), ("u2", 0.001)], ["url", "pagerank"]
        )
        got = {r.url: r.rank_boost for r in rank_signal.rank_boost(small, 100.0).collect()}
        assert got == {"u1": 100, "u2": 0}  # 0.5 = 1x uniform of N=2
        big = spark.createDataFrame(
            [(f"u{i}", 1.0 / 4000) for i in range(4000)], ["url", "pagerank"]
        )
        vals = {r.rank_boost for r in rank_signal.rank_boost(big, 100.0).collect()}
        assert vals == {100}  # uniform rank → weight, independent of N

    def test_empty_link_graph_is_a_noop(self, spark, store):
        """A refresh before any links were observed must not abort the
        crawl loop — it returns the existing (absent ⇒ 0) version."""
        rows = [_crawled_row("http://site1.com/A", [], success=False)]
        store.overwrite("crawled", spark.createDataFrame(rows, CRAWLED_SCHEMA))
        assert rank_signal.refresh_url_rank(store, CFG) == 0
        assert not store.exists("url_rank")


class TestChildBoost:
    _ITEM_SCHEMA = (
        "appid string, crawlid string, spiderid string, maxdepth int, "
        "domain_max_pages int, allowed_domains array<string>, "
        "allow_regex array<string>, deny_regex array<string>, "
        "deny_extensions array<string>, expires bigint, "
        "attrs map<string,string>, cookie string, useragent string, "
        "url string, priority int, curdepth int, success boolean, "
        "links_full array<struct<url:string,text:string>>"
    )

    def _items(self, spark):
        rows = [
            {
                "appid": "testapp", "crawlid": "c1", "spiderid": "link",
                "maxdepth": 2, "url": u, "priority": 50, "curdepth": 0,
                "success": True, "links_full": [{"url": k, "text": "t"}],
            }
            for u, k in [
                ("http://site1.com/hub", "http://site1.com/from-hub"),
                ("http://site1.com/leaf", "http://site1.com/from-leaf"),
            ]
        ]
        return spark.createDataFrame(rows, self._ITEM_SCHEMA)

    def test_none_is_reference_semantics(self, spark):
        items = self._items(spark)
        base = {r.url: r.priority for r in parse.child_candidates(items).collect()}
        zeros = spark.createDataFrame(
            [("http://site1.com/hub", 0), ("http://site1.com/leaf", 0)],
            ["url", "rank_boost"],
        )
        with_zero = {
            r.url: r.priority
            for r in parse.child_candidates(items, rank_boost=zeros).collect()
        }
        assert base == with_zero == {
            "http://site1.com/from-hub": 40,
            "http://site1.com/from-leaf": 40,
        }

    def test_children_inherit_parent_centrality(self, spark):
        """Same domain, same base priority: the child found on the
        high-rank parent now outranks the other — rank buys order
        within the politeness budget."""
        items = self._items(spark)
        boost = spark.createDataFrame(
            [("http://site1.com/hub", 25)], ["url", "rank_boost"]
        )
        got = {
            r.url: r.priority
            for r in parse.child_candidates(items, rank_boost=boost).collect()
        }
        assert got["http://site1.com/from-hub"] == 65   # 50 - 10 + 25
        assert got["http://site1.com/from-leaf"] == 40  # unlisted parent → +0


class TestCrawlIntegration:
    def test_rank_on_preserves_coverage_and_refreshes(self, spark, pages, tmp_path):
        """Full crawl A/B: centrality changes ORDER, never coverage —
        the final crawled URL set is identical with the signal on
        (weight high, refresh every round) and off; the url_rank
        snapshot exists and covers observed URLs."""
        import shutil
        import tempfile

        from scrapy_cluster_spark.store import SnapshotStore

        seeds = [
            {"appid": "testapp", "crawlid": "rk", "url": "http://site1.com/page/0",
             "priority": 80, "maxdepth": 2},
        ]
        results = {}
        for name, cfg in {
            "off": CFG,
            "on": EngineConfig(use_url_rank=True, url_rank_every=1,
                               url_rank_weight=5000.0),
        }.items():
            tmp = tempfile.mkdtemp(prefix=f"scs-rank-{name}-")
            st = SnapshotStore(spark, tmp)
            feed_requests(st, seeds, cfg)
            run_crawl(st, pages, cfg, max_rounds=8)
            results[name] = {
                r.url for r in st.read("crawled", CRAWLED_SCHEMA)
                .filter(F.col("success")).select("url").distinct().collect()
            }
            if name == "on":
                assert st.exists("url_rank")
                ranked = st.read("url_rank", rank_signal.URL_RANK_SCHEMA).count()
                assert ranked > 0
            shutil.rmtree(tmp, ignore_errors=True)
        assert results["on"] == results["off"] and results["off"]
