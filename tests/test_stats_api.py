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
    # round 2 → now=120 s: the round-1 crawler heartbeat (ts=60, the
    # only round that scheduled anything) is inside the 120 s TTL
    process_actions(store, round_id=2)

    ack = poll_outbound(store, "u-stats")
    assert ack is not None and ack["action"] == "stats"
    p = ack["payload"]
    assert p["stats"] == "all"
    # queue stats reflect the (drained) frontier; spider stats the crawl
    assert "total_backlog" in p["queue"]
    # window-keyed response (api.rst:324): rolling windows + lifetime
    s200 = p["spider"]["link"]["200"]
    assert s200["lifetime"] == 5
    assert s200["900"] == 5  # crawl events (t=60) inside 15 min of now=120
    assert s200["604800"] == 5
    # heartbeat-derived live counts (stats_monitor.py:169-202)
    assert p["spider"]["unique_spider_count"] == 1
    assert p["spider"]["total_spider_count"] == 1
    assert p["spider"]["link"]["count"] == 1
    import socket

    host = socket.gethostname()
    assert p["machine"]["count"] == 1
    assert p["machine"][host]["200"]["lifetime"] == 5
    assert "kafka-monitor" in p and "redis-monitor" in p
    # 'all' carries the rest section too (get_all_stats,
    # stats_monitor.py:78); no REST process runs in-engine, so its
    # metrics dict is empty — the KEY must still exist for API parity
    assert p["rest"] == {}
    # kafka-monitor total_value equals its lifetime window: totals come
    # from plugin-null rows only (plugin rows share kind='total' and
    # would double-count every handled message)
    km_total = p["kafka-monitor"].get("total", {})
    if km_total:
        assert km_total["total_value"] == km_total["lifetime"]

    # --- stats: crawler = spiders + machines + QUEUE
    # (get_crawler_stats, stats_monitor.py:246-258)
    feed_action(store, {"action": "stats", "uuid": "u-crawler", "stats": "crawler"})
    process_actions(store, round_id=2)
    pc = poll_outbound(store, "u-crawler")["payload"]
    assert set(pc) == {"stats", "queue", "spider", "machine"}
    assert "total_backlog" in pc["queue"]

    # --- heartbeat expiry: same store, much later stats action.  A
    # heartbeat older than the TTL no longer counts as live (Redis
    # key-expiry analog, distributed_scheduler.py:319-320)
    feed_action(store, {"action": "stats", "uuid": "u-stats-late", "stats": "spider"})
    process_actions(store, round_id=10)  # now=600: ts=60 is stale (TTL 120)
    p2 = poll_outbound(store, "u-stats-late")["payload"]
    assert p2["spider"]["total_spider_count"] == 0
    assert "count" not in p2["spider"].get("link", {})
    # lifetime survives; the 900 s window (600-900<60) still covers t=60
    assert p2["spider"]["link"]["200"]["lifetime"] == 5


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


def test_hll_sketch_incremental_merge_equals_batch(spark):
    """Mergeable HLL state (PFADD/PFMERGE analog): per-chunk sketches
    unioned with hll_merge produce the SAME estimate as one batch
    sketch over everything (associative registers), and the estimate is
    within HLL error of the exact count — the property that makes the
    lifetime-unique counter incremental (O(new data) per round) instead
    of a history rescan."""
    from scrapy_cluster_spark.operators import stats as S

    def tagged(df):
        return df.selectExpr("id % 4 as k", "concat('u', id % 2500) as v")

    whole = {
        r.k: r.value
        for r in S.hll_estimate(
            S.hll_sketch_rollup(tagged(spark.range(10_000)), ["k"], "v")
        ).collect()
    }
    chunks = [
        S.hll_sketch_rollup(tagged(spark.range(i, 10_000, 3)), ["k"], "v")
        for i in range(3)
    ]
    merged = {
        r.k: r.value
        for r in S.hll_estimate(
            S.hll_merge(chunks[0].unionAll(chunks[1]).unionAll(chunks[2]), ["k"])
        ).collect()
    }
    assert merged == whole  # identical registers, not just close
    exact = 625  # per k: ids in one residue class mod 4 hit 625 of the 2500 v values
    assert all(abs(v - exact) / exact < 0.05 for v in whole.values())


def test_index_status(spark, store):
    """REST '/' index analog (rest_service.py:577-601): uptime, node id,
    backend connectivity, GREEN/YELLOW/RED health."""
    from scrapy_cluster_spark.operators.control import index_status

    s = index_status(store, my_id="node-1", start_time=100.0, now=160.5)
    assert s == {
        "feed_connected": True,
        "store_connected": True,
        "uptime_sec": 60,
        "my_id": "node-1",
        "node_health": "GREEN",
    }

    class _Broken:
        root = "/nonexistent/definitely/not/here"

        def current_version(self, table):
            raise OSError("backend down")

    s2 = index_status(_Broken(), my_id="node-2", start_time=0.0, now=1.0)
    assert s2["node_health"] == "RED"
    assert not s2["store_connected"] and not s2["feed_connected"]


def test_sessionize_gap_boundaries(spark):
    """Spark's session-window boundary is INCLUSIVE: an event at exactly
    last + gap_s merges into the session; one microsecond over starts
    a new one.  The oracle's gaps-and-islands break is therefore
    strictly-greater-than."""
    import datetime as dt

    from scrapy_cluster_spark.operators.stats import sessionize

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def at(sec, us=0):
        return t0 + dt.timedelta(seconds=sec, microseconds=us)

    rows = [
        # user 1: events 10 s apart → one session of 3
        (1, at(0), 1.0), (1, at(10), 2.0), (1, at(20), 3.5),
        # user 1: 1 µs OVER the gap after the last → NEW session
        (1, at(80, 1), 1.25),
        # user 2: exactly the gap → INCLUSIVE boundary, SAME session
        (2, at(0), 1.0), (2, at(60), 2.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    got = sessionize(df, gap_s=60).collect()
    by_user = {}
    for r in got:
        by_user.setdefault(r.user_id, []).append(r)
    u1 = sorted(by_user[1], key=lambda r: r.session_start_us)
    assert [(r.n_events, r.total_value) for r in u1] == [(3, 6.5), (1, 1.25)]
    assert u1[0].session_last_us - u1[0].session_start_us == 20_000_000
    u2 = by_user[2]
    assert len(u2) == 1 and u2[0].n_events == 2
    assert u2[0].session_last_us - u2[0].session_start_us == 60_000_000
