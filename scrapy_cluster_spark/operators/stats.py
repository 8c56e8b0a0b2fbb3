"""Statistics surface: rolling windows, HLL uniques, info/queue rollups.

Reference collectors (utils/scutils/stats_collector.py): RollingTimeWindow
(:447-471), HyperLogLogCounter (:529-553), Counter (:474-500),
UniqueCounter (:503-526), BitMapCounter (:556-576) — all Redis zset/HLL
tricks that collapse to built-in Spark aggregates (SURVEY.md §2.5):

  rolling window  → filter(ts > now - window).count()
  HLL lifetime    → approx_count_distinct
  unique          → countDistinct
  counter         → count / sum
  tumbling window → groupBy(F.window(ts, ...))

Info rollups mirror redis-monitor/plugins/info_monitor.py:81-202; queue
stats mirror stats_monitor.py:261-297 + redis_monitor.py:465-494.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


# ---------------------------------------------------------------------------
# metrics_events-style aggregations
# ---------------------------------------------------------------------------

def rolling_window_count(events: DataFrame, ts_col: str, now: float, window_s: int,
                         group_cols: list[str] | None = None) -> DataFrame:
    """RollingTimeWindow.value() — count of events in the trailing window
    (stats_collector.py:447-471)."""
    trailing = events.filter(F.col(ts_col) > F.lit(now) - F.lit(window_s))
    if group_cols:
        return trailing.groupBy(*group_cols).agg(F.count("*").alias("value"))
    return trailing.agg(F.count("*").alias("value"))


def lifetime_unique(events: DataFrame, col: str, rsd: float = 0.01) -> DataFrame:
    """HyperLogLogCounter.value() — PFCOUNT ≈ approx_count_distinct; the
    reference HLL also runs at ~1% error (stats_collector.py:529-553)."""
    return events.agg(F.approx_count_distinct(col, rsd).alias("value"))


def exact_unique(events: DataFrame, col: str) -> DataFrame:
    """UniqueCounter (SADD/SCARD, stats_collector.py:503-526)."""
    return events.agg(F.countDistinct(col).alias("value"))


def tumbling_window_counts(events: DataFrame, ts_col: str, window: str,
                           group_cols: list[str] | None = None) -> DataFrame:
    """TimeWindow (stats_collector.py:416-444) → groupBy(F.window(...))."""
    keys = [F.window(F.col(ts_col), window).alias("win")] + [F.col(c) for c in (group_cols or [])]
    return events.groupBy(*keys).agg(F.count("*").alias("value"))


# ---------------------------------------------------------------------------
# frontier rollups (info / queue APIs)
# ---------------------------------------------------------------------------

def appid_info_df(frontier: DataFrame, spiderid: str, appid: str) -> DataFrame:
    """Per-(crawlid, domain) bins for an appid: total + high/low priority
    (info_monitor zscore binning :60-79 — zset scores are -priority, so
    'high' = max(priority), 'low' = min(priority))."""
    return (
        frontier.filter((F.col("spiderid") == spiderid) & (F.col("appid") == appid))
        .groupBy("crawlid", "domain")
        .agg(
            F.count("*").alias("total"),
            F.max("priority").alias("high_priority"),
            F.min("priority").alias("low_priority"),
        )
    )


def build_appid_info(frontier: DataFrame, spiderid: str, appid: str) -> dict:
    """InfoMonitor._build_appid_info (:81-150): grand totals + per-crawlid
    {total, distinct domains, per-domain bins}."""
    bins = appid_info_df(frontier, spiderid, appid).collect()
    crawlids: dict = {}
    for b in bins:
        c = crawlids.setdefault(
            b["crawlid"], {"total": 0, "distinct_domains": 0, "domains": {}}
        )
        c["total"] += b["total"]
        c["domains"][b["domain"]] = {
            "total": b["total"],
            "high_priority": b["high_priority"],
            "low_priority": b["low_priority"],
        }
        c["distinct_domains"] += 1
    return {
        "appid": appid,
        "spiderid": spiderid,
        "total_pending": sum(c["total"] for c in crawlids.values()),
        "total_domains": len({b["domain"] for b in bins}),
        "total_crawlids": len(crawlids),
        "crawlids": crawlids,
    }


def build_crawlid_info(frontier: DataFrame, crawl_jobs: DataFrame,
                       spiderid: str, appid: str, crawlid: str) -> dict:
    """InfoMonitor._build_crawlid_info (:152-202): one crawl's bins +
    expires from the timeout key (crawl_jobs)."""
    bins = (
        frontier.filter(
            (F.col("spiderid") == spiderid)
            & (F.col("appid") == appid)
            & (F.col("crawlid") == crawlid)
        )
        .groupBy("domain")
        .agg(
            F.count("*").alias("total"),
            F.max("priority").alias("high_priority"),
            F.min("priority").alias("low_priority"),
        )
        .collect()
    )
    exp = (
        crawl_jobs.filter(
            (F.col("spiderid") == spiderid)
            & (F.col("appid") == appid)
            & (F.col("crawlid") == crawlid)
        )
        .select("expires")
        .collect()
    )
    return {
        "appid": appid,
        "crawlid": crawlid,
        "spiderid": spiderid,
        "total_pending": sum(b["total"] for b in bins),
        "total_domains": len(bins),
        "expires": exp[0]["expires"] if exp else 0,
        "domains": {
            b["domain"]: {
                "total": b["total"],
                "high_priority": b["high_priority"],
                "low_priority": b["low_priority"],
            }
            for b in bins
        },
    }


def build_stats_payload(frontier: DataFrame, crawled: DataFrame, metrics: DataFrame,
                        which: str = "all") -> dict:
    """StatsMonitor.handle dispatch (stats_monitor.py:15-67): assemble
    the stats-API response for ``stats`` ∈ {queue, spider, machine,
    crawler, kafka-monitor, redis-monitor, all}.  Response shape per
    docs/topics/kafka-monitor/api.rst: nested dicts; window-keyed
    totals collapse to per-round totals here (the engine's windows are
    rounds)."""
    out: dict = {"stats": which}

    def queue_part():
        per_spider = queue_stats_df(frontier).collect()
        per_domain = (
            frontier.groupBy("spiderid", "domain").agg(F.count("*").alias("backlog")).collect()
        )
        queues = {}
        for r in per_spider:
            queues[f"queue_{r['spiderid']}"] = {
                "spider_backlog": r["spider_backlog"],
                "num_domains": r["num_domains"],
                "domains": [
                    {"domain": d["domain"], "backlog": d["backlog"]}
                    for d in per_domain
                    if d["spiderid"] == r["spiderid"]
                ],
            }
        queues["total_backlog"] = sum(r["spider_backlog"] for r in per_spider)
        return queues

    def spider_part():
        rows = spider_stats_df(crawled).collect()
        spiders: dict = {"unique_spider_count": len({r["spiderid"] for r in rows}),
                         "total_spider_count": len({r["spiderid"] for r in rows})}
        for r in rows:
            spiders.setdefault(r["spiderid"], {})[str(r["status_code"])] = {
                "lifetime": r["total"]
            }
        return spiders

    def machine_part():
        rows = machine_stats_df(crawled).collect()
        return {
            "count": 1,  # one logical machine in-sandbox
            "localhost": {str(r["status_code"]): {"lifetime": r["total"]} for r in rows},
        }

    def monitor_part(component: str):
        rows = (
            metrics.filter(F.col("component") == component)
            .groupBy("kind")
            .agg(F.sum("value").alias("total"))
            .collect()
        )
        return {r["kind"]: {"lifetime": r["total"]} for r in rows}

    if which in ("queue", "all"):
        out["queue"] = queue_part()
    if which in ("spider", "crawler", "all"):
        out["spider"] = spider_part()
    if which in ("machine", "crawler", "all"):
        out["machine"] = machine_part()
    if which in ("kafka-monitor", "all"):
        out["kafka-monitor"] = monitor_part("kafka-monitor") or monitor_part("scheduler")
    if which in ("redis-monitor", "all"):
        out["redis-monitor"] = monitor_part("redis-monitor") or monitor_part("scheduler")
    return out


def queue_stats_df(frontier: DataFrame) -> DataFrame:
    """StatsMonitor.get_queue_stats (:261-297): per spider backlog +
    domain count; total backlog = frontier.count()."""
    return frontier.groupBy("spiderid").agg(
        F.count("*").alias("spider_backlog"),
        F.countDistinct("domain").alias("num_domains"),
    )


def machine_stats_df(crawled: DataFrame) -> DataFrame:
    """StatsMonitor.get_machine_stats (:211-244) analog: per status_code
    totals (one logical machine in-sandbox)."""
    return (
        crawled.filter(F.col("status_code").isNotNull())
        .groupBy("status_code")
        .agg(F.count("*").alias("total"))
    )


def spider_stats_df(crawled: DataFrame) -> DataFrame:
    """StatsMonitor.get_spider_stats (:162-209) analog: per (spiderid,
    status_code) totals."""
    return (
        crawled.filter(F.col("status_code").isNotNull())
        .groupBy("spiderid", "status_code")
        .agg(F.count("*").alias("total"))
    )
