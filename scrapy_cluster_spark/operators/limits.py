"""Enqueue-time limit filters: page caps, blacklist, expiry, zk-domains.

Reference filter chain in ``enqueue_request``
(distributed_scheduler.py:414-488), applied in this order AFTER the
dupefilter:
  1. per-domain max-page filter (redis_domain_max_page_filter.py:31-63)
  2. global page-per-domain filter (redis_global_page_per_domain_filter.py:41-68)
  3. appid/crawlid blacklist (:403-412, applied :448)
  4. zk-domain backlog + expiry predicate (:464-468)

Page-counter semantics (redis_domain_max_page_filter.py:50-63): the
counter increments per processed request and the request is REJECTED
when the post-increment count reaches the limit — so at most
``limit - 1`` spider-enqueued requests pass per (domain, crawlid);
feed-side seeds bypass the filter entirely (they are pushed by
kafka-monitor, not through enqueue_request), which is how the e2e test
gets exactly ``domain_max_pages`` pages: 1 seed + (limit-1) children
(crawler/tests/online.py:128-129).

Spark: the counter is a ``page_counts`` state table
(spiderid, crawlid, domain, kind, count); candidates are ranked
deterministically within (domain, crawlid) and accepted while
``prior_count + rank < limit``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

PAGE_COUNT_KEY = ["spiderid", "crawlid", "domain"]


def _rank_window():
    # deterministic processing order within a (domain, crawlid) group:
    # priority desc then canonical url — the engine's lex tiebreak
    return Window.partitionBy("spiderid", "crawlid", "domain").orderBy(
        F.desc("priority"), F.asc("url"), F.asc("retry_times")
    )


def apply_domain_max_pages(
    candidates: DataFrame, page_counts: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Per-request ``domain_max_pages`` cap.

    Returns (passed, count_deltas).  ``count_deltas`` rows are appended
    to the page_counts table (kind='domain'): delta = number of
    processed candidates, capped so the stored counter never exceeds the
    limit (reference stops INCRing at the limit).
    """
    limited = candidates.filter(F.col("domain_max_pages").isNotNull() & (F.col("domain_max_pages") > 0))
    unlimited = candidates.filter(F.col("domain_max_pages").isNull() | (F.col("domain_max_pages") <= 0))

    counts = (
        page_counts.filter(F.col("kind") == "domain")
        .groupBy(*PAGE_COUNT_KEY)
        .agg(F.sum("count").alias("prior_count"))
    )
    ranked = (
        limited.withColumn("rn", F.row_number().over(_rank_window()))
        .join(counts, PAGE_COUNT_KEY, "left")
        .withColumn("prior_count", F.coalesce("prior_count", F.lit(0)))
    )
    passed = ranked.filter(F.col("prior_count") + F.col("rn") < F.col("domain_max_pages"))
    deltas = (
        ranked.groupBy(*PAGE_COUNT_KEY)
        .agg(
            F.count("*").alias("processed"),
            F.max("prior_count").alias("prior"),
            F.max("domain_max_pages").alias("limit"),
        )
        .select(
            *PAGE_COUNT_KEY,
            F.lit("domain").alias("kind"),
            F.least(F.col("processed"), F.greatest(F.col("limit") - F.col("prior"), F.lit(0)))
            .cast("long")
            .alias("count"),
        )
        .filter(F.col("count") > 0)
    )
    return passed.drop("rn", "prior_count").unionByName(unlimited), deltas


def apply_global_page_limit(
    candidates: DataFrame, page_counts: DataFrame, limit: int | None
) -> tuple[DataFrame, DataFrame]:
    """Cluster-wide per-domain cap (GLOBAL_PAGE_PER_DOMAIN_LIMIT,
    settings.py:49; default None = off)."""
    if not limit:
        return candidates, None
    counts = (
        page_counts.filter(F.col("kind") == "global")
        .groupBy(*PAGE_COUNT_KEY)
        .agg(F.sum("count").alias("prior_count"))
    )
    ranked = (
        candidates.withColumn("rn", F.row_number().over(_rank_window()))
        .join(counts, PAGE_COUNT_KEY, "left")
        .withColumn("prior_count", F.coalesce("prior_count", F.lit(0)))
    )
    passed = ranked.filter(F.col("prior_count") + F.col("rn") < F.lit(limit))
    deltas = (
        ranked.groupBy(*PAGE_COUNT_KEY)
        .agg(F.count("*").alias("processed"), F.max("prior_count").alias("prior"))
        .select(
            *PAGE_COUNT_KEY,
            F.lit("global").alias("kind"),
            F.least(F.col("processed"), F.greatest(F.lit(limit) - F.col("prior"), F.lit(0)))
            .cast("long")
            .alias("count"),
        )
        .filter(F.col("count") > 0)
    )
    return passed.drop("rn", "prior_count"), deltas


def apply_page_limits(
    candidates: DataFrame, page_counts: DataFrame, global_limit: int | None
) -> tuple[DataFrame, DataFrame, DataFrame | None]:
    """Domain + global page caps FUSED into one window pass.

    Semantically identical to ``apply_domain_max_pages`` followed by
    ``apply_global_page_limit`` (the unit-testable reference pair above;
    equivalence pinned by tests/test_crawl_e2e.py), but physically one
    exchange + one sort instead of two: both filters need the same
    deterministic processing order, so the per-filter "requests that
    reached me" counters become running sums over ONE window frame —
    ``drn`` counts limited rows (the domain filter only processes rows
    carrying ``domain_max_pages``), ``grn`` counts domain-surviving rows
    (the reference chain applies the global filter after the domain one,
    redis_global_page_per_domain_filter.py:41-68).  page_counts is read
    once (kind pivoted in a single grouped agg, was two scans)."""
    counts = page_counts.groupBy(*PAGE_COUNT_KEY).agg(
        F.sum(F.when(F.col("kind") == "domain", F.col("count"))).alias("_pd"),
        F.sum(F.when(F.col("kind") == "global", F.col("count"))).alias("_pg"),
    )
    w = _rank_window().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    has_dlim = F.col("domain_max_pages").isNotNull() & (F.col("domain_max_pages") > 0)
    ranked = (
        candidates.join(counts, PAGE_COUNT_KEY, "left")
        .withColumn("_pd", F.coalesce("_pd", F.lit(0)))
        .withColumn("_pg", F.coalesce("_pg", F.lit(0)))
        .withColumn("_drn", F.sum(has_dlim.cast("long")).over(w))
        .withColumn(
            "_dpass",
            ~has_dlim | (F.col("_pd") + F.col("_drn") < F.col("domain_max_pages")),
        )
    )
    domain_deltas = (
        ranked.filter(has_dlim)
        .groupBy(*PAGE_COUNT_KEY)
        .agg(
            F.count("*").alias("processed"),
            F.max("_pd").alias("prior"),
            F.max("domain_max_pages").alias("limit"),
        )
        .select(
            *PAGE_COUNT_KEY,
            F.lit("domain").alias("kind"),
            F.least(F.col("processed"), F.greatest(F.col("limit") - F.col("prior"), F.lit(0)))
            .cast("long")
            .alias("count"),
        )
        .filter(F.col("count") > 0)
    )
    global_deltas = None
    if global_limit:
        ranked = ranked.withColumn("_grn", F.sum(F.col("_dpass").cast("long")).over(w))
        keep = F.col("_dpass") & (F.col("_pg") + F.col("_grn") < F.lit(global_limit))
        global_deltas = (
            ranked.filter(F.col("_dpass"))
            .groupBy(*PAGE_COUNT_KEY)
            .agg(F.count("*").alias("processed"), F.max("_pg").alias("prior"))
            .select(
                *PAGE_COUNT_KEY,
                F.lit("global").alias("kind"),
                F.least(
                    F.col("processed"),
                    F.greatest(F.lit(global_limit) - F.col("prior"), F.lit(0)),
                )
                .cast("long")
                .alias("count"),
            )
            .filter(F.col("count") > 0)
        )
    else:
        keep = F.col("_dpass")
    passed = ranked.filter(keep).drop("_pd", "_pg", "_drn", "_dpass", "_grn")
    return passed, domain_deltas, global_deltas


def apply_blacklist(candidates: DataFrame, blacklist: DataFrame) -> DataFrame:
    """Anti-join vs the (spiderid, appid, crawlid) blacklist — the
    ``"{appid}||{crawlid}" ∈ <sid>:blacklist`` member check
    (distributed_scheduler.py:403-412).  Blacklist is tiny → broadcast."""
    return candidates.join(
        F.broadcast(blacklist.select("spiderid", "appid", "crawlid").distinct()),
        ["spiderid", "appid", "crawlid"],
        "left_anti",
    )


def apply_expiry(candidates: DataFrame, now: float) -> DataFrame:
    """Drop if expires≠0 and now ≥ expires (distributed_scheduler.py:467-468)."""
    return candidates.filter((F.col("expires") == 0) | (F.lit(now) < F.col("expires")))


def apply_zk_domain_filter(
    candidates: DataFrame, domain_config: DataFrame, backlog_blacklist: bool
) -> DataFrame:
    """SCHEDULER_BACKLOG_BLACKLIST=False drops zk-blacklisted domains at
    enqueue (distributed_scheduler.py:464-466); True (default) keeps
    them backlogged and they are skipped at pop time instead
    (find_item :501-502)."""
    if backlog_blacklist:
        return candidates
    black = domain_config.filter(F.col("blacklisted")).select("domain").distinct()
    return candidates.join(F.broadcast(black), "domain", "left_anti")
