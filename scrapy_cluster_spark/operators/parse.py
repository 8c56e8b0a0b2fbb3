"""Parse path: link explode, allow/deny filters, depth decay, retries.

Reference: ``LinkSpider.parse`` (crawler/crawling/spiders/link_spider.py:22-76)
gates spidering on ``curdepth < maxdepth`` (:47-52) and yields child
requests at ``priority - 10`` / ``curdepth + 1`` (:68-69); the
LinkExtractor applies allow_domains / allow / deny / deny_extensions
from request meta with deny winning (link_spider.py:55-59,
lxmlhtml.py:49-57); MetaPassthroughMiddleware copies parent meta onto
children (meta_passthrough_middleware.py:37-52).  Failed fetches are
re-enqueued by RedisRetryMiddleware with retry_times+1, priority-10,
dont_filter=True, while retry_times ≤ RETRY_TIMES=3
(redis_retry_middleware.py:9-18; settings.py:174).

All filters are per-row built-in SQL (rlike via F.exists over the
pattern arrays) — no Python in the hot path; the only UDF was the link
extraction itself, already done at fetch time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from scrapy_cluster_spark.config import EngineConfig
from scrapy_cluster_spark.functions.domains import extract_domain_udf

# parent meta copied onto children (MetaPassthroughMiddleware analog)
_INHERITED = [
    "appid",
    "crawlid",
    "spiderid",
    "maxdepth",
    "domain_max_pages",
    "allowed_domains",
    "allow_regex",
    "deny_regex",
    "deny_extensions",
    "expires",
    "useragent",
    "cookie",
    "attrs",
]


def child_candidates(items: DataFrame) -> DataFrame:
    """Successful fetches below their maxdepth → exploded child request
    rows with link filters applied.

    Input: assembled items still carrying frontier meta + links_full.
    Output: request-shaped rows (source='spider')."""
    parents = items.filter(
        F.col("success") & (F.col("curdepth") < F.col("maxdepth"))
    )
    kids = parents.select(
        *_INHERITED,
        F.col("priority"),
        F.col("curdepth"),
        F.explode("links_full").alias("link"),
    ).select(
        *_INHERITED,
        # priority decay + depth bump (link_spider.py:68-69)
        (F.col("priority") - F.lit(10)).alias("priority"),
        (F.col("curdepth") + F.lit(1)).alias("curdepth"),
        F.col("link.url").alias("url"),
    )

    kids = kids.withColumn("link_domain", extract_domain_udf(F.col("url")))

    # allowed_domains: null passes all; else link domain ∈ list
    # (LinkExtractor allow_domains, lxmlhtml.py:49-57)
    kids = kids.filter(
        F.col("allowed_domains").isNull()
        | F.array_contains(F.col("allowed_domains"), F.col("link_domain"))
    )
    # allow regex: null passes; else any pattern matches
    kids = kids.filter(
        F.col("allow_regex").isNull()
        | F.exists("allow_regex", lambda p: F.regexp_like(F.col("url"), p))
    )
    # deny regex wins
    kids = kids.filter(
        F.col("deny_regex").isNull()
        | ~F.exists("deny_regex", lambda p: F.regexp_like(F.col("url"), p))
    )
    # deny_extensions: scrapy semantics — the url ends ".<ext>"
    kids = kids.filter(
        F.col("deny_extensions").isNull()
        | ~F.exists(
            "deny_extensions",
            lambda e: F.endswith(F.col("url"), F.concat(F.lit("."), e)),
        )
    )
    return kids.withColumnRenamed("link_domain", "domain")


def wander_candidates(items: DataFrame, seed: int = 42) -> DataFrame:
    """WanderingSpider parse mode (crawler/crawling/spiders/
    wandering_spider.py:25-91): each fetched page yields exactly ONE
    followed link (reference: ``random.choice(links)``) and a ``step``
    counter carried in attrs (:52-55, :74).  No depth gate, no priority
    decay — the request keeps its priority.

    The reference's choice is nondeterministic by design; here the
    choice is a seeded hash-rank (deterministic given the seed) so two
    cluster sizes produce identical walks."""
    parents = items.filter(F.col("success"))
    kids = parents.select(
        *_INHERITED,
        F.col("priority"),
        F.col("curdepth"),
        F.explode("links_full").alias("link"),
    )
    kids = kids.withColumn("link_domain", extract_domain_udf(F.col("link.url")))
    kids = kids.filter(
        F.col("allowed_domains").isNull()
        | F.array_contains(F.col("allowed_domains"), F.col("link_domain"))
    )
    # one link per parent page: lowest seeded hash wins (a wandering
    # crawl fetches one page per step, so (crawl, depth) ≡ the page)
    from pyspark.sql import Window

    pick_w = Window.partitionBy(*_INHERITED[:3], "curdepth").orderBy(
        F.xxhash64(F.col("link.url"), F.lit(seed))
    )
    kids = (
        kids.withColumn("pick", F.row_number().over(pick_w))
        .filter(F.col("pick") == 1)
        .drop("pick")
        .select(
            *_INHERITED,
            F.col("priority"),
            (F.col("curdepth") + 1).alias("curdepth"),
            F.col("link.url").alias("url"),
            F.col("link_domain").alias("domain"),
        )
        # step counter in attrs (wandering_spider.py:55,74)
        .withColumn(
            "attrs",
            F.map_concat(
                F.coalesce("attrs", F.create_map().cast("map<string,string>")),
                F.create_map(F.lit("step"), (F.col("curdepth")).cast("string")),
            ),
        )
    )
    return kids


def retry_candidates(items: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Failed fetches → retry rows (dont_filter=True skips the dupe
    probe, distributed_scheduler.py:420)."""
    return (
        items.filter(~F.col("success"))
        .withColumn("retry_times", F.col("retry_times") + 1)
        .filter(F.col("retry_times") <= F.lit(cfg.retry_times))
        .withColumn("priority", F.col("priority") - F.lit(cfg.priority_decay))
        .withColumn("dont_filter", F.lit(True))
        .withColumn("source", F.lit("retry"))
    )
