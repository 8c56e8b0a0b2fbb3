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

from pyspark.sql import Column, DataFrame, functions as F

from scrapy_cluster_spark.config import EngineConfig
from scrapy_cluster_spark.functions.domains import extract_domain_udf

# scrapy.linkextractors.IGNORED_EXTENSIONS (public constant, scrapy 1.x):
# when a crawl request leaves deny_extensions at its schema default null
# (kafka-monitor/plugins/scraper_schema.json:63-70), the reference's
# LxmlLinkExtractor falls back to this media/doc/archive list — null does
# NOT mean "no extension filter".  Golden-pinned by
# tests/test_golden_drudge.py (391 baseline links on the reference
# fixture requires this default to be active).
IGNORED_EXTENSIONS = [
    # images
    "mng", "pct", "bmp", "gif", "jpg", "jpeg", "png", "pst", "psp",
    "tif", "tiff", "ai", "drw", "dxf", "eps", "ps", "svg",
    # audio
    "mp3", "wma", "ogg", "wav", "ra", "aac", "mid", "au", "aiff",
    # video
    "3gp", "asf", "asx", "avi", "mov", "mp4", "mpg", "qt", "rm",
    "swf", "wmv", "m4a",
    # office suites
    "xls", "xlsx", "ppt", "pptx", "pps", "doc", "docx", "odt", "ods",
    "odg", "odp",
    # other
    "css", "pdf", "exe", "bin", "rss", "zip", "rar",
]


# Regex equivalents of urllib.parse.urlparse's host/path for http(s)
# URLs.  Spark's parse_url() is RFC-strict and THROWS on real-web URLs
# containing e.g. '|' (drudge fixture: http://news.myway.com/.../top|ap.html)
# while Python's urlparse — what scrapy/w3lib use — tolerates them, so the
# components are extracted with regexes that never fail.
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"


def _url_host(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _HOST_RE, 1))


def _url_extension(url: Column) -> Column:
    """``posixpath.splitext(urlparse(url).path)[1].lstrip('.')`` in SQL
    (w3lib url_has_any_extension semantics): the token after the LAST dot
    of the path's basename, requiring a non-dot/non-slash char before the
    dot (``/.bashrc`` and ``/a.`` have no extension), query/fragment
    excluded because only the PATH component is inspected."""
    path = F.regexp_extract(url, _PATH_RE, 1)
    # urlparse splits ';params' off the LAST path segment before splitext
    # (news.yahoo.com/....html;_ylt=... has extension 'html')
    path = F.regexp_replace(path, r";[^/]*$", "")
    return F.lower(F.regexp_extract(path, r"[^/.]\.([^./]*)$", 1))


def _passes_link_filters(url: Column, row) -> Column:
    """The four LinkExtractor gates, evaluated in scrapy's order on the
    RAW absolute url (FilteringLinkExtractor._link_allowed runs before
    canonicalization): allow regex → deny regex → allowed_domains
    (host-suffix match via url_is_from_any_domain: host == d or host
    endswith '.d' — NOT registered-domain equality, so
    allowed_domains=['www.foo.com'] admits only that exact host) →
    deny_extensions (null → IGNORED_EXTENSIONS default).  Empty arrays
    are falsy in scrapy and pass everything, same as null here."""
    host = _url_host(url)
    allowed = row["allowed_domains"]
    allow_re = row["allow_regex"]
    deny_re = row["deny_regex"]
    deny_ext = F.when(
        row["deny_extensions"].isNull(),
        F.array(*[F.lit(e) for e in IGNORED_EXTENSIONS]),
    ).otherwise(row["deny_extensions"])

    def _empty(arr: Column) -> Column:
        return arr.isNull() | (F.size(arr) == 0)

    cond = _empty(allow_re) | F.exists(
        allow_re, lambda p: F.regexp_like(url, p)
    )
    cond = cond & (
        _empty(deny_re) | ~F.exists(deny_re, lambda p: F.regexp_like(url, p))
    )
    cond = cond & (
        _empty(allowed)
        | F.exists(
            allowed,
            lambda d: (host == F.lower(d))
            | host.endswith(F.concat(F.lit("."), F.lower(d))),
        )
    )
    cond = cond & ~F.array_contains(deny_ext, _url_extension(url))
    return cond

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


def child_candidates(items: DataFrame, rank_boost: DataFrame | None = None) -> DataFrame:
    """Successful fetches below their maxdepth → exploded child request
    rows with link filters applied.

    Input: assembled items still carrying frontier meta + links_full.
    Output: request-shaped rows (source='spider').

    ``rank_boost`` (optional, (url, rank_boost int)): OPIC-style link
    centrality (operators/rank_signal.py) — children add the boost of
    the PARENT page that discovered them on top of the reference's
    priority decay, so links found on important pages pop earlier
    within the same politeness budget.  None (default) is the exact
    reference semantics."""
    parents = items.filter(
        F.col("success") & (F.col("curdepth") < F.col("maxdepth"))
    )
    boost = F.lit(0)
    if rank_boost is not None:
        parents = parents.join(rank_boost, "url", "left")
        boost = F.coalesce("rank_boost", F.lit(0))
    kids = parents.select(
        *_INHERITED,
        F.col("priority"),
        F.col("curdepth"),
        boost.alias("_boost"),
        F.explode("links_full").alias("link"),
    ).select(
        *_INHERITED,
        # priority decay + depth bump (link_spider.py:68-69), plus the
        # optional parent-centrality boost
        (F.col("priority") - F.lit(10) + F.col("_boost")).alias("priority"),
        (F.col("curdepth") + F.lit(1)).alias("curdepth"),
        F.col("link.url").alias("url"),
    )

    # LinkExtractor gates (lxmlhtml.py:49-57, golden-pinned by
    # tests/test_golden_drudge.py) — one fused filter, no Python
    kids = kids.filter(
        _passes_link_filters(
            F.col("url"),
            {c: F.col(c) for c in
             ("allowed_domains", "allow_regex", "deny_regex", "deny_extensions")},
        )
    )
    return kids.withColumn("domain", extract_domain_udf(F.col("url")))


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
    # same four LinkExtractor gates as link-spider (wandering_spider.py:64)
    kids = kids.filter(
        _passes_link_filters(
            F.col("link.url"),
            {c: F.col(c) for c in
             ("allowed_domains", "allow_regex", "deny_regex", "deny_extensions")},
        )
    )
    kids = kids.withColumn("link_domain", extract_domain_udf(F.col("link.url")))
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
    from scrapy_cluster_spark.operators.ingest import bucket_expr

    return (
        items.filter(~F.col("success"))
        .withColumn("retry_times", F.col("retry_times") + 1)
        .filter(F.col("retry_times") <= F.lit(cfg.retry_times))
        .withColumn("priority", F.col("priority") - F.lit(cfg.priority_decay))
        .withColumn("dont_filter", F.lit(True))
        .withColumn("source", F.lit("retry"))
        # items rows do not carry the frontier's physical partition key —
        # recompute it or retry rows land in the null partition and lose
        # bucket pruning (surfaced by the partial frontier merge)
        .withColumn("bucket", bucket_expr("domain", cfg.frontier_buckets))
    )
