"""Crawl-request ingest: validation, default injection, frontier rows.

Reference: kafka-monitor validates each incoming JSON against a Draft-4
schema and injects schema defaults (kafka_monitor.py:230-249, applied at
:287); invalid messages are counted as failures, not errors
(:298-314).  The crawl plugin then tld-extracts the domain and pushes
into the per-domain Redis zset (plugins/scraper_handler.py:35-64),
setting a ``timeout:<sid>:<aid>:<cid>`` key when ``expires`` ≠ 0
(:54-59).

Spark: ``from_json``-shaped rows → ``coalesce`` defaults + boolean
constraint filter (valid/invalid split), then a projection adding the
scheduler-private meta fields, registered domain, fingerprint, and the
domain-hash bucket that is the frontier's physical partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from scrapy_cluster_spark.config import DEFAULT_CONFIG, EngineConfig, REQUEST_CONSTRAINTS
from scrapy_cluster_spark.functions.domains import extract_domain_udf
from scrapy_cluster_spark.functions.url import fingerprint_udf
from scrapy_cluster_spark.schemas import FRONTIER_SCHEMA, REQUEST_SCHEMA


def normalize_requests(df: DataFrame) -> DataFrame:
    """Project arbitrary request input onto REQUEST_SCHEMA (missing
    columns become nulls — the two-serialization problem of the
    reference, SURVEY.md §1.3, normalized to one shape)."""
    cols = []
    have = set(df.columns)
    for f in REQUEST_SCHEMA.fields:
        if f.name in have:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def validate_requests(
    df: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG
) -> tuple[DataFrame, DataFrame]:
    """Inject scraper_schema.json defaults, split valid/invalid.

    Returns (valid, invalid).  Constraint set mirrors
    scraper_schema.json:1-98 (appid len 3-40, crawlid len 1-40, priority
    1-100, maxdepth 0-3, domain_max_pages 0-2000, url required).
    """
    df = normalize_requests(df)
    df = (
        df.withColumn("spiderid", F.coalesce("spiderid", F.lit(cfg.default_spiderid)))
        .withColumn("priority", F.coalesce("priority", F.lit(cfg.default_priority)))
        .withColumn("maxdepth", F.coalesce("maxdepth", F.lit(cfg.default_maxdepth)))
        .withColumn("expires", F.coalesce("expires", F.lit(0)))
    )
    c = REQUEST_CONSTRAINTS
    ok = (
        F.col("url").isNotNull()
        & F.col("appid").isNotNull()
        & F.col("crawlid").isNotNull()
        & F.length("appid").between(c["appid"]["min_len"], c["appid"]["max_len"])
        & F.length("crawlid").between(c["crawlid"]["min_len"], c["crawlid"]["max_len"])
        & F.col("priority").between(c["priority"]["min"], c["priority"]["max"])
        & F.col("maxdepth").between(c["maxdepth"]["min"], c["maxdepth"]["max"])
        & (
            F.col("domain_max_pages").isNull()
            | F.col("domain_max_pages").between(
                c["domain_max_pages"]["min"], c["domain_max_pages"]["max"]
            )
        )
    )
    return df.filter(ok), df.filter(~F.coalesce(ok, F.lit(False)))


def bucket_expr(domain_col: str, n_buckets: int):
    """Domain-hash bucket — the frontier's physical partition key.
    hash() is Spark's Murmur3: stable across executors and runs."""
    return F.pmod(F.hash(F.col(domain_col)), F.lit(n_buckets)).cast("int")


def to_frontier_rows(
    df: DataFrame,
    round_id: int,
    cfg: EngineConfig = DEFAULT_CONFIG,
    source: str = "feed",
) -> DataFrame:
    """Request rows → frontier rows (domain, fingerprint, bucket, meta).

    Mirrors scraper_handler.py:42-51 (tldextract + zadd) plus the
    scheduler-private defaults curdepth=0/retry_times=0
    (distributed_scheduler.py:564-568).
    """
    out = df
    defaults = {
        "curdepth": F.lit(0),
        "retry_times": F.lit(0),
        "dont_filter": F.lit(False),
        "source": F.lit(source),
    }
    for name, default in defaults.items():
        if name in out.columns:
            out = out.withColumn(name, F.coalesce(F.col(name), default))
        else:
            out = out.withColumn(name, default)
    if "domain" not in out.columns:
        out = out.withColumn("domain", extract_domain_udf(F.col("url")))
    if "fingerprint" not in out.columns:
        out = out.withColumn("fingerprint", fingerprint_udf(F.col("url")))
    out = out.withColumn("bucket", bucket_expr("domain", cfg.frontier_buckets))
    out = out.withColumn("inserted_round", F.lit(round_id).cast("long"))
    return out.select(*[f.name for f in FRONTIER_SCHEMA.fields])


def route_feed(df: DataFrame) -> dict[str, DataFrame]:
    """Plugin routing for a mixed inbound feed.

    The kafka-monitor routes each message to the first plugin whose
    schema validates, with plugins ordered by priority: scraper (has
    ``url``), action (has ``action`` + ``crawlid``), stats (has
    ``stats``), zookeeper (has ``domain`` + ``action``)
    (kafka_monitor.py:270-314, plugin ordering :62-91; discriminators
    per kafka-monitor/plugins/*_schema.json).  DataFrame split on the
    same discriminating fields, in the same precedence order."""
    cols = set(df.columns)

    def has(c):
        return F.col(c).isNotNull() if c in cols else F.lit(False)

    is_crawl = has("url")
    is_zk = ~is_crawl & has("action") & has("domain")
    is_action = ~is_crawl & ~is_zk & has("action")
    is_stats = ~is_crawl & ~is_zk & ~is_action & has("stats")
    return {
        "crawl": df.filter(is_crawl),
        "zk": df.filter(is_zk),
        "action": df.filter(is_action),
        "stats": df.filter(is_stats),
        "invalid": df.filter(~is_crawl & ~is_zk & ~is_action & ~is_stats),
    }


def extract_crawl_jobs(valid: DataFrame) -> DataFrame:
    """Requests with expires≠0 → crawl_jobs rows (the ``timeout:`` key
    analog, scraper_handler.py:54-59)."""
    return (
        valid.filter(F.col("expires") != 0)
        .select("spiderid", "appid", "crawlid", "expires")
        .distinct()
    )
