"""robots.txt rule cache + filter (north_star requirement).

The reference does not obey robots (Scrapy's ROBOTSTXT_OBEY is not
enabled in crawler/crawling/settings.py), but BASELINE.json north_star
specifies a scheduler that "filters by robots.txt rules cached per
domain", so the rebuild adds it as a first-class operator with an
empty-table no-op default (keeping reference parity when unused).

Model: a ``robots_rules`` table (domain, disallow_prefix) — the cached,
parsed form of each domain's robots.txt (one row per Disallow line,
user-agent '*').  The filter drops candidates whose url *path* starts
with a disallowed prefix.  The rule table is small (one digest per
domain) → broadcast; matching is built-in SQL (startswith on the
parsed path), no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType, StructField, StructType

ROBOTS_SCHEMA = StructType(
    [
        StructField("domain", StringType()),
        StructField("disallow_prefix", StringType()),
    ]
)

def _path_expr():
    # url path: strip scheme://host — the frontier only holds http(s)
    # urls, so cut at the first '/' after the authority.
    return F.regexp_extract(F.col("url"), r"^[a-z]+://[^/]+(/.*)?$", 1)


def apply_robots(candidates: DataFrame, robots_rules: DataFrame) -> DataFrame:
    """Drop candidates disallowed by their domain's cached rules."""
    rules = (
        robots_rules.groupBy("domain")
        .agg(F.collect_list("disallow_prefix").alias("disallow"))
    )
    joined = candidates.join(F.broadcast(rules), "domain", "left")
    # a URL with no path component is the root: '' → '/' (so
    # 'Disallow: /' blocks http://a.com too; regexp_extract returns ''
    # not null on no-match, hence when(), not coalesce())
    raw = _path_expr()
    path = F.when(raw == "", F.lit("/")).otherwise(raw)
    blocked = F.exists("disallow", lambda p: F.startswith(path, p))
    return joined.filter(F.col("disallow").isNull() | ~blocked).drop("disallow")
