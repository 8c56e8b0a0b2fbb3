"""Golden link-extraction census on the reference's own fixture.

Port of /root/reference/crawler/tests/test_link_spider.py:57-91: the
reference parses tests/drudge.html (vendored verbatim at
tests/fixtures/drudge.html — public 2016 drudgereport.com snapshot, test
DATA) through LinkSpider.parse and asserts the request census under each
LinkExtractor filter:

    maxdepth gate            -> 0 child requests
    no filters               -> 391
    allowed_domains=[foxnews.com] -> 4
    allow_regex=['.*shock.*']     -> 1
    deny_regex=['.*.com.*']       -> 43
    deny_extensions=['html']      -> 329

Here the same page flows through the REAL engine path: extract_links_udf
(fetch-time link extraction) -> operators.parse.child_candidates (the
four filter gates) -> canonical-url dedup (scrapy's unique=True dedups on
the canonicalized url; in this engine that dedup lives in the
dupefilter's fingerprint, so the census counts distinct canonical urls).
The 391 baseline only holds when deny_extensions=null activates scrapy's
default IGNORED_EXTENSIONS list and extensions are taken from the URL
path via splitext semantics — both golden-pinned by this test.
"""

from __future__ import annotations

import pathlib

import pytest
from pyspark.sql import functions as F, types as T

from scrapy_cluster_spark.functions.html import extract_links_udf
from scrapy_cluster_spark.functions.url import canonicalize_url_udf
from scrapy_cluster_spark.operators.parse import child_candidates

FIXTURE = pathlib.Path(__file__).parent / "fixtures" / "drudge.html"

_ITEM_SCHEMA = T.StructType(
    [
        T.StructField("appid", T.StringType()),
        T.StructField("crawlid", T.StringType()),
        T.StructField("spiderid", T.StringType()),
        T.StructField("maxdepth", T.IntegerType()),
        T.StructField("domain_max_pages", T.IntegerType()),
        T.StructField("allowed_domains", T.ArrayType(T.StringType())),
        T.StructField("allow_regex", T.ArrayType(T.StringType())),
        T.StructField("deny_regex", T.ArrayType(T.StringType())),
        T.StructField("deny_extensions", T.ArrayType(T.StringType())),
        T.StructField("expires", T.LongType()),
        T.StructField("useragent", T.StringType()),
        T.StructField("cookie", T.StringType()),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
        T.StructField("priority", T.IntegerType()),
        T.StructField("curdepth", T.IntegerType()),
        T.StructField("success", T.BooleanType()),
        T.StructField("url", T.StringType()),
        T.StructField("html", T.BinaryType()),
    ]
)


def _items(spark, **meta):
    # mirrors test_link_spider.py get_meta() defaults
    row = dict(
        appid="myapp",
        crawlid="abc123",
        spiderid="link",
        maxdepth=1,
        domain_max_pages=None,
        allowed_domains=None,
        allow_regex=None,
        deny_regex=None,
        deny_extensions=None,
        expires=0,
        useragent=None,
        cookie=None,
        attrs={},
        priority=0,
        curdepth=0,
        success=True,
        url="http://www.drudgereport.com",
        html=FIXTURE.read_bytes(),
    )
    row.update(meta)
    df = spark.createDataFrame([row], _ITEM_SCHEMA)
    # reference: HtmlResponse('drudge.url', ...) -> urljoin base 'drudge.url'
    return df.withColumn(
        "links_full", extract_links_udf(F.col("html"), F.lit("drudge.url"))
    )


def _census(spark, **meta) -> int:
    kids = child_candidates(_items(spark, **meta))
    # scrapy LinkExtractor unique=True dedups on the canonical url
    return (
        kids.select(canonicalize_url_udf(F.col("url")).alias("cu"))
        .distinct()
        .count()
    )


def test_too_deep_yields_no_children(spark):
    assert _census(spark, maxdepth=1, curdepth=1) == 0


def test_baseline_391_links(spark):
    assert _census(spark) == 391


def test_allowed_domains_4(spark):
    assert _census(spark, allowed_domains=["foxnews.com"]) == 4


def test_allow_regex_1(spark):
    assert _census(spark, allow_regex=[".*shock.*"]) == 1


def test_deny_regex_43(spark):
    assert _census(spark, deny_regex=[".*.com.*"]) == 43


def test_deny_extensions_329(spark):
    assert _census(spark, deny_extensions=["html"]) == 329


def test_child_meta_decay(spark):
    """priority-10 / curdepth+1 on every child (link_spider.py:68-69)."""
    kids = child_candidates(_items(spark, priority=70)).select(
        "priority", "curdepth"
    ).distinct()
    rows = kids.collect()
    assert len(rows) == 1
    assert rows[0]["priority"] == 60
    assert rows[0]["curdepth"] == 1
