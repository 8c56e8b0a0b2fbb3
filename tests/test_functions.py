"""Unit tests for the pandas-UDF function layer (pure-Python parts).

Mirrors the reference's offline utils/crawler unit suites
(utils/tests/test_redis_queue.py encodings, crawler fingerprint use).
"""

from scrapy_cluster_spark.functions.domains import extract_domain
from scrapy_cluster_spark.functions.html import extract_links, extract_text
from scrapy_cluster_spark.functions.url import (
    canonicalize_url,
    parse_cookie,
    request_fingerprint,
)


class TestCanonicalize:
    def test_query_sort(self):
        assert canonicalize_url("http://x.com/p?b=2&a=1") == "http://x.com/p?a=1&b=2"

    def test_fragment_dropped(self):
        assert canonicalize_url("http://x.com/p#frag") == "http://x.com/p"

    def test_case_and_default_port(self):
        assert canonicalize_url("HTTP://X.CoM:80/p") == "http://x.com/p"
        assert canonicalize_url("https://x.com:443/p") == "https://x.com/p"
        assert canonicalize_url("http://x.com:8080/p") == "http://x.com:8080/p"

    def test_empty_path(self):
        assert canonicalize_url("http://x.com") == "http://x.com/"

    def test_percent_normalization(self):
        assert canonicalize_url("http://x.com/a%2fb") == canonicalize_url("http://x.com/a%2Fb")

    def test_blank_values_kept(self):
        assert "a=" in canonicalize_url("http://x.com/p?a=&b=1")


class TestFingerprint:
    def test_equivalent_urls_same_fp(self):
        assert request_fingerprint("http://x.com/p?b=2&a=1") == request_fingerprint(
            "http://x.com/p?a=1&b=2#z"
        )

    def test_different_urls_differ(self):
        assert request_fingerprint("http://x.com/a") != request_fingerprint("http://x.com/b")

    def test_sha1_hex_shape(self):
        fp = request_fingerprint("http://x.com/a")
        assert len(fp) == 40 and int(fp, 16) >= 0


class TestDomain:
    def test_plain(self):
        assert extract_domain("http://www.site1.com/a") == "site1.com"

    def test_public_suffix(self):
        # tldextract-parity case: NOT 'co.uk'
        assert extract_domain("http://shop.example.co.uk/x") == "example.co.uk"

    def test_bare_domain(self):
        assert extract_domain("http://site3.co.uk/p") == "site3.co.uk"

    def test_no_host(self):
        assert extract_domain("") == ""
        assert extract_domain(None) == ""


class TestCookie:
    def test_reference_regex(self):
        # distributed_scheduler.py:581-592 regex behavior
        assert parse_cookie("a=1; b=2;c=3") == {"a": "1", "b": "2", "c": "3"}

    def test_empty(self):
        assert parse_cookie("") == {}
        assert parse_cookie(None) == {}


FIXTURE = b"""
<html><head><title>T</title></head><body>
<p>hello <a href="/rel">Rel</a></p>
<a href="http://other.com/x">Other</a>
<a href="http://other.com/x">DupOther</a>
<a href="HTTP://CASE.com/Y">case</a>
<a href="javascript:void(0)">js</a>
<a href="mailto:a@b.c">mail</a>
<a rel="nofollow" href="/nf">NF</a>
<area href="/area"/>
<script>var s="<a href='http://fake.com/'>x</a>";</script>
</body></html>
"""


class TestExtractLinks:
    def test_counts_and_shapes(self):
        links = extract_links(FIXTURE, "http://base.com/dir/")
        urls = [l["url"] for l in links]
        # rel resolved, dup removed, js/mailto dropped, script content ignored
        assert urls == [
            "http://base.com/rel",
            "http://other.com/x",
            "http://CASE.com/Y",  # urljoin lowercases the scheme
            "http://base.com/nf",
            "http://base.com/area",
        ]
        nf = {l["url"]: l["nofollow"] for l in links}
        assert nf["http://base.com/nf"] is True
        assert nf["http://other.com/x"] is False
        texts = {l["url"]: l["text"] for l in links}
        assert texts["http://base.com/rel"] == "Rel"

    def test_bad_html_safe(self):
        assert extract_links(b"<<<>>>", "http://b.com") == []
        assert extract_text(b"") == ""
