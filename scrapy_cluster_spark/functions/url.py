"""URL canonicalization + request fingerprinting.

Parity targets (public behavior, reimplemented from scratch — no scrapy
/ w3lib in this environment):

- ``canonicalize_url`` mirrors w3lib's documented canonical form used by
  scrapy's request fingerprinting: lowercase scheme+host, strip default
  port, sort query parameters (blank values kept), normalize
  percent-encoding, drop the fragment, empty path → "/".
- ``request_fingerprint`` mirrors scrapy's
  ``request_fingerprint(request)``: SHA1 over (method, canonical URL,
  body) — the dupefilter member format at
  /root/reference/crawler/crawling/redis_dupefilter.py:23 ("fp =
  request_fingerprint(request)"; SADD of fp hex at :26).

All UDFs are Arrow-batched pandas UDFs (SURVEY.md §2.8 items 1 and 6).
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import parse_qsl, quote, unquote, urlparse, urlunparse

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import MapType, StringType

# RFC 3986 unreserved + sub-delims + path chars; mirrors w3lib _safe_chars.
_SAFE_PATH = "!$&'()*+,;=:@/~-._"
_SAFE_QUERY = "!$&'()*+,;=:@/~-._"

_DEFAULT_PORTS = {"http": 80, "https": 443, "ftp": 21}


def _norm_component(value: str, safe: str) -> str:
    """Unquote then requote — collapses %-encoding variants to one form."""
    return quote(unquote(value), safe=safe)


def canonicalize_url(url: str) -> str:
    if url is None:
        return None
    url = url.strip()
    try:
        parts = urlparse(url)
    except ValueError:
        return url
    scheme = (parts.scheme or "http").lower()
    host = (parts.hostname or "").lower()
    netloc = host
    if parts.port is not None and parts.port != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{parts.port}"
    if parts.username:
        cred = parts.username + (f":{parts.password}" if parts.password else "")
        netloc = f"{cred}@{netloc}"
    path = _norm_component(parts.path, _SAFE_PATH) or "/"
    # sorted query params, keep blank values (w3lib keep_blank_values=True)
    pairs = parse_qsl(parts.query, keep_blank_values=True)
    pairs.sort()
    query = "&".join(
        f"{quote(k, safe=_SAFE_QUERY)}={quote(v, safe=_SAFE_QUERY)}" for k, v in pairs
    )
    params = _norm_component(parts.params, _SAFE_PATH)
    return urlunparse((scheme, netloc, path, params, query, ""))  # fragment dropped


def request_fingerprint(url: str, method: str = "GET", body: bytes = b"") -> str:
    """SHA1 hex over method + canonical url + body (scrapy-compatible shape)."""
    h = hashlib.sha1()
    h.update(method.encode())
    h.update(canonicalize_url(url).encode("utf-8", "ignore"))
    h.update(body or b"")
    return h.hexdigest()


# --- pandas UDFs -----------------------------------------------------------

@F.pandas_udf(StringType())
def canonicalize_url_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: canonicalize_url(u) if u is not None else None)


@F.pandas_udf(StringType())
def fingerprint_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: request_fingerprint(u) if u is not None else None)


# Cookie-string → map, mirroring the scheduler's regex
# ``([^=]+)=([^\;]+);?\s?`` at distributed_scheduler.py:581-592.
_COOKIE_RE = re.compile(r"([^=]+)=([^\;]+);?\s?")


def parse_cookie(cookie: str) -> dict:
    if not cookie:
        return {}
    return {k.strip(): v for k, v in _COOKIE_RE.findall(cookie)}


@F.pandas_udf(MapType(StringType(), StringType()))
def parse_cookie_udf(cookies: pd.Series) -> pd.Series:
    return cookies.map(lambda c: parse_cookie(c) if c else None)
