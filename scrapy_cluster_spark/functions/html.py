"""HTML link + text extraction (stdlib ``html.parser``-based).

Parity target: the reference's lxml routine at
/root/reference/crawler/crawling/spiders/lxmlhtml.py:18-46 —
iterate ``<a>``/``<area>`` elements, take ``@href``, strip whitespace,
``urljoin(base_url, href)``, anchor text = the element's string value
(concatenated descendant text), record the ``rel=nofollow`` flag, and
de-duplicate within the page (LinkExtractor ``unique=True``,
link_spider.py:55-59).  Encoding errors are ignored
(lxmlhtml.py:38-40 → ``to_native_str(..., errors='ignore')``).

lxml is not installed in this environment; the extractor below is a
from-scratch ``html.parser`` implementation of the same contract.  The
synthetic pages generator (synth.py) emits HTML whose link list and text
are known a priori, so the byte-identical-text invariant
(BASELINE.json input_hint) is asserted by construction AND the golden
link-count test (SURVEY.md §5 item 1) pins filter behavior.

``extract_text``: concatenation of the text content of block elements
(title/h1-h6/p/li), one per line, whitespace-stripped — the deterministic
"reference extraction" contract for the pages table: for every url,
``extract_text(html) == text`` byte-for-byte.
"""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    StringType,
    StructField,
    StructType,
)

_SKIP_CONTENT = {"script", "style"}
_TEXT_BLOCKS = {"title", "h1", "h2", "h3", "h4", "h5", "h6", "p", "li"}


class _LinkTextParser(HTMLParser):
    """One pass: collects links (a/area@href + anchor text + nofollow)
    and block-level text."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.links: list[tuple[str, str, bool]] = []  # href, text, nofollow
        self.blocks: list[str] = []
        self._skip_depth = 0
        self._anchor: list[list[str]] | None = None
        self._anchor_href: str | None = None
        self._anchor_nofollow = False
        self._block: list[str] | None = None

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_CONTENT:
            self._skip_depth += 1
            return
        if tag in ("a", "area"):
            d = dict(attrs)
            href = d.get("href")
            if href is not None:
                self._flush_anchor()
                self._anchor = [[]]
                self._anchor_href = href
                self._anchor_nofollow = "nofollow" in (d.get("rel") or "")
        if tag in _TEXT_BLOCKS:
            self._flush_block()
            self._block = []

    def handle_endtag(self, tag):
        if tag in _SKIP_CONTENT:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag in ("a", "area"):
            self._flush_anchor()
        if tag in _TEXT_BLOCKS:
            self._flush_block()

    def handle_data(self, data):
        if self._skip_depth:
            return
        if self._anchor is not None:
            self._anchor[0].append(data)
        if self._block is not None:
            self._block.append(data)

    def _flush_anchor(self):
        if self._anchor is not None and self._anchor_href is not None:
            text = "".join(self._anchor[0])
            self.links.append((self._anchor_href, text, self._anchor_nofollow))
        self._anchor = None
        self._anchor_href = None
        self._anchor_nofollow = False

    def _flush_block(self):
        if self._block is not None:
            txt = "".join(self._block).strip()
            if txt:
                self.blocks.append(txt)
        self._block = None

    def close(self):
        self._flush_anchor()
        self._flush_block()
        super().close()


def _decode(html: bytes | str, encoding: str = "utf-8") -> str:
    if isinstance(html, (bytes, bytearray)):
        return bytes(html).decode(encoding or "utf-8", errors="ignore")
    return html or ""


def extract_links(html: bytes | str, base_url: str, encoding: str = "utf-8") -> list[dict]:
    """lxmlhtml.py:18-46 contract: list of {url, text, nofollow}, hrefs
    stripped + joined against base_url, de-duplicated by resolved url."""
    parser = _LinkTextParser()
    try:
        parser.feed(_decode(html, encoding))
        parser.close()
    except Exception:
        return []
    seen: set[str] = set()
    out: list[dict] = []
    for href, text, nofollow in parser.links:
        href = href.strip()
        if not href or href.startswith(("javascript:", "mailto:", "#")):
            continue
        url = urljoin(base_url or "", href)
        if not url.startswith(("http://", "https://")):
            continue
        if url in seen:  # in-page dedupe, LinkExtractor unique=True
            continue
        seen.add(url)
        out.append({"url": url, "text": text.strip(), "nofollow": nofollow})
    return out


def extract_text(html: bytes | str, encoding: str = "utf-8") -> str:
    """Deterministic reference text extraction: block texts joined by \\n."""
    parser = _LinkTextParser()
    try:
        parser.feed(_decode(html, encoding))
        parser.close()
    except Exception:
        return ""
    return "\n".join(parser.blocks)


LINKS_UDF_SCHEMA = ArrayType(
    StructType(
        [
            StructField("url", StringType()),
            StructField("text", StringType()),
            StructField("nofollow", BooleanType()),
        ]
    )
)


@F.pandas_udf(LINKS_UDF_SCHEMA)
def extract_links_udf(html: pd.Series, base_url: pd.Series) -> pd.Series:
    return pd.Series(
        [
            extract_links(h, b) if h is not None else []
            for h, b in zip(html, base_url)
        ]
    )


@F.pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(lambda h: extract_text(h) if h is not None else None)
