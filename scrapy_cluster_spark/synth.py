"""Deterministic synthetic web graph → the ``pages`` input table.

BASELINE.json input_hint: ``pages(url string, warc_ts timestamp,
html binary, text string, lang string)`` — this table simulates the
web; "fetching" a URL is a join against it (SURVEY.md §2.3 "Fetch").

Properties (SURVEY.md §7 Phase 0):
- fully deterministic given (n_domains, pages_per_domain knobs) — no
  RNG state shared across rows: every page derives from crc32(domain,
  page) so generation parallelizes embarrassingly via ``mapInPandas``.
- HTML is generated *from* the link list + text, so
  ``extract_text(html) == text`` holds byte-identically by construction
  and ``extract_links(html)`` is known a priori (testable invariants).
- Zipf-ish domain sizes: domain 0 is a mega-domain, exercising the
  hot-domain salting / two-phase top-k path (north_rule skew clause).
- intra-domain B-ary link tree from page 0 (every page reachable from
  the domain root — mirrors the online e2e test's site crawl,
  crawler/tests/online.py:83-129) + deterministic cross-domain links +
  deliberate duplicate/query-permuted links to exercise the dupefilter.
"""

from __future__ import annotations

import datetime as dt
import html as html_mod
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from scrapy_cluster_spark.schemas import PAGES_SCHEMA

_WORDS = (
    "the quick brown fox jumps over lazy dog crawl frontier queue domain "
    "politeness schedule spark shuffle partition snapshot lineage bloom "
    "filter priority depth retry expire page link anchor text index web "
    "data engine batch round budget window quota salt skew merge commit"
).split()

_LANGS = ["en", "en", "en", "de", "fr", "es"]

BRANCH = 3  # intra-domain link-tree fan-out
EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def _h(s: str) -> int:
    return zlib.crc32(s.encode())


def domain_name(d: int) -> str:
    # every 7th domain uses a multi-label public suffix (PSL-awareness test)
    return f"site{d}.co.uk" if d % 7 == 3 else f"site{d}.com"


def page_url(d: int, j: int) -> str:
    return f"http://{domain_name(d)}/page/{j}"


def domain_page_counts(n_domains: int, base_pages: int, zipf_s: float = 1.1) -> list[int]:
    """Zipf-ish sizes: domain d gets ~ base_pages / (d+1)^s, min 3."""
    return [max(3, int(base_pages / (d + 1) ** zipf_s)) for d in range(n_domains)]


def page_links(d: int, j: int, counts: list[int]) -> list[str]:
    """Deterministic out-links of page (d, j)."""
    n_d = counts[d]
    out: list[str] = []
    for b in range(BRANCH):  # intra-domain tree children
        child = j * BRANCH + 1 + b
        if child < n_d:
            out.append(page_url(d, child))
    if j % 3 == 1 and len(counts) > 1:  # cross-domain link to another root
        out.append(page_url((d + j + 1) % len(counts), 0))
    if j % 5 == 2 and n_d > 1:  # query-permuted self-site link (canonicalization)
        out.append(f"http://{domain_name(d)}/page/1?b=2&a=1")
    return out


def anchor_text(d: int, j: int, k: int) -> str:
    return f"link {k} from {d}:{j}"


def build_page(d: int, j: int, counts: list[int]) -> dict:
    links = page_links(d, j, counts)
    body_lines = [f"Page {j} of {domain_name(d)}"]
    rng = np.random.RandomState(_h(f"text:{d}:{j}") % (2**31))
    for _p in range(2 + (j % 3)):
        n = 8 + int(rng.randint(0, 12))
        body_lines.append(" ".join(_WORDS[i] for i in rng.randint(0, len(_WORDS), n)))
    anchors = [anchor_text(d, j, k) for k in range(len(links))]
    # text column == extract_text(html): title block + paragraph blocks +
    # one <li> block per link (anchor text)
    text = "\n".join(body_lines + anchors)

    parts = [
        "<html><head><title>",
        html_mod.escape(body_lines[0]),
        "</title></head><body>",
    ]
    for para in body_lines[1:]:
        parts.append(f"<p>{html_mod.escape(para)}</p>")
    parts.append("<ul>")
    for href, anchor in zip(links, anchors):
        parts.append(f'<li><a href="{html_mod.escape(href)}">{html_mod.escape(anchor)}</a></li>')
    # a duplicate of the first link (in-page dedupe) and junk links (filtered)
    if links:
        parts.append(f'<li><a href="{html_mod.escape(links[0])}">dup</a></li>')
    parts.append('<li><a href="javascript:void(0)">js</a></li>')
    parts.append("</ul><script>var x=1;</script></body></html>")
    # NOTE: the duplicate-anchor <li> "dup" and "js" ARE block texts too —
    # include them in text to keep byte-identity
    text = text + ("\ndup" if links else "") + "\njs"

    html_bytes = "".join(parts).encode("utf-8")
    ts = EPOCH + dt.timedelta(seconds=(_h(f"ts:{d}:{j}") % 86400))
    return {
        "url": page_url(d, j),
        "warc_ts": ts,
        "html": html_bytes,
        "text": text,
        "lang": _LANGS[_h(f"lang:{d}:{j}") % len(_LANGS)],
    }


def generate_pages(
    spark: SparkSession,
    n_domains: int = 20,
    base_pages: int = 200,
    zipf_s: float = 1.1,
    parallelism: int | None = None,
) -> DataFrame:
    """Distributed generation: one spark.range row per page, expanded by a
    mapInPandas worker — O(pages/core), no driver materialization."""
    counts = domain_page_counts(n_domains, base_pages, zipf_s)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    total = int(offsets[-1])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for gid in pdf["id"]:
                d = int(np.searchsorted(offsets, gid, side="right") - 1)
                j = int(gid - offsets[d])
                rows.append(build_page(d, j, counts))
            yield pd.DataFrame(rows)

    rng = spark.range(total, numPartitions=parallelism or spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(gen, schema=PAGES_SCHEMA)


def seed_requests(n_domains: int, appid: str = "testapp", crawlid: str = "cid001",
                  maxdepth: int = 3, priority: int = 50) -> list[dict]:
    """One seed per domain root — the Common-Crawl-seeded frontier analog."""
    return [
        {
            "appid": appid,
            "crawlid": crawlid,
            "url": page_url(d, 0),
            "spiderid": "link",
            "priority": priority,
            "maxdepth": maxdepth,
        }
        for d in range(n_domains)
    ]
