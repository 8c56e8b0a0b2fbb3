"""URL-seen probe — the distributed dupefilter.

Reference: ``RFPDupeFilter.request_seen`` SADDs the request fingerprint
into ``<sid>:dupefilter:<crawlid>`` and reports membership
(crawler/crawling/redis_dupefilter.py:22-29); the scheduler skips the
probe entirely for ``dont_filter`` requests
(distributed_scheduler.py:420).  The fingerprint is added *even if a
later filter drops the request* — the probe is also the insert.

Spark: a left-anti join of candidates against the ``seen`` table on
(spiderid, crawlid, fingerprint).  ``dont_filter`` rows bypass the
probe and are NOT inserted into seen (faithful to :420).

Scale path (10^10 seen rows): the anti-join shuffles both sides on the
join key.  Two mitigations, both preserving exact semantics:
  1. both tables carry the same domain-hash ``bucket`` column; adding it
     to the join key turns the exchange into co-partitioned work and (on
     real Iceberg with bucket-partitioned tables) storage-partitioned
     joins skip the shuffle entirely — candidates for a domain only
     ever probe that domain's bucket.
  2. a per-bucket bloom sidecar (operators/bloom.py) pre-filters
     candidates before the exact anti-join; only bloom *hits* (possible
     dupes) reach the join, and at crawl frontier hit-rates the join
     input shrinks by ~the dup ratio.  Bloom misses are definitively
     new.  (north_rule: "bloom/cuckoo membership built and merged
     per-partition via vectorized Arrow UDFs".)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SEEN_KEY = ["spiderid", "crawlid", "fingerprint"]


def split_new_vs_seen(
    candidates: DataFrame, seen: DataFrame, use_bucket: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Returns (new, dupes) for probe-subject candidates; the caller
    routes dont_filter rows around this."""
    key = SEEN_KEY + (["bucket"] if use_bucket and "bucket" in seen.columns else [])
    seen_keys = seen.select(*key)
    new = candidates.join(seen_keys, key, "left_anti")
    dupes = candidates.join(seen_keys, key, "left_semi")
    return new, dupes


def apply_dupefilter(
    candidates: DataFrame, seen: DataFrame, blooms: DataFrame | None = None,
    cuckoos: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Full dupefilter pass.

    Returns (passed, seen_inserts):
      passed       = dont_filter rows + rows whose fp was unseen
      seen_inserts = the unseen fps (to append to ``seen``) — inserted
                     regardless of later page-limit/blacklist drops,
                     matching request_seen's SADD-on-probe.

    With ``blooms`` (per-bucket sidecars, operators/bloom.py) the probe
    pre-filters via the bloom pass and only bloom hits reach the exact
    anti-join — identical output, a fraction of the shuffle.  With
    ``cuckoos`` (operators/cuckoo.py) the same contract routes through
    the deletable cuckoo sidecar instead; cuckoo wins when retention
    must REMOVE expired fingerprints without a full sidecar rebuild.
    """
    probed = candidates.filter(~F.col("dont_filter"))
    bypass = candidates.filter(F.col("dont_filter"))
    if cuckoos is not None:
        from scrapy_cluster_spark.operators.cuckoo import cuckoo_filtered_anti_join

        new = cuckoo_filtered_anti_join(probed, seen, cuckoos, SEEN_KEY + ["bucket"])
        new = new.select(*probed.columns)
    elif blooms is not None:
        from scrapy_cluster_spark.operators.bloom import bloom_filtered_anti_join

        new = bloom_filtered_anti_join(probed, seen, blooms, SEEN_KEY + ["bucket"])
        new = new.select(*probed.columns)
    else:
        new, _dupes = split_new_vs_seen(probed, seen)
    return bypass.unionByName(new), new
