"""Bloom sidecar tests — north_rule's per-partition membership
structure, A/B-verified against the plain anti-join (SURVEY.md §7
Phase 4)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from scrapy_cluster_spark.config import EngineConfig
from scrapy_cluster_spark.operators import bloom
from scrapy_cluster_spark.plans.crawl import feed_requests, run_crawl
from scrapy_cluster_spark.schemas import SEEN_SCHEMA
from scrapy_cluster_spark.synth import seed_requests


def _fps(spark, ids, bucket=0):
    import hashlib

    rows = [
        ("link", "c1", hashlib.sha1(str(i).encode()).hexdigest(), 1, bucket)
        for i in ids
    ]
    return spark.createDataFrame(rows, SEEN_SCHEMA)


class TestBloomPrimitives:
    def test_build_probe_no_false_negatives(self, spark):
        seen = _fps(spark, range(500))
        blooms = bloom.build_delta_blooms(seen, m_bits=1 << 16, k=5)
        cand = _fps(spark, range(400, 600)).withColumnRenamed("seen_round", "x")
        probed = bloom.bloom_probe(cand, blooms, ["spiderid", "crawlid"])
        got = {r.fingerprint: r.maybe_seen for r in probed.collect()}
        import hashlib

        for i in range(400, 500):  # genuinely seen → MUST be maybe_seen
            assert got[hashlib.sha1(str(i).encode()).hexdigest()] is True

    def test_merge_is_or(self, spark):
        b1 = bloom.build_delta_blooms(_fps(spark, range(100)), m_bits=1 << 16)
        b2 = bloom.build_delta_blooms(_fps(spark, range(100, 200)), m_bits=1 << 16)
        merged = bloom.merge_blooms(b1.unionByName(b2)).collect()[0]
        bits = np.frombuffer(merged.bits, dtype=np.uint8)
        bits1 = np.frombuffer(b1.collect()[0].bits, dtype=np.uint8)
        assert merged.n == 200
        assert ((bits & bits1) == bits1).all()  # superset of each delta

    def test_anti_join_equivalence(self, spark):
        seen = _fps(spark, range(300))
        blooms = bloom.build_delta_blooms(seen, m_bits=1 << 16)
        cand = _fps(spark, range(250, 400))
        key = ["spiderid", "crawlid", "fingerprint", "bucket"]
        plain = {r.fingerprint for r in cand.join(seen.select(*key), key, "left_anti").collect()}
        via_bloom = {
            r.fingerprint
            for r in bloom.bloom_filtered_anti_join(cand, seen, blooms, key).collect()
        }
        assert via_bloom == plain  # EXACT same survivors


class TestBloomInRound:
    def test_crawl_identical_with_and_without_bloom(self, spark, pages):
        """A/B: the full crawl produces byte-identical fetch sequences and
        crawled sets with the bloom path on vs off."""
        import shutil
        import tempfile

        from scrapy_cluster_spark.schemas import CRAWLED_SCHEMA, FETCH_LOG_SCHEMA
        from scrapy_cluster_spark.store import SnapshotStore

        outs = {}
        for use_bloom in (False, True):
            cfg = EngineConfig(use_bloom=use_bloom, bloom_m_bits=1 << 16)
            tmp = tempfile.mkdtemp(prefix=f"scs-bloom-{use_bloom}-")
            store = SnapshotStore(spark, tmp)
            feed_requests(store, seed_requests(3, maxdepth=2), cfg)
            run_crawl(store, pages, cfg, max_rounds=10)
            outs[use_bloom] = (
                sorted(
                    (r.domain, r.round, r.slot_ts, r.url)
                    for r in store.read("fetch_log", FETCH_LOG_SCHEMA).collect()
                ),
                sorted(
                    (r.url, r.round)
                    for r in store.read("crawled", CRAWLED_SCHEMA).collect()
                ),
            )
            shutil.rmtree(tmp, ignore_errors=True)
        assert outs[False] == outs[True]
