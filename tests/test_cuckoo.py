"""Cuckoo-filter sidecar tests — the DELETABLE membership structure of
the north_rule's "bloom/cuckoo" pair, A/B-verified against the plain
anti-join and exercised through insert → delete → probe cycles (the
dupefilter TTL-expiry path blooms cannot support)."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from scrapy_cluster_spark.operators import cuckoo
from scrapy_cluster_spark.schemas import SEEN_SCHEMA

_M = 1 << 10  # small tables for tests


def _sha(i) -> str:
    return hashlib.sha1(str(i).encode()).hexdigest()


def _fps(spark, ids, bucket=0):
    rows = [("link", "c1", _sha(i), 1, bucket) for i in ids]
    return spark.createDataFrame(rows, SEEN_SCHEMA)


class TestCuckooPrimitives:
    def test_build_probe_no_false_negatives(self, spark):
        filters = cuckoo.build_cuckoo(_fps(spark, range(500)), m=_M)
        cand = _fps(spark, range(400, 600)).withColumnRenamed("seen_round", "x")
        probed = cuckoo.cuckoo_probe(cand, filters, ["spiderid", "crawlid"])
        got = {r.fingerprint: r.maybe_seen for r in probed.collect()}
        for i in range(400, 500):  # genuinely inserted → MUST be maybe_seen
            assert got[_sha(i)] is True

    def test_delete_really_removes(self, spark):
        filters = cuckoo.build_cuckoo(_fps(spark, range(200)), m=_M)
        filters = cuckoo.cuckoo_delete(filters, _fps(spark, range(50)))
        row = filters.collect()[0]
        assert row.n == 150
        cand = _fps(spark, range(200))
        got = {
            r.fingerprint: r.maybe_seen
            for r in cuckoo.cuckoo_probe(cand, filters, ["spiderid"]).collect()
        }
        # survivors still present (no false negatives)
        for i in range(50, 200):
            assert got[_sha(i)] is True
        # most deleted fps now probe clean (a residual collision with a
        # survivor's fp16 in the same bucket is possible but rare)
        still = sum(1 for i in range(50) if got[_sha(i)])
        assert still <= 3

    def test_upsert_builds_missing_bucket(self, spark):
        base = cuckoo.build_cuckoo(_fps(spark, range(10), bucket=0), m=_M)
        merged = cuckoo.cuckoo_upsert(base, _fps(spark, range(10), bucket=1), m=_M)
        got = {r.bucket: r.n for r in merged.collect()}
        assert got == {0: 10, 1: 10}

    def test_anti_join_equivalence(self, spark):
        seen = _fps(spark, range(300))
        filters = cuckoo.build_cuckoo(seen, m=_M)
        cand = _fps(spark, range(250, 400))
        key = ["spiderid", "crawlid", "fingerprint", "bucket"]
        plain = {r.fingerprint for r in cand.join(seen.select(*key), key, "left_anti").collect()}
        via = {
            r.fingerprint
            for r in cuckoo.cuckoo_filtered_anti_join(cand, seen, filters, key).collect()
        }
        assert via == plain  # EXACT same survivors

    def test_saturation_degrades_safely(self, spark):
        """Overfull filter (m*slots < n) saturates; the anti-join STILL
        returns exactly the plain-join survivors."""
        tiny = 1 << 3  # 8 buckets × 4 slots = 32 capacity
        seen = _fps(spark, range(200))
        filters = cuckoo.build_cuckoo(seen, m=tiny)
        assert filters.collect()[0].saturated == 1
        cand = _fps(spark, range(150, 250))
        key = ["spiderid", "crawlid", "fingerprint", "bucket"]
        plain = {r.fingerprint for r in cand.join(seen.select(*key), key, "left_anti").collect()}
        via = {
            r.fingerprint
            for r in cuckoo.cuckoo_filtered_anti_join(cand, seen, filters, key).collect()
        }
        assert via == plain

    def test_expiry_cycle(self, spark):
        """insert round-1 fps → expire them → round-1 urls probe as new
        again (the redis EXPIRE dupefilter semantics, in place)."""
        r1, r2 = _fps(spark, range(100)), _fps(spark, range(100, 150))
        filters = cuckoo.build_cuckoo(r1, m=_M)
        filters = cuckoo.cuckoo_upsert(filters, r2)
        filters = cuckoo.cuckoo_delete(filters, r1)  # TTL expired round 1
        got = {
            r.fingerprint: r.maybe_seen
            for r in cuckoo.cuckoo_probe(_fps(spark, range(150)), filters, ["spiderid"]).collect()
        }
        assert all(got[_sha(i)] for i in range(100, 150))  # round 2 still in
        fresh = sum(1 for i in range(100) if not got[_sha(i)])
        assert fresh >= 97  # expired fps probe clean (rare fp16 collisions aside)
