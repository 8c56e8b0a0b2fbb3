"""Resume-from-snapshot — §5 test 11 / north_rule checkpoint clause.

Kill after round k, restart, and the continued run must produce output
identical to an uninterrupted run (crawled set, frontier, ordering).
"""

import shutil
import tempfile

from scrapy_cluster_spark.config import EngineConfig
from scrapy_cluster_spark.plans.crawl import feed_requests, run_crawl
from scrapy_cluster_spark.schemas import CRAWLED_SCHEMA, FETCH_LOG_SCHEMA
from scrapy_cluster_spark.store import SnapshotStore
from scrapy_cluster_spark.synth import seed_requests

CFG = EngineConfig()


def _fetch_sequence(store):
    """Deterministic per-domain pop sequence: (domain, round, slot, url)."""
    return sorted(
        (r["domain"], r["round"], r["slot_ts"], r["url"])
        for r in store.read("fetch_log", FETCH_LOG_SCHEMA).collect()
    )


def _crawled_set(store):
    return sorted(
        (r["url"], r["round"], r["success"])
        for r in store.read("crawled", CRAWLED_SCHEMA).collect()
    )


def test_resume_matches_uninterrupted(spark, pages):
    seeds = seed_requests(4, maxdepth=1)

    # run A: uninterrupted
    dir_a = tempfile.mkdtemp(prefix="scs-resume-a-")
    store_a = SnapshotStore(spark, dir_a)
    feed_requests(store_a, seeds, CFG)
    run_crawl(store_a, pages, CFG, max_rounds=20)

    # run B: stop after 2 rounds ("kill"), then a fresh driver resumes
    dir_b = tempfile.mkdtemp(prefix="scs-resume-b-")
    store_b = SnapshotStore(spark, dir_b)
    feed_requests(store_b, seeds, CFG)
    run_crawl(store_b, pages, CFG, max_rounds=2)
    store_b2 = SnapshotStore(spark, dir_b)  # new handle = new process
    run_crawl(store_b2, pages, CFG, max_rounds=20, resume=True)

    assert _fetch_sequence(store_a) == _fetch_sequence(store_b2)
    assert _crawled_set(store_a) == _crawled_set(store_b2)

    shutil.rmtree(dir_a, ignore_errors=True)
    shutil.rmtree(dir_b, ignore_errors=True)


def test_resume_ignores_partial_round(spark, pages):
    """A crash mid-round leaves table versions newer than the last
    lineage row; the resumed run must re-run the round from the pinned
    versions and converge to the same result."""
    seeds = seed_requests(3, maxdepth=1)

    dir_a = tempfile.mkdtemp(prefix="scs-crash-a-")
    store_a = SnapshotStore(spark, dir_a)
    feed_requests(store_a, seeds, CFG)
    run_crawl(store_a, pages, CFG, max_rounds=10)

    dir_b = tempfile.mkdtemp(prefix="scs-crash-b-")
    store_b = SnapshotStore(spark, dir_b)
    feed_requests(store_b, seeds, CFG)
    run_crawl(store_b, pages, CFG, max_rounds=1)
    # simulate a crash mid-round-2: partial writes land, lineage row doesn't
    frontier = store_b.read("frontier", __import__("scrapy_cluster_spark.schemas", fromlist=["FRONTIER_SCHEMA"]).FRONTIER_SCHEMA)
    store_b.overwrite("frontier", frontier.limit(1), partition_by=["bucket"])  # garbage partial write
    store_b.append("crawled", store_b.read("crawled", CRAWLED_SCHEMA).limit(1))

    # resume: rollback-to-lineage discards the partial writes entirely
    store_b2 = SnapshotStore(spark, dir_b)
    run_crawl(store_b2, pages, CFG, max_rounds=10, resume=True)

    assert _fetch_sequence(store_a) == _fetch_sequence(store_b2)
    assert _crawled_set(store_a) == _crawled_set(store_b2)
