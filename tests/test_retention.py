"""Retention jobs — the reference's TTL analogs (dupefilter 600 s,
throttle 2×window)."""

from scrapy_cluster_spark.config import EngineConfig
from scrapy_cluster_spark.operators.retention import expire_fetch_log, expire_seen
from scrapy_cluster_spark.schemas import FETCH_LOG_SCHEMA, SEEN_SCHEMA

CFG = EngineConfig()  # dupefilter_timeout 600 / round_len 60 → 10 rounds


def test_expire_seen_horizon(spark, store):
    rows = [("link", "c1", f"fp{i:03d}", r, 0) for i, r in enumerate([1, 5, 11, 12, 20])]
    store.append("seen", spark.createDataFrame(rows, SEEN_SCHEMA))
    kept = expire_seen(store, current_round=20, cfg=CFG)
    left = {r.seen_round for r in store.read("seen", SEEN_SCHEMA).collect()}
    assert kept == 3
    assert left == {11, 12, 20}  # horizon = 20 - 10


def test_expire_fetch_log(spark, store):
    rows = [(f"link:d{i}", f"d{i}", "link", f"http://d{i}/", r, 0.0)
            for i, r in enumerate([1, 18, 19, 20])]
    store.append("fetch_log", spark.createDataFrame(rows, FETCH_LOG_SCHEMA))
    kept = expire_fetch_log(store, current_round=20, cfg=CFG)
    assert kept == 2  # 2*window/round_len = 2 rounds back
    left = {r.round for r in store.read("fetch_log", FETCH_LOG_SCHEMA).collect()}
    assert left == {19, 20}


def test_snapshot_expiry_gc(spark, store):
    import os

    rows = [("link", "c1", "fpx", 1, 0)]
    df = spark.createDataFrame(rows, SEEN_SCHEMA)
    for _ in range(6):
        store.append("seen", df)
    files_before = set()
    for v in range(1, 7):
        files_before.update(store.files("seen", v))
    store.expire_snapshots("seen", keep_last=2)
    # old manifests gone; current files still readable
    assert store.read("seen", SEEN_SCHEMA).count() == 6
    live = set(store.files("seen"))
    gone = [f for f in files_before if f not in live and os.path.exists(f)]
    # files only referenced by expired manifests are deleted — but appends
    # share files across manifests, so everything live must remain
    assert all(os.path.exists(f) for f in live)


def test_compaction_preserves_content_and_shrinks_files(store, pages, spark):
    """store.compact (Iceberg rewrite_data_files analog): a multi-round
    crawl accumulates one file set per append; compaction rewrites the
    current snapshot into few files with row-identical content, as a
    normal commit (old snapshot stays readable for time travel)."""
    from scrapy_cluster_spark.config import EngineConfig
    from scrapy_cluster_spark.plans.crawl import compact_state, feed_requests, run_crawl
    from scrapy_cluster_spark.schemas import SEEN_SCHEMA

    cfg = EngineConfig()
    feed_requests(
        store,
        [{"appid": "cmpapp", "crawlid": "cmp", "url": f"http://site{d}.com/page/0",
          "priority": 50, "maxdepth": 3} for d in range(3)],
        cfg,
    )
    run_crawl(store, pages, cfg, max_rounds=6)
    v_before = store.current_version("seen")
    # (the merged seen+page_counts append writes ONE file per round with
    # inserts, so a multi-round crawl accumulates exactly that many)
    files_before = len(store.files("seen"))
    rows_before = sorted(
        (r.spiderid, r.crawlid, r.fingerprint)
        for r in store.read("seen", SEEN_SCHEMA).collect()
    )
    assert files_before > 2

    changed = compact_state(store, EngineConfig(compact_min_files=2))
    assert "seen" in changed
    assert len(store.files("seen")) < files_before
    rows_after = sorted(
        (r.spiderid, r.crawlid, r.fingerprint)
        for r in store.read("seen", SEEN_SCHEMA).collect()
    )
    assert rows_after == rows_before
    # time travel: the pre-compaction snapshot still reads
    assert store.count("seen", v_before) == len(rows_before)
    # GC: expiring old snapshots removes the superseded small files,
    # current snapshot unaffected
    store.expire_snapshots("seen", keep_last=1)
    assert sorted(
        (r.spiderid, r.crawlid, r.fingerprint)
        for r in store.read("seen", SEEN_SCHEMA).collect()
    ) == rows_before


def test_crawl_resumes_across_compaction(spark, pages):
    """A crawl interrupted right after a compaction pass resumes from
    the compacted snapshots and finishes identically to an
    uninterrupted run (compaction is a lineage event)."""
    import shutil
    import tempfile

    from scrapy_cluster_spark.config import EngineConfig
    from scrapy_cluster_spark.plans.crawl import feed_requests, run_crawl
    from scrapy_cluster_spark.schemas import CRAWLED_SCHEMA
    from scrapy_cluster_spark.store import SnapshotStore

    def crawl(split: int | None):
        cfg = EngineConfig(compact_every=2, compact_min_files=2)
        tmp = tempfile.mkdtemp(prefix="scs-cmp-")
        st = SnapshotStore(spark, tmp)
        feed_requests(
            st,
            [{"appid": "cmpapp", "crawlid": "cr", "url": "http://site1.com/page/0",
              "priority": 50, "maxdepth": 2}],
            cfg,
        )
        if split is None:
            run_crawl(st, pages, cfg, max_rounds=8)
        else:
            run_crawl(st, pages, cfg, max_rounds=split)   # stops post-compaction
            run_crawl(st, pages, cfg, max_rounds=8 - split)  # resume
        out = sorted(
            (r.url, r.round, r.status_code)
            for r in st.read("crawled", CRAWLED_SCHEMA).collect()
        )
        shutil.rmtree(tmp, ignore_errors=True)
        return out

    assert crawl(split=2) == crawl(split=None)


def test_frontier_snapshot_gc_bounds_files(spark, pages):
    """A long crawl with the maintenance pass on a cadence keeps the
    frontier's dead snapshot files bounded (expire_snapshots in
    compact_state) while the live snapshot and resume behavior are
    untouched."""
    import os
    import shutil
    import tempfile

    from scrapy_cluster_spark.plans.crawl import feed_requests, run_crawl
    from scrapy_cluster_spark.schemas import FRONTIER_SCHEMA
    from scrapy_cluster_spark.store import SnapshotStore
    from scrapy_cluster_spark.synth import seed_requests

    cfg = EngineConfig(compact_every=2, compact_min_files=4, snapshot_keep_last=3)
    tmp = tempfile.mkdtemp(prefix="scs-gc-")
    store = SnapshotStore(spark, tmp)
    feed_requests(store, seed_requests(3, maxdepth=3), cfg)
    run_crawl(store, pages, cfg, max_rounds=6)

    # manifests beyond keep_last are gone; current snapshot reads fine
    import glob

    manifests = sorted(glob.glob(os.path.join(tmp, "frontier", "manifests", "*.json")))
    assert len(manifests) <= cfg.snapshot_keep_last + 2  # GC cadence margin
    live = set(store.files("frontier"))
    assert all(os.path.exists(f) for f in live)
    store.read("frontier", FRONTIER_SCHEMA).count()  # readable
    # every on-disk frontier data file is referenced by a KEPT manifest
    # (dead files from expired snapshots were physically deleted)
    import json as _json

    kept_refs: set = set()
    for m in manifests:
        with open(m) as f:
            kept_refs.update(_json.load(f)["files"])
    on_disk = {
        os.path.join(dp, fn)
        for dp, _d, fns in os.walk(os.path.join(tmp, "frontier", "data"))
        for fn in fns if fn.endswith(".parquet")
    }
    assert on_disk <= kept_refs
    shutil.rmtree(tmp, ignore_errors=True)
