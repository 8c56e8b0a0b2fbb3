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
