"""Crawl driver loop: feed seeds, run rounds to quiescence, resume.

The reference runs continuously (spiders poll, kafka-monitor sleeps
0.01 s — kafka-monitor/settings.py:59); the rebuild's unit of progress
is the scheduling round (SURVEY.md §2.7 "Micro-batching").  The loop is
driver-side and deterministic; resume picks up after the last committed
lineage row (north_rule: "a killed job resumes mid-crawl").
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from scrapy_cluster_spark.config import DEFAULT_CONFIG, EngineConfig
from scrapy_cluster_spark.operators.ingest import (
    extract_crawl_jobs,
    to_frontier_rows,
    validate_requests,
)
from scrapy_cluster_spark.plans.round import (
    STATE_TABLES,
    _commit_lineage,
    last_lineage,
    run_round,
)
from scrapy_cluster_spark.schemas import REQUEST_SCHEMA
from scrapy_cluster_spark.store import SnapshotStore


def feed_requests(
    store: SnapshotStore,
    requests: list[dict] | DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    round_id: int = 0,
) -> dict:
    """API feed → frontier (the kafka-monitor ingest path, §2.1).

    Returns counts {valid, invalid}.  Feed rows bypass the dupefilter
    and page-limit filters (they are pushed by kafka-monitor directly,
    scraper_handler.py:35-64)."""
    spark = store.spark
    if not isinstance(requests, DataFrame):
        rows = [{**{f.name: None for f in REQUEST_SCHEMA.fields}, **r} for r in requests]
        requests = spark.createDataFrame(rows, REQUEST_SCHEMA)
    valid, invalid = validate_requests(requests, cfg)
    frontier_rows = to_frontier_rows(valid, round_id, cfg, source="feed")
    store.append("frontier", frontier_rows, partition_by=["bucket"], meta={"feed": True})
    jobs = extract_crawl_jobs(valid)
    if not jobs.isEmpty():
        store.append("crawl_jobs", jobs)
    n_valid, n_invalid = valid.count(), invalid.count()
    # kafka-monitor ingest stats: overall total/fail plus the
    # ScraperHandler plugin count (kafka_monitor.py:189-221,289) — the
    # stats API fans these out per plugin
    from scrapy_cluster_spark.schemas import METRICS_SCHEMA

    ts = float(round_id * cfg.round_len)
    base = {"round": None, "component": "kafka-monitor", "plugin": None,
            "spiderid": None, "status_code": None, "ts": ts}
    metric_rows = [
        dict(base, kind="total", value=float(n_valid + n_invalid)),
        dict(base, kind="total", plugin="ScraperHandler", value=float(n_valid)),
    ]
    if n_invalid:
        metric_rows.append(dict(base, kind="fail", value=float(n_invalid)))
    store.append_rows("metrics", metric_rows, METRICS_SCHEMA)
    # feeds are lineage events too: a resumed crawl must see state fed
    # AFTER the last scheduling round (resume reads lineage outputs)
    prev = last_lineage(store)
    _commit_lineage(
        store,
        {
            "round": prev["round"] if prev else 0,
            "type": "feed",
            "inputs": (prev or {}).get("outputs", {}),
            "outputs": {t: store.current_version(t) for t in STATE_TABLES},
        },
    )
    return {"valid": n_valid, "invalid": n_invalid}


# append-only tables that grow one file set per round — compaction
# targets (frontier/crawled handle their own layout: frontier is
# overwritten per round, crawled's large files are write-once)
_COMPACT_TABLES = ["seen", "fetch_log", "page_counts", "metrics", "heartbeats"]


def compact_state(store: SnapshotStore, cfg: EngineConfig = DEFAULT_CONFIG) -> dict:
    """Maintenance pass: rewrite small-file append tables into few files
    (store.compact — the Iceberg rewrite_data_files analog) and record
    the new versions as a lineage event so resume pins see the
    compacted snapshots.  Content is row-identical; safe at any point
    between rounds."""
    from scrapy_cluster_spark.plans.round import PAGE_COUNTS_SCHEMA
    from scrapy_cluster_spark.schemas import (
        FETCH_LOG_SCHEMA,
        HEARTBEATS_SCHEMA,
        METRICS_SCHEMA,
        SEEN_SCHEMA,
    )

    schemas = {
        "seen": SEEN_SCHEMA,
        "fetch_log": FETCH_LOG_SCHEMA,
        "page_counts": PAGE_COUNTS_SCHEMA,
        "metrics": METRICS_SCHEMA,
        "heartbeats": HEARTBEATS_SCHEMA,
    }
    changed = {}
    for t in _COMPACT_TABLES:
        before = store.current_version(t)
        after = store.compact(t, schemas[t], min_files=cfg.compact_min_files)
        if after != before:
            changed[t] = after
    # frontier snapshot GC: the frontier commits a new snapshot every
    # round (full or partition-scoped overwrite), so without expiry a
    # long crawl retains O(rounds × frontier) dead files — Iceberg's
    # expire_snapshots run on the same maintenance cadence.  keep_last
    # covers resume (which rolls back to the LAST lineage version) with
    # margin; files shared with kept manifests are never deleted.
    store.expire_snapshots("frontier", keep_last=cfg.snapshot_keep_last)
    prev = last_lineage(store)
    _commit_lineage(
        store,
        {
            "round": prev["round"] if prev else 0,
            "type": "compact",
            "inputs": (prev or {}).get("outputs", {}),
            "outputs": {t: store.current_version(t) for t in STATE_TABLES},
        },
    )
    return changed


def run_crawl(
    store: SnapshotStore,
    pages: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    max_rounds: int = 50,
    resume: bool = True,
) -> list[dict]:
    """Run rounds until the frontier is exhausted or max_rounds.

    With ``resume=True`` the loop continues after the last committed
    lineage row, reading the exact output snapshot versions it
    recorded — a killed run restarted here reproduces the uninterrupted
    run byte-for-byte (tests/test_resume.py)."""
    results: list[dict] = []
    prev = last_lineage(store) if resume else None
    start_round = (prev["round"] + 1) if prev else 1
    versions = prev["outputs"] if prev else None

    if prev:
        # discard partially-committed output of a crashed round: roll
        # every state table back to the last lineage-committed version
        # (append tables would otherwise duplicate the crashed round's
        # rows when it re-runs)
        for t, v in prev["outputs"].items():
            store.rollback(t, v)

    for r in range(start_round, start_round + max_rounds):
        lineage = run_round(store, pages, r, cfg, versions)
        results.append(lineage)
        versions = lineage["outputs"]
        if lineage["scheduled"] == 0 and lineage["frontier_depth"] == 0:
            break
        if cfg.compact_every and r % cfg.compact_every == 0:
            compact_state(store, cfg)
            versions = last_lineage(store)["outputs"]
        if cfg.use_url_rank and cfg.url_rank_every and r % cfg.url_rank_every == 0:
            # maintenance-cadence refresh of the OPIC centrality signal
            # (operators/rank_signal.py) — advisory, outside lineage
            from scrapy_cluster_spark.operators.rank_signal import refresh_url_rank

            refresh_url_rank(store, cfg)
    return results
