"""OPIC-style crawl prioritization from observed link structure.

The reference schedules purely on caller-supplied priority (the Redis
zset score, distributed_scheduler.py:514-554) — link structure never
feeds back into the queue.  Large-scale crawlers do close that loop
(OPIC, Abiteboul et al. WWW'03; breadth/importance ordering, Cho,
Garcia-Molina & Page WWW'98): pages discovered by important pages are
fetched earlier.  This module is that closed loop, OPT-IN and additive:

1. ``refresh_url_rank`` — URL-level PageRank over the edge set the
   crawl has actually observed (crawled page → extracted link),
   committed as the ``url_rank`` snapshot table.  Runs on the
   maintenance cadence (``cfg.url_rank_every`` rounds), off the round's
   critical path, reusing :func:`functions.graph.pagerank` (single
   lazy job on dangling-free graphs; snapshot-truncated loop).
2. ``rank_boost`` — the rank table as an integer priority boost.
   Children inherit the boost of the PARENT page that discovered them
   (``parse.child_candidates``): within a domain's politeness budget,
   links found on high-centrality pages pop first.  Domain-level
   politeness itself is untouched — rank buys ORDER, never extra hits
   (the reference's budget semantics stay intact).

Default-off (`use_url_rank=False`) and weight-0 paths are
byte-identical to the baseline scheduler (A/B-tested).  At 100 TB the
edge explode is one scan of the crawled table's pruned (url, links)
columns, the rank loop is the pagerank plan (rank⋈edges shuffle per
round), and the boost join is a plain equi-join on the parent URL —
broadcast when small, AQE shuffle join at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions.graph import pagerank
from ..schemas import CRAWLED_SCHEMA
from ..store import SnapshotStore

URL_RANK_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("pagerank", DoubleType()),
    ]
)


def refresh_url_rank(store: SnapshotStore, cfg: EngineConfig = DEFAULT_CONFIG) -> int:
    """Recompute URL PageRank from the crawled link graph and commit it
    as the ``url_rank`` snapshot.  Returns the committed version — the
    EXISTING version unchanged when the crawl has observed no links yet
    (failed seed round, link-free pages): an advisory maintenance
    refresh must never abort the crawl loop.

    Nodes = crawled URLs ∪ discovered link targets (so fresh frontier
    URLs already carry a rank when their turn comes); edges = observed
    (page → link) pairs, deduplicated, self-loops dropped.  The rank
    loop runs in an explicit scratch store that is deleted as soon as
    the result is copied into the durable ``url_rank`` table — a
    per-refresh atexit-only temp would accumulate one tmpfs copy per
    refresh over a long crawl."""
    import shutil

    from ..store import scratch_store

    crawled = store.read("crawled", CRAWLED_SCHEMA).filter(F.col("success"))
    edges = (
        crawled.select(F.col("url").alias("src"), F.explode("links").alias("l"))
        .select("src", F.col("l.url").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    if edges.isEmpty():
        return store.current_version("url_rank")
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    scratch = scratch_store(store.spark, "scs-urlrank-")
    try:
        pr = pagerank(nodes, edges, n_iter=cfg.url_rank_iters, store=scratch)
        return store.overwrite(
            "url_rank", pr.select(F.col("node").alias("url"), "pagerank")
        )
    finally:
        # the overwrite materialized the copy; the scratch is dead
        shutil.rmtree(scratch.root, ignore_errors=True)


def rank_boost(url_rank: DataFrame, weight: float) -> DataFrame:
    """(url, rank_boost): the rank table as the integer priority bump a
    parent page passes to the children it discovers.  The boost is
    SCALE-FREE: ``round(weight × rank/uniform)`` where uniform = 1/N —
    a page at exactly average centrality boosts by ~``weight``, a k×
    hub by ~k·weight, on a 10³- or 10⁹-URL graph alike (raw rank
    values shrink as 1/N, so an unnormalized boost would round to 0 at
    exactly the scales the signal targets).  Integer so the frontier
    priority stays an int and the pop tiebreak stays exact."""
    n = url_rank.agg(F.count("*").cast("double").alias("n_ranked"))
    return url_rank.crossJoin(F.broadcast(n)).select(
        "url",
        F.round(F.col("pagerank") * F.col("n_ranked") * F.lit(weight))
        .cast("int")
        .alias("rank_boost"),
    )
