"""Politeness throttle: per-domain quota + moderation slots.

Reference: ``RedisThrottledQueue`` keeps a zset of hit timestamps per
throttle key; ``allowed()`` evicts hits older than ``now - window`` and
permits a pop while the trailing count is below ``limit``
(utils/scutils/redis_throttled_queue.py:112-157).  Moderation enforces a
minimum gap of ``window/limit`` seconds between pops
(:58-65, 172-190); elastic catch-up lifts the gap when the queue has
fallen behind (:159-170) — the scheduler enables it with
``elastic_buffer=0`` (distributed_scheduler.py:244-258).

Round discretization (SURVEY.md §7 risk 3): with logical round length
``L`` seconds, a round grants each throttle key

    quota = hits_eff - hits_in_trailing(window - L)      if window > L
    quota = floor(hits_eff * L / window)                 if window <= L

where ``hits_eff = int(hits * clamp(scale, 0, 1))`` per the zk override
arithmetic (distributed_scheduler.py:176-182, fit_scale :201-210).
With the defaults (L == window == 60, hits == 10) this is exactly 10
per domain per round — the documented politeness budget
(crawler/crawling/settings.py:39-40).  Moderation assigns deterministic
emit slots ``round_start + i * window/hits_eff`` inside the round,
reproducing the even outbound flow.

Throttle scope (distributed_scheduler.py:220-258): optional spider type
and/or public IP prefix the domain.  One logical Spark scheduler has a
single egress identity, so the IP style degenerates unless simulating
multiple IPs; the key expression mirrors all 4 styles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from scrapy_cluster_spark.config import EngineConfig


def throttle_group_cols(cfg: EngineConfig, ip_col: str | None = None) -> list[str]:
    """Column set identifying ONE politeness budget — the 4 key styles of
    create_queues (distributed_scheduler.py:220-243): [spiderid?][ip?]domain.
    With throttle_type_enabled=False the budget is SHARED across spider
    types hitting the same domain (settings.py:85-88) — quotas must then
    be computed per domain and split across spiderids at selection time.
    One logical Spark scheduler has a single egress identity, so ip_col
    participates only when simulating multiple egress IPs."""
    cols = []
    if cfg.throttle_type_enabled:
        cols.append("spiderid")
    if cfg.throttle_ip_enabled and ip_col:
        cols.append(ip_col)
    cols.append("domain")
    return cols


def throttle_key_expr(cfg: EngineConfig, ip_col: str | None = None):
    """concat of [spiderid?][ip?]domain — the 4 key styles of
    create_queues (distributed_scheduler.py:222-243)."""
    return F.concat_ws(":", *[F.col(c) for c in throttle_group_cols(cfg, ip_col)])


def compute_quotas(
    domains: DataFrame,
    domain_config: DataFrame,
    fetch_log: DataFrame,
    round_id: int,
    cfg: EngineConfig,
) -> DataFrame:
    """Per-throttle-key quota for this round.

    ``domains``: distinct throttle-key tuples (see throttle_group_cols —
    (spiderid, domain) when type-scoped, (domain) when the budget is
    shared across spider types) present in the schedulable frontier.
    ``domain_config`` is the zk-override table (tiny → broadcast).
    ``fetch_log`` supplies trailing-window hits for window > round_len
    configs — aggregated over the SAME key, so with type disabled two
    spiders' past hits drain one shared budget
    (distributed_scheduler.py:220-258).
    Returns (*group_cols, quota, gap) — gap in seconds for moderation
    slot assignment.
    """
    L = cfg.round_len
    group_cols = throttle_group_cols(cfg)
    cfgd = F.broadcast(
        domain_config.select(
            "domain",
            F.col("window").alias("cfg_window"),
            F.col("hits").alias("cfg_hits"),
            F.col("scale").alias("cfg_scale"),
            F.col("blacklisted").alias("cfg_blacklisted"),
        )
    )
    d = (
        domains.join(cfgd, "domain", "left")
        .withColumn("window", F.coalesce("cfg_window", F.lit(cfg.queue_window)))
        .withColumn("hits", F.coalesce("cfg_hits", F.lit(cfg.queue_hits)))
        # fit_scale clamp to [0,1] (distributed_scheduler.py:201-210)
        .withColumn(
            "scale",
            F.least(F.greatest(F.coalesce("cfg_scale", F.lit(1.0)), F.lit(0.0)), F.lit(1.0)),
        )
        .withColumn("hits_eff", F.floor(F.col("hits") * F.col("scale")).cast("int"))
        .withColumn("zk_blacklisted", F.coalesce("cfg_blacklisted", F.lit(False)))
    )

    # trailing hits from rounds still inside the window (window > L case)
    trailing_rounds = F.ceil(F.col("window") / F.lit(L)) - 1
    trail = (
        fetch_log.groupBy(*group_cols, "round")
        .agg(F.count("*").alias("hits_in_round"))
        .filter(F.col("round") < round_id)
    )
    d = (
        d.join(trail, group_cols, "left")
        .withColumn(
            "trailing_hit",
            F.when(
                F.col("round").isNotNull()
                & (F.col("round") >= F.lit(round_id) - trailing_rounds),
                F.col("hits_in_round"),
            ).otherwise(F.lit(0)),
        )
        .groupBy(*group_cols, "window", "hits_eff", "zk_blacklisted")
        .agg(F.sum("trailing_hit").alias("trailing_hits"))
    )

    quota = F.when(
        F.col("window") <= F.lit(L),
        F.floor(F.col("hits_eff") * F.lit(L) / F.col("window")),
    ).otherwise(F.greatest(F.col("hits_eff") - F.col("trailing_hits"), F.lit(0)))

    gap = F.when(
        F.lit(cfg.queue_moderated) & (F.col("hits_eff") > 0),
        F.col("window") / F.col("hits_eff"),
    ).otherwise(F.lit(0.0))

    return d.select(
        *group_cols,
        F.when(F.col("zk_blacklisted"), F.lit(0)).otherwise(quota).cast("int").alias("quota"),
        gap.cast("double").alias("gap"),
    )


def assign_slots(scheduled: DataFrame, round_id: int, cfg: EngineConfig) -> DataFrame:
    """Moderation slot per scheduled row: round_start + (rank-1) * gap
    (redis_throttled_queue.py:58-65 gap arithmetic, discretized)."""
    return scheduled.withColumn(
        "slot_ts",
        (F.lit(float(round_id * cfg.round_len)) + (F.col("pop_rank") - 1) * F.col("gap")).cast(
            "double"
        ),
    )
