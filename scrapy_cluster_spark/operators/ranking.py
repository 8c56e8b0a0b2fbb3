"""Priority-queue pop as window-ranked top-k per domain.

Reference pop: atomic ZRANGE(0,0)+ZREMRANGEBYRANK in MULTI pops the
lowest score = highest priority (score is negated priority,
utils/scutils/redis_queue.py:121-141); equal scores break ties
lexicographically by serialized member (Redis zset semantics).  The
cross-domain visit order is explicitly randomized
(distributed_scheduler.py:494), so only *within-domain* order is part
of the parity contract (SURVEY.md §5 ordering-match metric).

Spark: ``row_number() OVER (PARTITION BY spiderid, domain ORDER BY
priority DESC, url ASC, retry_times ASC, inserted_round ASC) <= quota``.
The url-asc tiebreak mirrors Redis lex order over the serialized
member closely enough to be deterministic and documented.

Skew (north_rule "explicit salting of hot domains"): a mega-domain
funnels its whole backlog through one window task.  ``top_k_per_domain``
therefore runs TWO phases when requested: phase 1 ranks within
(domain, salt) — salt = hash(url) mod S — and keeps only ``quota`` rows
per salt; phase 2 re-ranks the ≤ S*quota survivors per domain.  Output
is identical to the single-phase rank (top-k of a union of per-salt
top-ks is the global top-k since quota ≤ per-salt kept count), but the
heavy sort is spread over S tasks.  Verified by an A/B test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

def tiebreak_order():
    return [F.desc("priority"), F.asc("url"), F.asc("retry_times"), F.asc("inserted_round")]


def top_k_per_domain(
    frontier: DataFrame,
    quotas: DataFrame,
    salted: bool = True,
    salt_partitions: int = 8,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Select up to ``quota`` rows per throttle key (``group_cols``,
    default (spiderid, domain)), highest priority first.  Adds
    ``pop_rank`` (1-based within the key) and ``gap`` (moderation)
    columns from ``quotas``.

    With throttle_type_enabled=False the key is (domain) alone: all
    spider types hitting the domain compete for ONE quota — the shared
    budget is split across spiderids by rank order, matching the
    reference where pops from every ``<type>:<domain>:queue`` drain the
    same ``<domain>:throttle`` window (distributed_scheduler.py:220-258;
    cross-type interleave there is randomized queue order, here the
    deterministic priority tiebreak)."""
    group_cols = group_cols or ["spiderid", "domain"]
    q = F.broadcast(quotas.filter(F.col("quota") > 0))
    df = frontier.join(q, group_cols, "inner")

    if salted:
        # phase 1: per-salt pre-rank — bounds any single task's sort input
        salt = F.pmod(F.hash("url"), F.lit(salt_partitions))
        w1 = Window.partitionBy(*group_cols, "salt").orderBy(*tiebreak_order())
        df = (
            df.withColumn("salt", salt)
            .withColumn("salt_rank", F.row_number().over(w1))
            .filter(F.col("salt_rank") <= F.col("quota"))
            .drop("salt", "salt_rank")
        )

    w2 = Window.partitionBy(*group_cols).orderBy(*tiebreak_order())
    return (
        df.withColumn("pop_rank", F.row_number().over(w2))
        .filter(F.col("pop_rank") <= F.col("quota"))
        .drop("quota")
    )
