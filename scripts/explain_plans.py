"""Generate PLANS.md — formatted physical plans for the engine's key
queries, with the properties that matter at 100 TB called out
(PushedFilters, ReadSchema pruning, join strategies, exchange count).

Usage: python scripts/explain_plans.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import re
import sys

sys.path.insert(0, ".")

import __spark_entry__ as em  # noqa: E402
from scrapy_cluster_spark.session import get_spark  # noqa: E402

KEY_QUERIES = [
    "schedule_round_analog",
    "frontier_topk_pop",
    "dupefilter_antijoin",
    "throttle_trailing_window",
    "minhash_neardup",
    "cosine_topk",
    "embedding_neardup",
    "ivf_ann_topk",
    "stats_windows",
    "bitmap_unique",
    "pii_scrub",
    "gopher_rules",
    "neardup_clusters",
    "stratified_sample",
    "shard_packing",
    "lsh_ann_topk",
    "shared_spans",
    "substring_dedup",
    "tfidf_keywords",
    "unigram_xent",
    "perplexity_buckets",
    "user_sessions",
    "bpe_pair_counts",
    "bigram_xent",
    "pagerank_docs",
    "hits_docs",
    "tfidf_cosine_pairs",
    "length_quantiles",
    "frequent_tokens",
    "pq_ann_topk",
    "ivfpq_ann_topk",
]


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def summarize(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "pushed_filters": re.findall(r"PushedFilters: \[[^\]]*\]", plan)[:4],
        "read_schemas": re.findall(r"ReadSchema: [^\n]*", plan)[:4],
    }


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark(app_name="plans", cores=4)
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()
    out = ["# PLANS — physical plan review (generated)\n"]
    for name in KEY_QUERIES:
        df = qs[name](spark, sf_dir)
        plan = plan_of(df)
        s = summarize(plan)
        out.append(f"## {name}\n")
        out.append(
            f"- exchanges: {s['exchanges']}, broadcast joins: "
            f"{s['broadcast_joins']}, sort-merge joins: {s['sortmerge_joins']}"
        )
        for pf in s["pushed_filters"]:
            out.append(f"- `{pf}`")
        for rs in s["read_schemas"]:
            out.append(f"- `{rs}`")
        out.append("")
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
