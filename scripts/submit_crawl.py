"""spark-submit entrypoint for the crawl engine.

north_rule: the frontier "runs via spark-submit --py-files on a
multi-executor cluster at two cluster sizes".  This script is that
deployment shape: it takes the SparkSession AS CONFIGURED BY
spark-submit (master, executor count/memory, shuffle partitions — all
cluster-side knobs) and only supplies the job: synthesize or read a
pages corpus, feed seeds, run scheduling rounds, print the lineage
summary as JSON.

Local two-size evidence (the sandbox has no multi-node cluster):

    scripts/package.sh
    spark-submit --master local[4]  --py-files dist/scrapy_cluster_spark.zip \
        scripts/submit_crawl.py --store /dev/shm/crawl4  --domains 200 --base-pages 300
    spark-submit --master local[16] --py-files dist/scrapy_cluster_spark.zip \
        scripts/submit_crawl.py --store /dev/shm/crawl16 --domains 200 --base-pages 300

On a real cluster only the --master/--deploy-mode line and the store
root (shared storage) change; the job code is identical.  Import comes
from the --py-files zip — do NOT sys.path the repo here, that would
mask packaging breakage (tests/test_submit.py runs this from a neutral
cwd to prove the zip is self-contained).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True, help="snapshot store root (shared storage on a cluster)")
    ap.add_argument("--domains", type=int, default=100)
    ap.add_argument("--base-pages", type=int, default=200)
    ap.add_argument("--zipf", type=float, default=0.3)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--hits", type=int, default=100)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--maxdepth", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("scrapy-cluster-spark-crawl")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from scrapy_cluster_spark.config import EngineConfig
    from scrapy_cluster_spark.plans.crawl import feed_requests, run_crawl
    from scrapy_cluster_spark.store import SnapshotStore
    from scrapy_cluster_spark.synth import generate_pages, seed_requests

    cfg = EngineConfig(queue_hits=args.hits)
    store = SnapshotStore(spark, args.store)
    pages = generate_pages(spark, args.domains, args.base_pages, args.zipf)
    feed_requests(store, seed_requests(args.seeds, maxdepth=args.maxdepth), cfg)
    lineage = run_crawl(store, pages, cfg, max_rounds=args.rounds)
    summary = {
        "rounds": len(lineage),
        "scheduled": sum(r["scheduled"] for r in lineage),
        "candidates": sum(r.get("candidates", 0) for r in lineage),
        "crawled_ok": sum(r["crawled_ok"] for r in lineage),
        "frontier_depth": lineage[-1]["frontier_depth"] if lineage else 0,
    }
    print("CRAWL_SUMMARY " + json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
