"""Streaming ingest: requests JSON feed → frontier via foreachBatch
(the kafka-monitor loop as Structured Streaming, SURVEY.md §2.7)."""

import json
import os
import tempfile

from scrapy_cluster_spark.config import EngineConfig
from scrapy_cluster_spark.schemas import FRONTIER_SCHEMA
from scrapy_cluster_spark.streaming import stream_requests_to_frontier

CFG = EngineConfig()


def test_stream_requests_to_frontier(store, pages):
    tmp = tempfile.mkdtemp(prefix="scs-stream-")
    req_dir = os.path.join(tmp, "requests")
    os.makedirs(req_dir)
    with open(os.path.join(req_dir, "batch1.json"), "w") as f:
        for j in range(3):
            f.write(json.dumps({"appid": "streamapp", "crawlid": "sc1",
                                "url": f"http://site0.com/page/{j}", "priority": 9}) + "\n")
        # an invalid request (appid too short) — dropped by validation
        f.write(json.dumps({"appid": "x", "crawlid": "bad", "url": "http://a.com/"}) + "\n")

    q = stream_requests_to_frontier(store, req_dir, os.path.join(tmp, "ckpt"))
    q.awaitTermination(120)

    frontier = store.read("frontier", FRONTIER_SCHEMA)
    rows = frontier.filter("appid = 'streamapp'").collect()
    assert len(rows) == 3
    assert all(r.spiderid == "link" and r.priority == 9 for r in rows)
    assert frontier.filter("crawlid = 'bad'").count() == 0

    # second batch lands incrementally (new file, resume from checkpoint)
    with open(os.path.join(req_dir, "batch2.json"), "w") as f:
        f.write(json.dumps({"appid": "streamapp", "crawlid": "sc2",
                            "url": "http://site1.com/page/0"}) + "\n")
    q2 = stream_requests_to_frontier(store, req_dir, os.path.join(tmp, "ckpt"))
    q2.awaitTermination(120)
    assert store.read("frontier", FRONTIER_SCHEMA).filter("appid = 'streamapp'").count() == 4
