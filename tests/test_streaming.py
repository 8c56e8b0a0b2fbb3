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


def test_windowed_stats_watermark_late_data(spark):
    """Watermarked tumbling-window rollup (SURVEY §2.7 'Windows'):
    append mode emits a window only once the watermark closes it; a
    late event WITHIN the watermark counts, one arriving after its
    window closed is dropped — the streaming analog of zset window
    expiry (stats_collector.py:447-471)."""
    import json
    import os
    import tempfile

    from scrapy_cluster_spark.streaming import stream_windowed_status_counts

    tmp = tempfile.mkdtemp(prefix="scs-ss-")
    ev_dir = os.path.join(tmp, "events")
    ckpt = os.path.join(tmp, "ckpt")
    os.makedirs(ev_dir)

    def feed(name, rows):
        with open(os.path.join(ev_dir, name), "w") as f:
            for ts, sid, sc in rows:
                f.write(json.dumps({"ts": ts, "spiderid": sid, "status_code": sc}) + "\n")

    # batch 1: two events in window [00:00,01:00), one at [02:00,03:00).
    # max event time 02:10 → watermark 01:10 → the 00:00 window CLOSES
    # and is emitted with n=2.
    feed("b1.json", [
        ("2024-01-01T00:00:10", "link", 200),
        ("2024-01-01T00:00:40", "link", 200),
        ("2024-01-01T00:02:10", "link", 200),
    ])
    got1: list = []
    q = stream_windowed_status_counts(spark, ev_dir, ckpt,
                                      on_batch=lambda rows: got1.extend(rows))
    q.awaitTermination(120)
    emitted1 = {(r["win"].start.minute, r["n"]) for r in got1}
    assert (0, 2) in emitted1            # closed window emitted once, n=2
    assert all(m == 0 for m, _ in emitted1)  # open windows NOT emitted

    # batch 2: one event LATE for the closed 00:00 window (dropped —
    # watermark already passed) and one at 00:03:10 that advances the
    # watermark past the 02:00 window, closing it with n=1 (the late
    # row never resurrects the closed window).
    feed("b2.json", [
        ("2024-01-01T00:00:50", "link", 200),   # too late: window closed
        ("2024-01-01T00:03:10", "link", 200),
    ])
    got2: list = []
    q2 = stream_windowed_status_counts(spark, ev_dir, ckpt,
                                       on_batch=lambda rows: got2.extend(rows))
    q2.awaitTermination(120)
    # availableNow stops once input drains; windows closed by batch 2's
    # watermark flush on the NEXT trigger — feed a third batch to flush
    feed("b3.json", [("2024-01-01T00:05:00", "link", 200)])
    got3: list = []
    q3 = stream_windowed_status_counts(spark, ev_dir, ckpt,
                                       on_batch=lambda rows: got3.extend(rows))
    q3.awaitTermination(120)
    emitted23 = {(r["win"].start.minute, r["n"]) for r in got2 + got3}
    assert (2, 1) in emitted23           # the 02:00 window closes with 1
    # the late 00:00:50 row was dropped: the closed 00:00 window is
    # NEVER re-emitted or corrected
    assert not any(m == 0 for m, _ in emitted23)


def test_windowed_stats_stream_lands_in_metrics(store, spark):
    """With a store attached, each watermark-closed window appends a
    metrics row (component='crawler-stream') — the streaming path feeds
    the same table the stats API reads."""
    import json
    import os
    import tempfile

    from scrapy_cluster_spark.schemas import METRICS_SCHEMA
    from scrapy_cluster_spark.streaming import stream_windowed_status_counts

    tmp = tempfile.mkdtemp(prefix="scs-ssm-")
    ev_dir = os.path.join(tmp, "events")
    os.makedirs(ev_dir)
    with open(os.path.join(ev_dir, "b1.json"), "w") as f:
        for ts, sc in [("2024-01-01T00:00:05", 200), ("2024-01-01T00:00:25", 404),
                       ("2024-01-01T00:02:30", 200)]:
            f.write(json.dumps({"ts": ts, "spiderid": "link", "status_code": sc}) + "\n")
    q = stream_windowed_status_counts(spark, ev_dir, os.path.join(tmp, "ckpt"), store=store)
    q.awaitTermination(120)
    rows = (
        store.read("metrics", METRICS_SCHEMA)
        .filter("component = 'crawler-stream'")
        .collect()
    )
    got = {(r.kind, r.value) for r in rows}
    assert got == {("status_200", 1.0), ("status_404", 1.0)}  # the closed 00:00 window


def test_stateful_politeness_gate_across_restart(spark):
    """Custom stateful streaming operator (applyInPandasWithState): the
    per-domain politeness budget admits only `hits` fetches per window,
    order-dependent within the window — not expressible as a windowed
    agg — and the budget state SURVIVES a query restart through the
    streaming checkpoint (redis_throttled_queue.py:140-214 semantics)."""
    import json
    import os
    import tempfile

    from scrapy_cluster_spark.streaming.throttle_stream import stream_politeness_gate

    tmp = tempfile.mkdtemp(prefix="scs-gate-")
    ev_dir = os.path.join(tmp, "events")
    os.makedirs(ev_dir)

    def emit(name, rows):
        with open(os.path.join(ev_dir, name), "w") as f:
            for ts, dom, url in rows:
                f.write(json.dumps({"ts": ts, "domain": dom, "url": url}) + "\n")

    got: list = []
    # window 0 (ts<60): 4 events for d1 against hits=3 → first 3 admitted
    emit("b1.json", [(10.0, "d1", "u1"), (11.0, "d1", "u2"), (12.0, "d1", "u3"),
                     (13.0, "d1", "u4"), (10.0, "d2", "v1")])
    q = stream_politeness_gate(spark, ev_dir, os.path.join(tmp, "ckpt"),
                               hits=3, window_s=60, on_batch=got.extend)
    q.awaitTermination(120)
    adm = {r.url: r.admitted for r in got}
    assert adm == {"u1": True, "u2": True, "u3": True, "u4": False, "v1": True}

    # RESTART, same checkpoint: d1's trailing window (admits at 10,11,12)
    # is exhausted — u5/u6 rejected; u7 at 75 is past 12+60, so ALL three
    # admits have aged out of (15, 75] and the budget is free again
    got2: list = []
    emit("b2.json", [(20.0, "d1", "u5"), (21.0, "d1", "u6"),
                     (75.0, "d1", "u7"), (20.0, "d2", "v2")])
    q2 = stream_politeness_gate(spark, ev_dir, os.path.join(tmp, "ckpt"),
                                hits=3, window_s=60, on_batch=got2.extend)
    q2.awaitTermination(120)
    adm2 = {r.url: r.admitted for r in got2}
    assert adm2 == {"u5": False, "u6": False, "u7": True, "v2": True}


def test_gate_trailing_window_boundary_burst():
    """The round-4 divergence case: a burst straddling a tumbling-window
    boundary.  Reference semantics (redis_throttled_queue.py:112-157)
    are TRAILING: admits at 55/56/57 keep the budget exhausted until
    55+window, so the 61/62/63 burst — which a tumbling gate would admit
    as a 'new window' — must be rejected; at 116 (> 55+60) one slot has
    aged out and exactly one admission passes."""
    from collections import deque

    import numpy as np

    from scrapy_cluster_spark.streaming.throttle_stream import _gate_batch

    window: deque = deque()
    ts = np.array([55.0, 56.0, 57.0, 61.0, 62.0, 63.0, 116.0, 116.5])
    adm = _gate_batch(ts, window, hits=3, window_s=60)
    # 3 admitted in the first trailing window, boundary burst rejected;
    # at 116 the inclusive eviction (ts <= t - window, matching the
    # reference's zremrangebyscore '-inf'..now-window) ages out 55 AND
    # 56, so two slots free — 116 and 116.5 both admitted
    assert adm.tolist() == [True, True, True, False, False, False, True, True]
    assert sorted(window) == [57.0, 116.0, 116.5]

    # any trailing 60 s slice of the admitted sequence holds <= hits
    admitted_ts = ts[adm]
    for t in ts:
        in_win = [a for a in admitted_ts if t - 60 < a <= t]
        assert len(in_win) <= 3


def test_gate_out_of_order_ts_cannot_mint_budget():
    """A stale event time must not roll the window back (round-4 advice):
    after the budget is exhausted at t=100, an out-of-order event at
    t=10 is clamped to the monotonic high-water mark and rejected."""
    from collections import deque

    import numpy as np

    from scrapy_cluster_spark.streaming.throttle_stream import _gate_batch

    window: deque = deque()
    first = np.array([98.0, 99.0, 100.0])
    assert _gate_batch(first, window, hits=3, window_s=60).tolist() == [True] * 3
    # the clamp lives in _gate_fn (np.maximum.accumulate against hwm);
    # emulate it: the stale 10.0 becomes 100.0 and must be rejected
    stale = np.maximum.accumulate(np.maximum(np.array([10.0]), 100.0))
    assert _gate_batch(stale, window, hits=3, window_s=60).tolist() == [False]


def test_corpus_stream_dedup_and_parity(spark, store):
    """Streaming corpus ingest (SURVEY §2.11): repeats within the
    watermark are dropped (first arrival wins) INCLUDING across a
    checkpoint restart, and enrichment columns equal the batch path's
    values for the same text (one code path, two execution modes)."""
    import json
    import os
    import tempfile

    from scrapy_cluster_spark.streaming import stream_dedup_ingest

    tmp = tempfile.mkdtemp(prefix="scs-corpus-")
    docs_dir = os.path.join(tmp, "docs")
    ckpt = os.path.join(tmp, "ckpt")
    os.makedirs(docs_dir)

    text_a = "the quick brown fox jumps over the lazy dog again today"
    text_b = "completely different content about spark shuffle behavior"

    def feed(name, rows):
        with open(os.path.join(docs_dir, name), "w") as f:
            for ts, did, src, text in rows:
                f.write(json.dumps(
                    {"ts": ts, "doc_id": did, "source": src, "text": text}) + "\n")

    feed("b1.json", [
        ("2024-01-01T00:00:10", 1, "s1", text_a),
        ("2024-01-01T00:00:20", 2, "s2", text_a),   # dup fp → dropped
        ("2024-01-01T00:00:30", 3, "s1", text_b),
    ])
    got1: list = []
    q = stream_dedup_ingest(spark, docs_dir, ckpt, store=store,
                            on_batch=lambda rows: got1.extend(rows))
    q.awaitTermination(120)
    assert sorted(r["doc_id"] for r in got1) == [1, 3]

    # batch parity: same expressions, same values
    from scrapy_cluster_spark.functions import text as T

    batch = {
        r.doc_id: r
        for r in spark.createDataFrame(
            [(1, text_a), (3, text_b)], ["doc_id", "text"]
        ).select(
            "doc_id",
            T.doc_fingerprint("text").alias("fp"),
            T.token_count("text").alias("n_tokens"),
            T.quality_score("text").alias("quality"),
            T.lang_id("text").alias("lang_pred"),
        ).collect()
    }
    for r in got1:
        b = batch[r["doc_id"]]
        assert (r["fp"], r["n_tokens"], r["quality"], r["lang_pred"]) == (
            b.fp, b.n_tokens, b.quality, b.lang_pred)

    # restart from checkpoint: a repeat still within the watermark is
    # dropped (dedup state survives the restart); new content lands
    feed("b2.json", [
        ("2024-01-01T00:00:50", 4, "s3", text_a),   # dup across restart
        ("2024-01-01T00:00:55", 5, "s1", "brand new third text body here"),
    ])
    got2: list = []
    q2 = stream_dedup_ingest(spark, docs_dir, ckpt, store=store,
                             on_batch=lambda rows: got2.extend(rows))
    q2.awaitTermination(120)
    assert sorted(r["doc_id"] for r in got2) == [5]

    from scrapy_cluster_spark.streaming.corpus_stream import CORPUS_LANDED_SCHEMA

    landed = store.read("corpus", CORPUS_LANDED_SCHEMA)
    assert sorted(r.doc_id for r in landed.collect()) == [1, 3, 5]


def test_corpus_stream_lands_without_driver_collect(spark, store):
    """Round-6 (round-5 verdict #2): with no ``on_batch`` test hook the
    ingest handler must land survivors through the DISTRIBUTED
    ``store.append`` path — never by collecting full document text to
    the driver.  Enforced by making ``DataFrame.collect`` raise for the
    duration of the stream."""
    import json
    import os
    import tempfile

    from pyspark.sql import DataFrame

    from scrapy_cluster_spark.streaming import stream_dedup_ingest
    from scrapy_cluster_spark.streaming.corpus_stream import CORPUS_LANDED_SCHEMA

    tmp = tempfile.mkdtemp(prefix="scs-corpus-nc-")
    docs_dir = os.path.join(tmp, "docs")
    ckpt = os.path.join(tmp, "ckpt")
    os.makedirs(docs_dir)
    with open(os.path.join(docs_dir, "b1.json"), "w") as f:
        for ts, did, text in [
            ("2024-01-01T00:00:10", 1, "alpha text body one two three"),
            ("2024-01-01T00:00:20", 2, "beta text body four five six"),
        ]:
            f.write(json.dumps(
                {"ts": ts, "doc_id": did, "source": "s", "text": text}) + "\n")

    real_collect = DataFrame.collect

    def no_collect(self):
        raise AssertionError("driver collect in streaming ingest handler")

    DataFrame.collect = no_collect
    try:
        q = stream_dedup_ingest(spark, docs_dir, ckpt, store=store)
        q.awaitTermination(120)
    finally:
        DataFrame.collect = real_collect
    landed = store.read("corpus", CORPUS_LANDED_SCHEMA)
    assert sorted(r.doc_id for r in landed.collect()) == [1, 2]


def test_corpus_stream_source_health(spark):
    """Per-source rolling health windows: append mode emits a closed
    (window, source) row once, with counts/volume/mean quality equal to
    a hand batch-check over the in-window docs."""
    import json
    import os
    import tempfile

    from scrapy_cluster_spark.streaming import stream_source_health

    tmp = tempfile.mkdtemp(prefix="scs-health-")
    docs_dir = os.path.join(tmp, "docs")
    ckpt = os.path.join(tmp, "ckpt")
    os.makedirs(docs_dir)

    t1 = "alpha beta gamma delta words in this document body"
    t2 = "second body with other words but a similar overall shape"

    def feed(name, rows):
        with open(os.path.join(docs_dir, name), "w") as f:
            for ts, did, src, text in rows:
                f.write(json.dumps(
                    {"ts": ts, "doc_id": did, "source": src, "text": text}) + "\n")

    # two s1 docs + one s2 doc in [00:00, 00:01); a later event advances
    # the watermark (60 s) past that window so it closes and emits
    feed("b1.json", [
        ("2024-01-01T00:00:05", 1, "s1", t1),
        ("2024-01-01T00:00:25", 2, "s1", t2),
        ("2024-01-01T00:00:45", 3, "s2", t1),
        ("2024-01-01T00:02:30", 4, "s2", t2),
    ])
    got: list = []
    q = stream_source_health(spark, docs_dir, ckpt,
                             on_batch=lambda rows: got.extend(rows))
    q.awaitTermination(120)
    emitted = {(r["win"].start.minute, r["source"]): r for r in got}
    assert set(emitted) == {(0, "s1"), (0, "s2")}

    from scrapy_cluster_spark.functions import text as T
    from pyspark.sql import functions as F

    expect = {
        r.source: r
        for r in spark.createDataFrame(
            [(1, "s1", t1), (2, "s1", t2), (3, "s2", t1)],
            ["doc_id", "source", "text"],
        )
        .select("source", T.token_count("text").alias("n"),
                T.quality_score("text").alias("q"))
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("n").alias("total_tokens"),
             F.round(F.avg("q"), 6).alias("mean_quality"))
        .collect()
    }
    for (_, src), r in emitted.items():
        e = expect[src]
        assert (r["n_docs"], r["total_tokens"], r["mean_quality"]) == (
            e.n_docs, e.total_tokens, e.mean_quality)


def test_stream_user_sessions_matches_batch(spark):
    """Streaming sessionization emits exactly the sessions the batch
    operator computes, once each, after the watermark closes them —
    same F.session_window, one semantics (SURVEY §2.11)."""
    import datetime as dt
    import json
    import os
    import tempfile

    from scrapy_cluster_spark.operators.stats import sessionize
    from scrapy_cluster_spark.streaming import stream_user_sessions

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    tmp = tempfile.mkdtemp(prefix="scs-sess-")
    ev_dir = os.path.join(tmp, "events")
    ckpt = os.path.join(tmp, "ckpt")
    os.makedirs(ev_dir)

    # user 1: two sessions (10 s apart, then a >60 s gap); user 2: one
    events = [
        ("2024-01-01T00:00:00", 1, 1.0),
        ("2024-01-01T00:00:10", 1, 2.0),
        ("2024-01-01T00:02:00", 1, 4.0),
        ("2024-01-01T00:00:05", 2, 8.0),
    ]
    with open(os.path.join(ev_dir, "b1.json"), "w") as f:
        for ts, uid, v in events:
            f.write(json.dumps({"ts": ts, "user_id": uid, "value": v}) + "\n")
    # a far-future event pushes the watermark past every session close
    with open(os.path.join(ev_dir, "b2.json"), "w") as f:
        f.write(json.dumps({"ts": "2024-01-01T01:00:00", "user_id": 9,
                            "value": 0.0}) + "\n")

    got: list = []
    q = stream_user_sessions(spark, ev_dir, ckpt, gap_s=60,
                             on_batch=lambda rows: got.extend(rows))
    q.awaitTermination(120)
    # drain again: availableNow may close the last watermark on restart
    q2 = stream_user_sessions(spark, ev_dir, ckpt, gap_s=60,
                              on_batch=lambda rows: got.extend(rows))
    q2.awaitTermination(120)

    batch_df = spark.createDataFrame(
        [(dt.datetime.fromisoformat(ts), uid, v) for ts, uid, v in events],
        ["ts", "user_id", "value"],
    )
    expect = {
        (r.user_id, r.session_start_us): r
        for r in sessionize(batch_df, gap_s=60).collect()
    }
    emitted = {(r["user_id"], r["session_start_us"]): r for r in got
               if r["user_id"] != 9}
    assert set(emitted) == set(expect)
    # each session emitted exactly once across both drains
    keys = [(r["user_id"], r["session_start_us"]) for r in got
            if r["user_id"] != 9]
    assert len(keys) == len(set(keys))
    for k, r in emitted.items():
        e = expect[k]
        assert (r["session_last_us"], r["n_events"], r["total_value"]) == (
            e.session_last_us, e.n_events, e.total_value)


def test_stream_frequent_tokens_bounds_and_restart(spark):
    """Streaming SpaceSaving heavy hitters: across micro-batches AND a
    checkpoint restart, emitted counts never underestimate truth,
    overestimate by at most their err bound, and every token above the
    per-shard guarantee threshold is present in the final summary."""
    import json
    import os
    import tempfile
    from collections import Counter

    from scrapy_cluster_spark.streaming import stream_frequent_tokens

    tmp = tempfile.mkdtemp(prefix="scs-hh-")
    docs_dir = os.path.join(tmp, "docs")
    ckpt = os.path.join(tmp, "ckpt")
    os.makedirs(docs_dir)

    def feed(name, texts):
        with open(os.path.join(docs_dir, name), "w") as f:
            for i, t in enumerate(texts):
                f.write(json.dumps({
                    "ts": "2024-01-01T00:00:01", "doc_id": i,
                    "source": "s", "text": t,
                }) + "\n")

    # heavy tokens + a long tail that overflows k per shard
    heavy = ["hot0"] * 120 + ["hot1"] * 80
    tail = [f"t{i}" for i in range(300)]
    b1 = " ".join(heavy[:100] + tail[:150])
    b2 = " ".join(heavy[100:] + tail[150:])
    all_tokens = Counter((b1 + " " + b2).split())

    k, n_shards = 8, 4
    emitted: dict = {}

    def collect(rows):
        for r in rows:
            # r["count"]: Row.count is the tuple method, not the column
            emitted[r.token] = (r["count"], r["err"])  # latest wins

    feed("b1.json", [b1])
    q = stream_frequent_tokens(spark, docs_dir, ckpt, on_batch=collect,
                               k=k, n_shards=n_shards)
    q.awaitTermination(120)
    # restart from the checkpoint for the second batch (state survives)
    feed("b2.json", [b2])
    q2 = stream_frequent_tokens(spark, docs_dir, ckpt, on_batch=collect,
                                k=k, n_shards=n_shards)
    q2.awaitTermination(120)

    assert emitted
    for tok, (cnt, err) in emitted.items():
        true = all_tokens[tok]
        assert cnt >= true, (tok, cnt, true)            # never underestimates
        assert cnt - err <= true, (tok, cnt, err, true)  # bounded overestimate
    # the heavy tokens dominate any shard's mass/k → guaranteed present
    assert "hot0" in emitted and "hot1" in emitted
    # hot0 entered an EMPTY shard in batch 1 (processed count-desc) and
    # was never evicted → exact with err 0; hot1 arrived in batch 2
    # after its shard filled, so it may carry an inherited err bound —
    # the (already-asserted) count/err bounds are its contract
    assert emitted["hot0"] == (all_tokens["hot0"], 0)
