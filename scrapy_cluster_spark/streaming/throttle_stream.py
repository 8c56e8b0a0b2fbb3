"""Streaming politeness gate — the domain throttle as a CUSTOM STATEFUL
streaming operator (``applyInPandasWithState``).

Reference: RedisThrottledQueue admits a pop only when the domain's
zset-windowed hit count is under ``hits`` per ``window`` seconds
(utils/scutils/redis_throttled_queue.py:140-214) — state that lives
ACROSS messages, keyed by domain.  The batch engine expresses the same
budget as a quota join per round (operators/throttle.py); this module
is the always-on form: a stream of candidate fetches is admitted or
deferred per domain as it arrives, with the per-domain window state
held in Spark's streaming state store.

Why applyInPandasWithState and not a windowed agg: admission is
ORDER-DEPENDENT within a window (the first ``hits`` events pass, the
rest defer), which no built-in aggregation expresses — this is exactly
the custom-stateful-operator case.  State per domain is two numbers
(window start, used count), so state-store size is O(active domains),
bounded like the reference's Redis keys.

The checkpoint makes the gate resumable: a restarted query continues
with each domain's budget where it left off (tested across an
availableNow stop/start cycle in tests/test_streaming.py)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FETCH_EVENT_SCHEMA = StructType(
    [
        StructField("ts", DoubleType()),      # event epoch seconds
        StructField("domain", StringType()),
        StructField("url", StringType()),
    ]
)

GATED_SCHEMA = StructType(
    [
        StructField("domain", StringType()),
        StructField("url", StringType()),
        StructField("ts", DoubleType()),
        StructField("admitted", BooleanType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("win_start", LongType()), StructField("used", LongType())]
)


def _gate_fn(hits: int, window_s: int):
    """Per-domain admission: replay the batch's events in (ts, url)
    order against the carried (window, used) state — deterministic for
    a given arrival order, like the reference's atomic zset check."""

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (domain,) = key
        win_start, used = state.get if state.exists else (-1, 0)
        outs = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "url"])
            admitted = []
            for ts in pdf["ts"]:
                w = int(ts // window_s)
                if w != win_start:
                    win_start, used = w, 0
                ok = used < hits
                used += 1 if ok else 0
                admitted.append(ok)
            outs.append(
                pd.DataFrame(
                    {
                        "domain": domain,
                        "url": pdf["url"].to_numpy(),
                        "ts": pdf["ts"].to_numpy(),
                        "admitted": admitted,
                    }
                )
            )
        state.update((win_start, used))
        yield from outs

    return fn


def stream_politeness_gate(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    hits: int = 10,
    window_s: int = 60,
    on_batch=None,
):
    """Start the gate (availableNow trigger: drain pending input, stop;
    restart with the same checkpoint to continue — per-domain budget
    state carries over in the streaming state store).  ``on_batch``
    receives each micro-batch's gated rows (foreachBatch: the memory
    sink cannot recover checkpoints)."""
    stream = spark.readStream.schema(FETCH_EVENT_SCHEMA).json(events_dir)
    gated = stream.groupBy("domain").applyInPandasWithState(
        _gate_fn(hits, window_s),
        outputStructType=GATED_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def handle(batch_df, batch_id: int) -> None:
        if on_batch is not None:
            on_batch(batch_df.collect())

    return (
        gated.writeStream.outputMode("append")
        .foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
