"""Bloom-filter sidecars for the URL-seen probe.

north_rule: "a bloom/cuckoo URL-seen membership structure built and
merged per-partition via vectorized Arrow UDFs".

Design (SURVEY.md §4.2): the ``seen`` table is domain-hash-bucketed; each
bucket owns a bloom sidecar (one row: bucket, m, k, n, bits).  Each
round appends a DELTA bloom built from that round's new fingerprints
(``build_delta_blooms`` — applyInPandas per bucket, numpy-vectorized
double hashing).  Blooms are OR-mergeable, so the per-bucket view is
``merge_blooms`` (applyInPandas OR-fold).  The probe cogroups candidates
with their bucket's merged bloom: bloom misses are DEFINITELY new and
skip the exact anti-join entirely; only bloom hits (possible dupes +
false positives) reach the exact join.

Why this matters at 10^10 URLs: the plain anti-join shuffles every
candidate against the full seen table each round.  With a bloom pass
the exact join's left side shrinks to ~(dup_rate + fpr) of candidates —
for a frontier where most discovered links are new, that's the
difference between shuffling 100% and ~5% of the candidate volume.
Semantics are EXACTLY preserved (A/B-tested in tests/test_bloom.py):
false positives only route rows to the exact join, never drop them.

Sizing: m_bits is per-bucket.  At 10^10 fps / 1024 buckets with 1% fpr
each bucket needs ~9.6 bits × 10^7 ≈ 12 MB — streamable per partition.
Sandbox default: 1 MB buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

BLOOM_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType()),
        StructField("m", LongType()),
        StructField("k", IntegerType()),
        StructField("n", LongType()),
        StructField("bits", BinaryType()),
    ]
)

DEFAULT_M_BITS = 1 << 23  # 1 MiB per bucket in-sandbox
DEFAULT_K = 7


def _positions(fps: pd.Series, m: int, k: int) -> np.ndarray:
    """Vectorized double hashing: positions[i, j] for fingerprint i,
    hash j — h1 + j*h2 mod m over the sha1-hex fingerprint halves."""
    h1 = np.array([int(f[:15], 16) for f in fps], dtype=np.uint64)
    h2 = np.array([int(f[15:30], 16) | 1 for f in fps], dtype=np.uint64)
    j = np.arange(k, dtype=np.uint64)
    return (h1[:, None] + j[None, :] * h2[:, None]) % np.uint64(m)


def build_delta_blooms(
    fps: DataFrame, m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K
) -> DataFrame:
    """(bucket, fingerprint) rows → one delta-bloom row per bucket.
    applyInPandas: each bucket's fingerprints arrive as one pandas
    group; bit setting is one numpy scatter."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(pdf["bucket"].iloc[0])
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        pos = _positions(pdf["fingerprint"], m_bits, k)
        np.bitwise_or.at(bits, (pos // 8).ravel(), (1 << (pos % 8)).astype(np.uint8).ravel())
        return pd.DataFrame(
            [{"bucket": bucket, "m": m_bits, "k": k, "n": len(pdf), "bits": bits.tobytes()}]
        )

    return fps.select("bucket", "fingerprint").groupBy("bucket").applyInPandas(
        build, schema=BLOOM_SCHEMA
    )


def merge_blooms(blooms: DataFrame) -> DataFrame:
    """OR-fold delta blooms per bucket (applyInPandas merge — the
    'merged per-partition' clause)."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = np.frombuffer(pdf["bits"].iloc[0], dtype=np.uint8).copy()
        for b in pdf["bits"].iloc[1:]:
            acc |= np.frombuffer(b, dtype=np.uint8)
        out = pdf.iloc[[0]].copy()
        out["bits"] = [acc.tobytes()]
        out["n"] = pdf["n"].sum()
        return out

    return blooms.groupBy("bucket").applyInPandas(merge, schema=BLOOM_SCHEMA)


PROBE_SCHEMA_SUFFIX = StructField("maybe_seen", BooleanType())


def bloom_probe(candidates: DataFrame, blooms: DataFrame, id_cols: list[str]) -> DataFrame:
    """Cogroup candidates with their bucket's merged bloom; returns
    (id_cols..., bucket, fingerprint, maybe_seen).

    A bucket with no bloom yet → everything 'new' (maybe_seen=False)."""
    out_schema = StructType(
        [candidates.schema[c] for c in id_cols]
        + [candidates.schema["bucket"], candidates.schema["fingerprint"], PROBE_SCHEMA_SUFFIX]
    )

    def probe(cand: pd.DataFrame, bl: pd.DataFrame) -> pd.DataFrame:
        out = cand[id_cols + ["bucket", "fingerprint"]].copy()
        if len(bl) == 0 or len(cand) == 0:
            out["maybe_seen"] = False
            return out
        bits = np.frombuffer(bl["bits"].iloc[0], dtype=np.uint8)
        m, k = int(bl["m"].iloc[0]), int(bl["k"].iloc[0])
        pos = _positions(cand["fingerprint"], m, k)
        hit = (bits[pos // 8] & (1 << (pos % 8)).astype(np.uint8)) != 0
        out["maybe_seen"] = hit.all(axis=1)
        return out

    merged = merge_blooms(blooms)
    return (
        candidates.select(*id_cols, "bucket", "fingerprint")
        .groupBy("bucket")
        .cogroup(merged.groupBy("bucket"))
        .applyInPandas(probe, schema=out_schema)
    )


def bloom_filtered_anti_join(
    candidates: DataFrame, seen: DataFrame, blooms: DataFrame, key: list[str]
) -> DataFrame:
    """Exact-semantics seen-probe with a bloom pre-filter.

    Returns the same rows as ``candidates.join(seen, key, 'left_anti')``:
    bloom misses pass through join-free; bloom hits go through the
    exact anti-join."""
    id_cols = [c for c in candidates.columns if c not in ("bucket", "fingerprint")]
    probed = bloom_probe(candidates, blooms, id_cols)
    definitely_new = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    confirmed_new = maybe.join(seen.select(*key), key, "left_anti")
    return definitely_new.unionByName(confirmed_new)
