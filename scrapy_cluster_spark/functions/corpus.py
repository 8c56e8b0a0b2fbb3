"""Corpus-assembly operators for training-data pipelines: deterministic
stratified sampling and token-budget shard packing.

Neither exists in the reference (scrapy-cluster assembles crawl OUTPUT,
not training corpora); both are standard downstream steps once the
dedup/quality families have run: sample a per-stratum quota (per
language / per source) reproducibly, then pack the survivors into
training shards of a fixed token budget.

Determinism is the design constraint: corpus builds must be
reproducible across runs AND cluster sizes, so nothing here uses
``rand()`` (per-task seeds change with partitioning).  Sampling orders
within a stratum by an md5-derived key — a pure function of
(seed, doc id) — and packing orders by doc id with an explicit
distributed prefix sum.  Both are exactly reproducible in ANSI SQL,
so the DuckDB oracle checks them end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def sample_key(id_col, seed: int = 7) -> Column:
    """Deterministic pseudo-uniform sort key in [0, 1): the first 8 hex
    chars of md5(seed|id) as a fraction of 2^32.  md5 agrees across
    engines (Spark, DuckDB, Python), unlike hash()/rand()."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    hx = F.substring(F.md5(F.concat_ws("|", F.lit(str(seed)), c.cast("string"))), 1, 8)
    return (F.conv(hx, 16, 10).cast("double") / F.lit(4294967296.0)).alias("sample_key")


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    cap_per_stratum: int,
    id_col: str = "doc_id",
    seed: int = 7,
) -> DataFrame:
    """At most ``cap_per_stratum`` rows per stratum, chosen by the
    deterministic md5 key (ties broken by id) — the reproducible
    per-language / per-source quota sampler.

    Plan shape at 100 TB: one hash-partition window per stratum (the
    same shuffle a groupBy would need); no global sort, no rand().
    Adversarially skewed strata (one language = 90 % of the corpus)
    cost a bigger window partition but the TopK sort inside the window
    is bounded by the running rank — Spark's window TopK pushdown
    (rank filter) keeps state at O(cap)."""
    k = sample_key(id_col, seed)
    w = Window.partitionBy(*strata_cols).orderBy(F.asc("sample_key"), F.asc(id_col))
    return (
        df.withColumn("sample_key", k)
        .withColumn("stratum_rank", F.row_number().over(w))
        .filter(F.col("stratum_rank") <= cap_per_stratum)
        .drop("sample_key")
    )


def pack_shards(
    df: DataFrame,
    tokens_col: str,
    budget: int,
    id_col: str = "doc_id",
    n_parts: int = 32,
    n_hint: int | None = None,
) -> DataFrame:
    """Assign each doc a ``shard_id`` so consecutive docs (by id) fill
    shards of ~``budget`` tokens: shard_id = floor(exclusive-prefix-sum
    of tokens / budget).  The sequential-fill contract every training
    dataloader understands; a doc that straddles a boundary belongs to
    the shard its first token lands in.

    The global ordered cumsum is the scale hazard (a single-partition
    window serializes the corpus through one task).  Here it is a
    textbook DISTRIBUTED prefix sum:

      1. chunk docs into ``n_parts`` contiguous id ranges,
      2. one small aggregate computes per-chunk token totals
         (n_parts rows to the driver — O(n_parts), not O(rows)),
      3. chunk offsets broadcast back; a per-chunk window adds the
         intra-chunk exclusive cumsum.

    Same result as the naive global window (the DuckDB oracle uses
    exactly that form); wall-clock scales with the widest chunk, not
    the corpus.  Ids are assumed dense-ish integers (the chunking only
    needs id ranges to respect order, not density); ``n_hint`` skips
    the max-id job when the caller knows it."""
    max_id = (
        n_hint - 1
        if n_hint is not None
        else df.agg(F.max(F.col(id_col))).collect()[0][0]
    )
    chunk = max(1, (int(max_id) + n_parts) // n_parts)
    parts = df.withColumn("_chunk", (F.col(id_col) / F.lit(chunk)).cast("long"))
    chunk_totals = (
        parts.groupBy("_chunk").agg(F.sum(tokens_col).alias("_chunk_tokens")).collect()
    )
    totals = {int(r["_chunk"]): int(r["_chunk_tokens"]) for r in chunk_totals}
    offsets, acc = {}, 0
    for c in sorted(totals):
        offsets[c] = acc
        acc += totals[c]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(c, o) for c, o in offsets.items()], ["_chunk", "_chunk_offset"]
    )
    w = Window.partitionBy("_chunk").orderBy(F.asc(id_col)).rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        parts.join(F.broadcast(off_df), "_chunk")
        .withColumn(
            "tokens_before",
            F.col("_chunk_offset") + F.coalesce(F.sum(tokens_col).over(w), F.lit(0)),
        )
        .withColumn("shard_id", F.floor(F.col("tokens_before") / F.lit(budget)))
        .drop("_chunk", "_chunk_offset")
    )


def contamination_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark decontamination (the n-gram-overlap stage of public
    training-data pipelines, e.g. GPT-3 §C / Gopher §A.2): flag every
    training doc sharing ≥ ``min_hits`` distinct k-gram shingles with
    any benchmark/eval text.

    Plan shape at 100 TB: explode both sides to (shingle) rows and
    EQUI-join on the shingle — the benchmark side is small (eval sets),
    so the join broadcasts and the corpus side stays a scan; no
    pairwise comparison ever materializes.  Returns
    (id, n_hits, contaminated) for every training doc."""
    from scrapy_cluster_spark.functions.text import word_shingles

    doc_sh = docs.select(
        F.col(id_col).alias("id"), F.explode(word_shingles(text_col, shingle_k)).alias("sh")
    )
    bench_sh = benchmark.select(
        F.explode(word_shingles(text_col, shingle_k)).alias("sh")
    ).distinct()
    hits = (
        doc_sh.join(F.broadcast(bench_sh), "sh")
        .groupBy("id")
        .agg(F.count_distinct("sh").alias("n_hits"))
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) >= min_hits).alias("contaminated"),
        )
    )


def source_quality_rollup(
    docs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-source corpus curation stats (the domain-level filtering
    signal of RefinedWeb-style pipelines): doc count, token volume,
    mean quality, and exact-duplicate fraction per source — the table
    a curator thresholds to drop low-quality sources wholesale.
    Pure aggregations: one shuffle on the group key at any scale."""
    from scrapy_cluster_spark.functions.text import (
        doc_fingerprint,
        quality_score,
        token_count,
    )

    per_doc = docs.select(
        F.col(group_col).alias("grp"),
        token_count(text_col).alias("n_tokens"),
        quality_score(text_col).alias("q"),
        doc_fingerprint(text_col).alias("fp"),
    )
    return per_doc.groupBy("grp").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        # 4 dp: the mean of ~n 6-dp doubles differs between engines at
        # ~1e-15 from summation order; 4 dp keeps the oracle hash exact
        F.round(F.avg("q"), 4).alias("mean_quality"),
        F.round(
            (F.count("*") - F.count_distinct("fp")) / F.count("*"), 6
        ).alias("dup_fraction"),
    ).withColumnRenamed("grp", group_col)
