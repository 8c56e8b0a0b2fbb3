"""Exact substring-duplication analysis: maximal shared token runs.

Document-level dedup (exact / MinHash / SimHash families in
functions/dedup.py) misses PARTIAL duplication — a boilerplate
paragraph or quoted passage pasted into otherwise-distinct documents.
The standard treatment (Lee et al., "Deduplicating Training Data Makes
Language Models Better", ACL'22) finds exact repeated token substrings
over the corpus with a suffix array; a suffix array is a single giant
sorted structure, the wrong shape for a distributed engine.  This
module gets the same answer Spark-first:

1. ``gram_postings`` — posexplode each doc into its k-token grams with
   positions: one narrow (doc, pos, gram) table, scan-shaped.
2. equi-join postings on the literal gram string (cross-doc, a < b) —
   a pure shuffle join, NO similarity math, no cross join.  Each match
   is a dot on the (pa, pb) dot-plot.
3. gaps-and-islands per (a, b, diagonal): consecutive gram matches on
   one diagonal (pa − pb constant) are one shared run; a run of m
   consecutive k-grams is an exact shared substring of m + k − 1
   tokens.  Windows partition by (a, b, diag) — per-pair-sized, never
   corpus-sized.

For min_len ≥ k the result is EXACT (every shared token run of length
≥ min_len appears as one maximal span row) and fully deterministic —
literal strings, no hashing — so DuckDB can replay it as the oracle.

Scale note (100 TB): the postings join is the same shape as the LSH
(band, bucket) join in functions/dedup.py and shares its hazard —
ultra-common grams (stop-phrase boilerplate) make hot join keys.
``max_gram_df`` drops grams whose document frequency exceeds the cap
BEFORE the join (the Lee-et-al. pipelines drop top-frequency grams the
same way); a long run loses only the sub-runs made entirely of
ultra-common grams, and the cap is off by default so the small-scale
semantics stay exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from scrapy_cluster_spark.functions.text import tokens


def gram_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 6,
) -> DataFrame:
    """(id, pos, gram): every k-token gram of every doc, 1-based token
    position.  Docs shorter than k tokens emit nothing (the sequence()
    guard mirrors word_shingles' — Spark's sequence DESCENDS when the
    stop is below the start)."""
    from scrapy_cluster_spark.functions.text import let_bound, shifted_grams

    # let-bind the token array + capture-free shifted-zip gram build:
    # slice(w, i, k) inside a per-element lambda otherwise re-runs the
    # split PER GRAM — O(len²)/row (round-6, see text.let_bound)
    grams = let_bound(
        tokens(text_col),
        lambda w: F.when(
            F.size(w) < k, F.array().cast("array<string>")
        ).otherwise(shifted_grams(w, k)),
    )
    return docs.select(
        F.col(id_col).alias("id"), F.posexplode(grams).alias("pos0", "gram")
    ).select("id", (F.col("pos0") + 1).alias("pos"), "gram")


def shared_token_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 6,
    min_len: int = 10,
    max_gram_df: int | None = None,
    handles: list | None = None,
) -> DataFrame:
    """Maximal exact shared token runs between distinct docs:
    (a, b, a_start, b_start, length) with a < b, 1-based starts,
    length ≥ min_len tokens.

    One span row per maximal diagonal run — an 80-token paste shared by
    two docs is ONE row of length 80, not 75 k-gram rows.  Repeated
    text WITHIN one doc pairs every occurrence across docs (one row per
    diagonal), matching the dot-plot definition.

    ``handles``: the postings table is referenced on BOTH sides of the
    self-join (plus twice more under ``max_gram_df``); pass a handle
    list to persist it so the interpreted gram-building transform runs
    once — the caller owns the unpersist (same lifecycle contract as
    the LSH band keys in functions/dedup.py).
    """
    if min_len < k:
        raise ValueError(f"min_len ({min_len}) must be >= k ({k})")
    g = gram_postings(docs, id_col, text_col, k)
    if handles is not None:
        g = g.persist()
        handles.append(g)
    if max_gram_df is not None:
        df_counts = g.groupBy("gram").agg(
            F.count_distinct("id").alias("_df")
        )
        hot = F.broadcast(
            df_counts.filter(F.col("_df") > max_gram_df).select("gram")
        )
        g = g.join(hot, "gram", "left_anti")
    a = g.select(F.col("id").alias("a"), F.col("pos").alias("pa"), "gram")
    b = g.select(F.col("id").alias("b"), F.col("pos").alias("pb"), "gram")
    m = (
        a.join(b, "gram")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "pa", "pb", (F.col("pa") - F.col("pb")).alias("diag"))
    )
    # consecutive pa on one diagonal ⇒ one run: island id = pa − rank
    win = Window.partitionBy("a", "b", "diag").orderBy("pa")
    runs = m.withColumn("isl", F.col("pa") - F.row_number().over(win))
    return (
        runs.groupBy("a", "b", "diag", "isl")
        .agg(
            F.min("pa").alias("a_start"),
            F.min("pb").alias("b_start"),
            (F.max("pa") - F.min("pa") + k).alias("length"),
        )
        .filter(F.col("length") >= min_len)
        .select("a", "b", "a_start", "b_start", "length")
    )


def span_coverage(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 6,
    min_len: int = 10,
    dup_threshold: float = 0.5,
    max_gram_df: int | None = None,
    handles: list | None = None,
) -> DataFrame:
    """Per-doc duplicated-content accounting against LOWER-id docs:
    (doc_id, n_tokens, covered_tokens, coverage, is_span_dup).

    covered_tokens = size of the UNION of this doc's shared-span token
    intervals on the b side (the doc keeps priority order: content is
    charged to the later doc, the keep-lowest-id policy the doc-level
    dedup families use).  Overlapping spans from different partners
    count once — interval union via a second gaps-and-islands pass,
    partitioned per doc.  ``is_span_dup`` flags docs whose covered
    fraction reaches ``dup_threshold`` — the substring-level analog of
    exact_dedup's is_dup."""
    spans = shared_token_spans(
        docs, id_col, text_col, k, min_len, max_gram_df, handles
    ).select(
        F.col("b").alias("id"),
        F.col("b_start").alias("s"),
        (F.col("b_start") + F.col("length") - 1).alias("e"),
    )
    # interval union per doc: an interval starts a new island iff its
    # start exceeds the running max end of everything before it
    by_start = Window.partitionBy("id").orderBy("s", "e")
    prev_max_e = F.max("e").over(
        by_start.rowsBetween(Window.unboundedPreceding, -1)
    )
    isl = F.sum(
        F.when(
            F.col("s") > F.coalesce(prev_max_e + 1, F.col("s") - 1), 1
        ).otherwise(0)
    ).over(by_start)
    covered = (
        spans.withColumn("isl", isl)
        .groupBy("id", "isl")
        .agg((F.max("e") - F.min("s") + 1).alias("cov"))
        .groupBy("id")
        .agg(F.sum("cov").alias("covered_tokens"))
    )
    n_tok = docs.select(
        F.col(id_col).alias("id"), F.size(tokens(text_col)).alias("n_tokens")
    )
    return (
        n_tok.join(covered, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            F.coalesce("covered_tokens", F.lit(0)).alias("covered_tokens"),
            (
                F.coalesce("covered_tokens", F.lit(0))
                / F.greatest(F.col("n_tokens"), F.lit(1))
            ).alias("coverage"),
            (
                F.coalesce("covered_tokens", F.lit(0))
                / F.greatest(F.col("n_tokens"), F.lit(1))
                >= dup_threshold
            ).alias("is_span_dup"),
        )
    )
