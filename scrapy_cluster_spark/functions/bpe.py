"""Distributed BPE tokenizer training (Sennrich et al., ACL 2016) and
encoding — the "train the tokenizer on the corpus" step that follows
vocabulary profiling in a webtext training pipeline.

The reference has no analog (crawl infrastructure); this is the
canonical scalable formulation:

- **Pass 1 collapses the corpus to a word-frequency table** — the only
  job that touches corpus-scale data (a word count).  BPE statistics
  are identical on (word, count) rows, so every merge round after that
  operates on the word table (~10⁷ rows for a 100 TB corpus), not the
  corpus.
- **Each merge round is one narrow aggregation + one map**: explode
  adjacent symbol pairs weighted by word count, partial-agg the pair
  counts, TakeOrdered-1 for the argmax, then apply the merge per word
  with a vectorized pandas UDF (words are short; the per-word scan is
  bounded by word length, and batches move via Arrow).
- **Determinism**: argmax ties break on (count desc, left asc, right
  asc) — the same rule as the pure-Python reference the tests compare
  against, so the merge SEQUENCE is reproducible across engines,
  partitionings, and cluster sizes.
- **Lineage control**: the symbol table re-persists each round; with a
  caller-provided SnapshotStore the plan chain is truncated every
  ``checkpoint_every`` rounds through a ``bpe_syms`` snapshot commit —
  the CC loop's reliable-checkpoint pattern (parquet on shared storage
  survives executor loss, and the blocks are ordinary files, not
  unfreeable ``localCheckpoint`` executor blocks).  Without one the
  nested-UDF plan grows one node per round — fine to ~50 rounds.

Training is iterative and therefore not SQL-expressible — the driver
correctness gate records the rows-only check; the exact contract is
pinned instead by tests against a from-scratch Python BPE on random
corpora (merge-sequence equality).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

END_OF_WORD = "</w>"


def word_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wcount): the corpus collapsed to word frequencies — the
    single corpus-scale pass; whitespace tokenization matches the
    vocabulary profiler (functions/lm.py)."""
    from scrapy_cluster_spark.functions.text import tokens

    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("wcount"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """Split each word into characters + the end-of-word marker."""
    return words.withColumn(
        "syms",
        F.concat(F.split("word", ""), F.array(F.lit(END_OF_WORD))),
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    """Adjacent-pair counts weighted by word frequency: explode the
    (len-1) positions per word, two-level partial agg on the pair."""
    # single-symbol words (fully merged) contribute no pairs — and
    # Spark's sequence(0, -1) DESCENDS instead of being empty (the
    # word_shingles guard in functions/text.py), so filter them first
    pairs = syms.filter(F.size("syms") >= 2).select(
        "wcount",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("syms") - 2),
                lambda i: F.struct(
                    F.element_at("syms", i + 1).alias("left"),
                    F.element_at("syms", i + 2).alias("right"),
                ),
            )
        ).alias("p"),
    )
    return pairs.groupBy("p.left", "p.right").agg(
        F.sum("wcount").alias("pair_count")
    )


def merge_pair_in_word(syms: list, left: str, right: str) -> list:
    """Greedy left-to-right non-overlapping merge of one pair — the
    reference BPE rule (shared by trainer, encoder, and the test's
    pure-Python model)."""
    out, i, n = [], 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _merge_udf(left: str, right: str):
    """Factory so the UDF closes over the pair BY VALUE — a loop-local
    closure would rebind to the latest round's pair if a lost cached
    partition ever recomputes an earlier round's lineage."""

    @pandas_udf(ArrayType(StringType()))
    def apply_merge(col: pd.Series) -> pd.Series:
        return col.apply(lambda s: merge_pair_in_word(list(s), left, right))

    return apply_merge


def train_bpe(
    df: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    min_pair_count: int = 2,
    checkpoint_every: int = 10,
    store=None,
) -> list[dict]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the merge
    sequence [{rank, left, right, pair_count}, ...] in learned order.
    Stops early when the best remaining pair falls under
    ``min_pair_count`` (merging hapax pairs memorizes noise).

    ``store``: optional SnapshotStore — every ``checkpoint_every``
    rounds the symbol table is committed as a ``bpe_syms`` snapshot and
    re-read, truncating the k-round plan chain.  Truncation is NOT
    optional: Spark renders the physical-plan description string on
    every action, and nested InMemoryRelation trees make that string
    EXPONENTIAL in loop depth — an untruncated 20-round loop OOMs an
    8 GB driver inside ``generateTreeString`` before any data moves.
    When no store is given a process-temp one is created at the first
    checkpoint (tmpfs when available, reclaimed at exit).
    ``localCheckpoint`` is deliberately NOT used: its executor-resident
    blocks die with the executor and cannot be freed through
    ``DataFrame.unpersist``, so they leak past the repo's
    release_caches lifecycle (they show up as leaked storage in the
    bench's between-rep assertions)."""
    import shutil

    from ..store import scratch_store

    spark = df.sparkSession
    owns_store = store is None

    syms = _initial_symbols(word_table(df, text_col)).persist()
    prev = None
    merges: list[dict] = []
    try:
        for rank in range(n_merges):
            # ONE job per round: this argmax materializes syms' cache,
            # so the previous round's table (syms' cached parent) only
            # becomes droppable now — no separate count() job
            best = (
                _pair_counts(syms)
                .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
                .limit(1)
                .collect()
            )
            if prev is not None:
                prev.unpersist()
                prev = None
            if not best or best[0]["pair_count"] < min_pair_count:
                break
            left, right, cnt = best[0]["left"], best[0]["right"], int(best[0]["pair_count"])
            merges.append(
                {"rank": rank, "left": left, "right": right, "pair_count": cnt}
            )

            nxt = syms.withColumn("syms", _merge_udf(left, right)("syms"))
            if (rank + 1) % checkpoint_every == 0:
                if store is None:
                    store = scratch_store(spark, "scs-bpe-")
                store.overwrite("bpe_syms", nxt)
                nxt = store.read("bpe_syms", syms.schema)
                store.expire_snapshots("bpe_syms", keep_last=2)
            prev, syms = syms, nxt.persist()
    finally:
        syms.unpersist()
        if prev is not None:
            prev.unpersist()
        if owns_store and store is not None:
            # the return value is a plain list — nothing reads the
            # scratch snapshots after the loop
            shutil.rmtree(store.root, ignore_errors=True)
    return merges


def merges_df(spark, merges: list[dict]) -> DataFrame:
    """The learned merge table as a DataFrame (rank, left, right,
    pair_count) — broadcast-sized, joins into encoding pipelines."""
    return spark.createDataFrame(
        [(m["rank"], m["left"], m["right"], m["pair_count"]) for m in merges],
        "rank int, left string, right string, pair_count bigint",
    )


def bpe_encode(
    df: DataFrame, merges: list[dict], text_col: str = "text"
) -> DataFrame:
    """Encode documents with a learned merge table: per word, apply
    merges in RANK order (the BPE encode rule); output the subword
    sequence and its length.  The merge list is closure-captured into
    the Arrow UDF — broadcast-sized by construction (≤ n_merges
    rows)."""
    ranked = [(m["left"], m["right"]) for m in sorted(merges, key=lambda m: m["rank"])]

    def encode_word(word: str) -> list:
        syms = list(word) + [END_OF_WORD]
        for left, right in ranked:
            if len(syms) < 2:
                break
            syms = merge_pair_in_word(syms, left, right)
        return syms

    @pandas_udf(ArrayType(StringType()))
    def encode(col: pd.Series) -> pd.Series:
        cache: dict = {}

        def enc_text(text: str) -> list:
            out = []
            for w in (text or "").split():
                got = cache.get(w)
                if got is None:
                    got = cache[w] = encode_word(w)
                out.extend(got)
            return out

        return col.apply(enc_text)

    return df.withColumn("subwords", encode(text_col)).withColumn(
        "n_subwords", F.size("subwords")
    )
