"""Corpus-level statistical text profiling: vocabulary building,
TF-IDF keyword extraction, within-doc token entropy, and unigram-LM
cross-entropy — the CCNet-style "perplexity" quality signal computed
against a language model trained on the corpus itself.

The reference has no analog (scrapy-cluster stops at crawl output);
these are the standard next steps a webtext training pipeline runs on
the crawled corpus: build the vocabulary, surface per-document
keywords, and score documents by how (a)typical their token
distribution is so downstream sampling (``stratified_sample``) can
bucket head/middle/tail the way CCNet buckets by LM perplexity.

Everything here is exact and deterministic — no model weights, no
rand(): the "LM" is the corpus unigram distribution itself, so the
whole family is reproducible in ANSI SQL and hash-checked by the
DuckDB oracle.  Transcendentals (ln) are rounded to 6 decimals on
output, matching the repo-wide float-parity convention.

Plan shape at 100 TB:
- ``doc_token_counts`` is one explode + one partial-aggregated
  groupBy (map-side combine collapses each doc's repeats before the
  shuffle on (doc_id, token)); no UDF, whole-stage codegen throughout.
- ``vocab`` re-aggregates those counts by token.  Hot tokens
  (stopwords) are NOT a skew hazard: the input is already one row per
  (doc, token), so the token-key shuffle carries at most n_docs rows
  per token and partial aggs shrink it further.
- TF-IDF / cross-entropy join the per-doc counts back to the vocab.
  The vocab side is broadcast (post-``min_df``-prune a 100 TB corpus
  vocabulary is ~10⁷ rows ≈ hundreds of MB; prune harder or set
  ``broadcast_vocab=False`` to fall back to a shuffle join with AQE
  skew handling if it outgrows the broadcast budget).  Broadcasting
  removes the hot-token join skew entirely.
- Corpus scalars (doc count, total token mass) ride a single-row
  broadcast cross join — no driver-side ``.count()`` job, the scalar
  fuses into the one plan.
- ``vocab_topk``'s global order is Spark's TakeOrdered (per-partition
  top-k, merge of k·n_partitions rows) — no global sort; the rank
  window then runs over only the k survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from scrapy_cluster_spark.functions.text import token_count, tokens


def doc_token_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, token, c): one row per distinct token per document.

    Documents with zero tokens (empty/whitespace text) contribute no
    rows — downstream scores are defined over docs with ≥1 token.

    Round-6 plan (guide §2.3, aggregate before you shuffle): the
    original ``explode → groupBy(doc_id, token)`` shuffled ~12M token
    rows at sf1.0 on a key so fine-grained that map-side combine barely
    collapsed anything.  A document lives in ONE row, so its token
    counts need no shuffle at all — one Arrow ``mapInPandas`` pass
    emits (doc_id, token, c) directly, and downstream per-doc
    aggregations (entropy, xent) collapse to one shuffled row per doc
    via partial aggs.  Tokenizer parity with the JVM ``tokens()``
    (= split(trim(text), '\\s+') + drop empties) is EXACT: Spark's
    ``trim`` strips 0x20 spaces only, Java regex ``\\s`` is ASCII-only
    — mirrored by ``str.strip(" ")`` + ``re.compile(r"\\s+",
    re.ASCII)`` + dropping empty tokens (a unicode-whitespace-aware
    Python tokenizer would shred tokens the JVM keeps whole; parity is
    property-tested against the explode formulation on unicode
    inputs)."""
    import re
    from collections import Counter
    from collections.abc import Iterator

    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()
    ws = re.compile(r"\s+", re.ASCII)

    def count_tokens(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            toks: list = []
            cnts: list = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                c = Counter(ws.split(text.strip(" ")))
                c.pop("", None)
                if not c:
                    continue
                ids.extend([did] * len(c))
                toks.extend(c.keys())
                cnts.extend(c.values())
            yield pd.DataFrame({"doc_id": ids, "token": toks, "c": cnts})

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        count_tokens, f"doc_id {id_type}, token string, c bigint"
    )


def vocab(counts: DataFrame) -> DataFrame:
    """(token, tf, df_docs) from ``doc_token_counts`` output: corpus
    term frequency and document frequency."""
    return counts.groupBy("token").agg(
        F.sum("c").cast("bigint").alias("tf"),
        F.count("*").alias("df_docs"),
    )


def vocab_topk(df: DataFrame, k: int = 100, text_col: str = "text") -> DataFrame:
    """Top-k corpus vocabulary by term frequency, rank ties broken by
    token text — the deterministic head of the vocabulary a tokenizer
    trainer would consume.

    ``orderBy().limit(k)`` compiles to TakeOrderedAndProject (two-phase
    top-k), so no global sort materializes; the row_number window runs
    on the k-row survivor set only.
    """
    v = vocab(doc_token_counts(df, text_col=text_col))
    top = v.orderBy(F.desc("tf"), F.asc("token")).limit(k)
    w = Window.orderBy(F.desc("tf"), F.asc("token"))
    return top.select(
        "token", "tf", "df_docs", F.row_number().over(w).alias("rank")
    )


def tfidf_topk(
    df: DataFrame,
    m: int = 5,
    min_df: int = 1,
    text_col: str = "text",
    broadcast_vocab: bool = True,
    handles: list | None = None,
) -> DataFrame:
    """Per-document top-m keywords by TF-IDF
    (tf = c/L, idf = ln((N+1)/(df+1)) + 1, smooth).

    Ranking uses only INTEGER keys — (count desc, doc-frequency asc,
    token asc) — never the float score, so the selected rows are
    bit-identical across engines and cluster sizes; the rounded float
    score is carried as output.  ``min_df`` prunes hapax noise AND
    bounds the broadcast vocabulary at scale.  Pass ``handles`` to
    persist the token-count intermediate across its two consumers
    (vocab build + join back); the caller owns the unpersist.
    """
    counts = doc_token_counts(df, text_col=text_col)
    if handles is not None:
        counts = counts.persist()
        handles.append(counts)
    v = vocab(counts).filter(F.col("df_docs") >= min_df)
    if broadcast_vocab:
        v = F.broadcast(v)
    nd = df.agg(F.count("*").alias("n_docs"))
    wdoc = Window.partitionBy("doc_id")
    wrank = Window.partitionBy("doc_id").orderBy(
        F.desc("c"), F.asc("df_docs"), F.asc("token")
    )
    return (
        counts.join(v, "token")
        .crossJoin(F.broadcast(nd))
        .withColumn("doc_len", F.sum("c").over(wdoc))
        .withColumn("rank", F.row_number().over(wrank))
        .filter(F.col("rank") <= m)
        .select(
            "doc_id",
            "rank",
            "token",
            "c",
            "df_docs",
            F.round(
                (F.col("c") / F.col("doc_len"))
                * (F.log((F.col("n_docs") + 1) / (F.col("df_docs") + 1)) + 1),
                6,
            ).alias("tfidf"),
        )
    )


def perplexity_buckets(
    df: DataFrame,
    n_buckets: int = 3,
    text_col: str = "text",
    handles: list | None = None,
) -> DataFrame:
    """CCNet-style head/middle/tail split: each doc gets an integer
    bucket 0..n_buckets−1 by its position in the corpus cross-entropy
    distribution (bucket 0 = lowest xent = most stereotypical).

    Bucketing is EXACT and interpolation-free, so it hash-checks: the
    per-value cumulative doc count over the (small, post-agg) distinct
    rounded-xent table defines ``bucket(v) = ((cum(v)−1)·B) div n``
    with integer floor division — ties share a value, hence a bucket,
    on every engine and cluster size.  No global row sort: the only
    ordered window runs over DISTINCT xent values AFTER aggregation
    (≤ 10⁶ distinct 6-dp values regardless of corpus size), and docs
    join the value→bucket map back by broadcast.
    """
    x = unigram_xent(df, text_col=text_col, handles=handles)
    if handles is not None:
        # x feeds three consumers (histogram, total, join-back); persist
        # the small per-doc score table so xent computes once
        x = x.persist()
        handles.append(x)
    hist = x.groupBy("xent").agg(F.count("*").alias("nv"))
    tot = x.agg(F.count("*").alias("n_docs"))
    wcum = Window.orderBy("xent").rowsBetween(Window.unboundedPreceding, 0)
    buckets = (
        hist.withColumn("cum", F.sum("nv").over(wcum))
        .crossJoin(F.broadcast(tot))
        .select(
            "xent",
            F.least(
                F.expr(f"((cum - 1) * {n_buckets}) div n_docs"),
                F.lit(n_buckets - 1),
            ).cast("int").alias("ppl_bucket"),
        )
    )
    return x.join(F.broadcast(buckets), "xent").select(
        "doc_id", "n_tokens", "xent", "ppl_bucket"
    )


def token_entropy(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Shannon entropy (nats) of each document's own token
    distribution: H = ln(L) − (Σ c·ln c)/L.  A repetition/diversity
    quality signal — near-0 for degenerate keyword-stuffed pages,
    ln(L) for all-distinct text.  One explode + two aggs, no joins.
    """
    counts = doc_token_counts(df, text_col=text_col)
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("c").alias("L"),
            F.sum(F.col("c") * F.log("c")).alias("clnc"),
        )
        .select(
            "doc_id",
            F.col("L").alias("n_tokens"),
            F.round(F.log("L") - F.col("clnc") / F.col("L"), 6).alias("entropy"),
        )
    )


def unigram_xent(
    df: DataFrame,
    text_col: str = "text",
    broadcast_vocab: bool = True,
    handles: list | None = None,
) -> DataFrame:
    """Cross-entropy (nats/token) of each document under the corpus
    unigram LM: X = ln(T) − (Σ c·ln tf)/L, where tf is the corpus
    count of each token and T the total token mass.  exp(X) is the
    unigram perplexity — the CCNet head/middle/tail quality signal,
    here exact and self-trained so the oracle can verify it.  Every
    doc token exists in the corpus vocabulary by construction, so no
    smoothing term is needed (the +1-smoothed variant only matters
    when scoring against a FOREIGN corpus's vocab).

    Low X = stereotypical text (common tokens), high X = rare-token
    text; both tails are what quality filtering inspects.
    """
    counts = doc_token_counts(df, text_col=text_col)
    if handles is not None:
        counts = counts.persist()
        handles.append(counts)
    vv = vocab(counts).select("token", "tf")
    tot = vv.agg(F.sum("tf").cast("bigint").alias("tok_total"))
    v = F.broadcast(vv) if broadcast_vocab else vv
    return (
        counts.join(v, "token")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id", "tok_total")
        .agg(
            F.sum("c").alias("L"),
            F.sum(F.col("c") * F.log("tf")).alias("clntf"),
        )
        .select(
            "doc_id",
            F.col("L").alias("n_tokens"),
            F.round(
                F.log("tok_total") - F.col("clntf") / F.col("L"), 6
            ).alias("xent"),
        )
    )


def bigram_table(counts_input: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, w1, w2, c2): per-doc adjacent word-pair counts.  Pairs
    come from a transform over the token array (guarded: <2 tokens ⇒
    no pairs; Spark's sequence(1, 0) DESCENDS) — no positional
    self-join."""
    from scrapy_cluster_spark.functions.text import let_bound

    # let-bind the token array + capture-free shifted-zip pair build:
    # element_at(w, i) inside a per-element lambda otherwise re-runs
    # the split PER PAIR — O(len²)/row (round-6, see text.let_bound)
    pairs = let_bound(
        tokens(text_col),
        lambda w: F.when(
            F.size(w) < 2, F.array().cast("array<struct<w1:string,w2:string>>")
        ).otherwise(
            F.arrays_zip(
                F.slice(w, 1, F.size(w) - 1).alias("w1"),
                F.slice(w, 2, F.size(w) - 1).alias("w2"),
            ).cast("array<struct<w1:string,w2:string>>")
        ),
    )
    return (
        counts_input.select(F.col(id_col).alias("doc_id"), F.explode(pairs).alias("p"))
        .select("doc_id", "p.w1", "p.w2")
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count("*").alias("c2"))
    )


def bigram_xent(
    df: DataFrame,
    k_smooth: float = 0.5,
    text_col: str = "text",
    broadcast_vocab: bool = True,
    handles: list | None = None,
) -> DataFrame:
    """Cross-entropy per doc under the corpus's own add-k-smoothed
    BIGRAM LM: X = −(Σ c₂·ln p(w2|w1))/B with
    p(w2|w1) = (C₂(w1,w2)+k)/(C₁(w1)+k·V), B = the doc's bigram count.
    One step closer to CCNet's 5-gram KenLM than ``unigram_xent``,
    still exact + self-trained so the SQL oracle hash-checks it.

    Plan: the per-doc bigram table joins corpus bigram counts (on
    (w1,w2)) and unigram counts (on w1) — both broadcast (the corpus
    bigram table is the big one at scale: prune with a min count or
    set ``broadcast_vocab=False`` for a shuffle join + AQE); V rides a
    single-row broadcast cross join.  Docs with <2 tokens have no
    bigrams and produce no row (same contract as token_entropy).
    """
    db = bigram_table(df, text_col)
    if handles is not None:
        db = db.persist()
        handles.append(db)
    corpus2 = db.groupBy("w1", "w2").agg(F.sum("c2").cast("bigint").alias("cc2"))
    counts = doc_token_counts(df, text_col=text_col)
    corpus1 = vocab(counts).select("token", "tf")
    vsize = corpus1.agg(F.count("*").cast("bigint").alias("V"))
    if broadcast_vocab:
        corpus2 = F.broadcast(corpus2)
        corpus1 = F.broadcast(corpus1)
    return (
        db.join(corpus2, ["w1", "w2"])
        .join(corpus1.withColumnRenamed("token", "w1"), "w1")
        .crossJoin(F.broadcast(vsize))
        .groupBy("doc_id")
        .agg(
            F.sum("c2").alias("n_bigrams"),
            F.round(
                -F.sum(
                    F.col("c2")
                    * F.log(
                        (F.col("cc2") + F.lit(k_smooth))
                        / (F.col("tf") + F.lit(k_smooth) * F.col("V"))
                    )
                )
                / F.sum("c2"),
                6,
            ).alias("bigram_xent"),
        )
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    threshold: float = 0.6,
    min_df: int = 1,
    max_df_frac: float = 0.5,
    max_df: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    handles: list | None = None,
) -> DataFrame:
    """Exact sparse cosine similarity over TF-IDF vectors: (a, b,
    cosine) for every ordered doc pair with cosine ≥ ``threshold`` —
    the lexical-overlap counterpart to MinHash/Jaccard (set overlap)
    and embedding cosine (dense): near-dup detection that weighs WHAT
    is shared, not just how much.

    Weights w(d,t) = c · (ln((N+1)/(df+1)) + 1) (the ``tfidf_topk``
    smoothing) over the df-windowed vocabulary (``min_df`` ≤ df ≤
    ``max_df`` | ⌊N·max_df_frac⌋), L2-normalized per doc; docs with no
    surviving tokens produce no rows.

    Plan: inverted-index (posting-list) self-join on token — NOT
    all-pairs: each token t contributes C(df(t), 2) candidate products,
    so the df ceiling is ALSO the skew/complexity bound (stopwords are
    exactly the mega-posting hot keys; at corpus scale lower
    ``max_df_frac`` or set an absolute ``max_df``).  One shuffle on
    token for the join, one on (a, b) for the grouped dot product;
    vocab and the doc-count scalar broadcast.  Exact w.r.t. the stated
    df-windowed weighting (the window is part of the semantics, as in
    every practical TF-IDF system) — fully SQL-expressible, so the
    oracle hash-checks it.
    """
    counts = doc_token_counts(df, id_col=id_col, text_col=text_col)
    nd = df.agg(F.count("*").alias("n_docs"))
    df_cap = (
        F.lit(max_df)
        if max_df is not None
        else F.greatest(F.lit(1), F.floor(F.col("n_docs") * F.lit(max_df_frac)))
    )
    v = (
        vocab(counts)
        .crossJoin(F.broadcast(nd))
        .filter((F.col("df_docs") >= min_df) & (F.col("df_docs") <= df_cap))
        .select("token", "df_docs", "n_docs")
    )
    w = counts.join(F.broadcast(v), "token").select(
        "doc_id",
        "token",
        (
            F.col("c")
            * (F.log((F.col("n_docs") + 1) / (F.col("df_docs") + 1)) + 1)
        ).alias("w"),
    )
    norms = w.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    wn = w.join(norms, "doc_id").select(
        "doc_id", "token", (F.col("w") / F.col("nrm")).alias("wn")
    )
    if handles is not None:
        wn = wn.persist()
        handles.append(wn)
    a = wn.select(F.col("doc_id").alias("a"), "token", F.col("wn").alias("wa"))
    b = wn.select(F.col("doc_id").alias("b"), "token", F.col("wn").alias("wb"))
    return (
        a.join(b, "token")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.round(F.sum(F.col("wa") * F.col("wb")), 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def length_quantiles(
    df: DataFrame,
    probs: tuple = (0.1, 0.5, 0.9, 0.99),
    text_col: str = "text",
    group_col: str = "source",
    approx: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group token-length percentiles — the thresholds a corpus
    filter derives (cut below p10, flag above p99 per source/language).

    ``approx=False`` (default): Spark's exact ``percentile`` — sorted
    per-group interpolation, agg state O(distinct lengths per group);
    right for profiling runs and hash-oracled against DuckDB's
    ``quantile_cont`` (bit-identical interpolation, verified).
    ``approx=True``: ``percentile_approx`` — the Greenwald-Khanna
    sketch: bounded memory, MERGEABLE partial state (map-side combine
    works), rank error ≤ 1/accuracy — the 100 TB path, pinned within
    rank error of the exact answer by test rather than oracled.
    """
    lens = df.select(
        F.col(group_col).alias(group_col),
        token_count(text_col).cast("double").alias("len"),
    )
    plist = [float(p) for p in probs]
    if approx:
        q = F.percentile_approx("len", plist, accuracy)
    else:
        q = F.percentile("len", F.lit(plist))
    return (
        lens.groupBy(group_col)
        .agg(F.count("*").alias("n_docs"), q.alias("qs"))
        .select(
            group_col,
            "n_docs",
            *[
                F.round(F.element_at("qs", i + 1), 6).alias(f"p{int(p * 100)}")
                for i, p in enumerate(plist)
            ],
        )
    )


def frequent_tokens(
    df: DataFrame,
    theta: float = 0.005,
    text_col: str = "text",
    k: int | None = None,
) -> DataFrame:
    """Corpus heavy hitters: every token with frequency ≥ θ·T (T = the
    corpus token count), with its exact count — sketch-then-verify, the
    same contract as the MinHash family (approximate candidates, exact
    output, hash-oracled).

    Phase 1 — Misra-Gries (Misra & Gries 1982) per partition via
    ``mapInPandas``: k = ⌈1/θ⌉ counters per partition; an item absent
    from a partition's summary has local count ≤ n_p/(k+1), so summed
    over partitions anything absent EVERYWHERE has global count ≤
    T/(k+1) < θ·T — the union of partition summaries is a guaranteed
    superset of the answer at ≤ k·n_partitions candidates, with no
    vocabulary-sized shuffle.
    Phase 2 — exact verify: explode tokens, semi-join the broadcast
    candidate set (the only rows that shuffle), count, keep ≥ θ·T.

    At 100 TB the full vocabulary groupBy (what ``vocab`` does) shuffles
    billions of (token, count) partials; this shuffles only candidate
    occurrences — the classic reason frequent-item SKETCHES exist.
    """
    cands = mg_candidates(df, theta=theta, text_col=text_col, k=k)
    toks = df.select(F.explode(tokens(text_col)).alias("token")).filter(
        F.col("token") != ""
    )
    total = toks.agg(F.count("*").cast("bigint").alias("t"))
    return (
        toks.join(F.broadcast(cands), "token")
        .crossJoin(F.broadcast(total))
        .groupBy("token", "t")
        .agg(F.count("*").cast("bigint").alias("c"))
        .filter(F.col("c") >= F.lit(theta) * F.col("t"))
        .select("token", "c")
    )


def mg_candidates(
    df: DataFrame,
    theta: float = 0.005,
    text_col: str = "text",
    k: int | None = None,
) -> DataFrame:
    """Phase 1 of :func:`frequent_tokens`, exposed for testing and for
    callers that want the raw candidate set: one Misra-Gries summary of
    ≤ k = ⌈1/θ⌉ counters per partition, unioned distinct.  Guaranteed
    superset of every token with global frequency ≥ θ·T."""
    import math
    import re

    import pandas as pd

    k = k or max(1, math.ceil(1.0 / theta))
    # tokenize EXACTLY like the verify phase (functions.text.tokens =
    # Java regex \s+, ASCII-only): Python str.split() also splits on
    # Unicode whitespace (U+00A0, U+2009, ...), which would shred a
    # token the JVM side keeps whole — the sketch would then never
    # nominate it and the guaranteed-superset contract would break
    ws = re.compile(r"\s+", re.ASCII)

    def _mg(batches):
        counters: dict = {}
        for pdf in batches:
            for text in pdf[text_col]:
                if not text:
                    continue
                for t in ws.split(text.strip()):
                    if not t:
                        continue
                    if t in counters:
                        counters[t] += 1
                    elif len(counters) < k:
                        counters[t] = 1
                    else:
                        # decrement-all step; drop zeros
                        dead = []
                        for key in counters:
                            counters[key] -= 1
                            if counters[key] == 0:
                                dead.append(key)
                        for key in dead:
                            del counters[key]
        yield pd.DataFrame({"token": list(counters.keys())})

    return df.select(text_col).mapInPandas(_mg, "token string").distinct()
