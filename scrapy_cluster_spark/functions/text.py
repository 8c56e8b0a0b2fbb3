"""Text-analysis expressions for large-scale training-data pipelines.

All of these are built-in Spark SQL expressions (JVM-side, codegen'd) —
no UDFs — so they run at 100 TB scan speed and have exact DuckDB-SQL
oracles.  Operating surface: the ``documents`` table
(doc_id, text, lang, source, n_chars).

Components:
  tokens            whitespace tokenization (regexp split, trim first)
  token_count       #tokens
  word_shingles     k-word shingles (the dedup unit)
  punct_ratio       punctuation chars / total chars
  stopword_ratio    stopword tokens / tokens
  quality_score     length + punctuation + stopword composite in [0,1]
  lang_scores       per-language stopword-hit counts (lang-ID heuristic)
  doc_fingerprint   md5 of normalized text (exact-dup key)
"""

from __future__ import annotations

import re as _re

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.types import ArrayType, LongType

# tiny per-language function-word lists (public common words)
LANG_STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "nicht"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est", "pour", "que"],
    "es": ["el", "la", "y", "los", "las", "un", "una", "es", "por", "que"],
}

PUNCT_CLASS = r"[.,!?;:]"


def tokens(text: str | Column = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def token_count(text: str | Column = "text") -> Column:
    return F.size(tokens(text))


def let_bound(arr: Column, body) -> Column:
    """Evaluate ``arr`` ONCE and bind it as a lambda variable inside
    ``body``: higher-order functions are CodegenFallback (interpreted),
    and a per-element lambda that references the outer array expression
    (``element_at(w, i)``, ``slice(w, i, k)``) re-evaluates that whole
    expression PER ELEMENT — O(len²) per row when ``arr`` is the token
    split.  ``transform(array(x), a -> body(a))[0]`` binds the computed
    value instead, making every inner reference a slot read (the
    round-5 ngram_repetition fix, generalized in round 6 to every
    gram/shingle/pair builder).

    CONSTRAINT: ``body`` must not build a NESTED lambda that captures
    the outer lambda variable — e.g. ``transform(seq, i -> slice(a, i,
    k))`` inside ``body(a)``.  Spark 4.1's Python-UDF extraction
    mis-canonicalizes cross-lambda captures when the expression is a
    UDF argument duplicated across plan branches (leaves a raw
    PythonUDF in an InterpretedUnsafeProjection → INTERNAL_ERROR).
    Use the shifted-``arrays_zip`` shape instead (see
    :func:`shifted_grams`): the inner lambda then references only its
    own struct variable."""
    return F.transform(F.array(arr), body)[0]


def shifted_grams(a: Column, k: int) -> Column:
    """All k-grams of an ALREADY-BOUND token array ``a`` as
    array<string> (space-joined), via arrays_zip of k shifted slices —
    the capture-free gram shape (see :func:`let_bound`): zip element j
    is struct(w[j], w[j+1], …, w[j+k−1]), and the concat lambda touches
    only its own struct variable.  One O(len) pass per row instead of
    the O(len²) slice-per-element build.  Caller guards len < k."""
    n = F.size(a)
    zipped = F.arrays_zip(*[F.slice(a, j + 1, n - (k - 1)) for j in range(k)])
    return F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[str(j)] for j in range(k)])
    )


def word_shingles(text: str | Column = "text", k: int = 3) -> Column:
    """Distinct k-word shingles as an array<string>.

    Guarded for <k tokens: Spark's sequence-style gram builders DESCEND
    for short docs, unlike DuckDB's empty generate_series — the when()
    keeps parity."""
    return let_bound(
        tokens(text),
        lambda w: F.when(F.size(w) < k, F.array().cast("array<string>")).otherwise(
            F.array_distinct(shifted_grams(w, k))
        ),
    )


def punct_ratio(text: str | Column = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(PUNCT_CLASS)) / F.greatest(F.length(c), F.lit(1))


def stopword_ratio(text: str | Column = "text", lang: str = "en") -> Column:
    words = LANG_STOPWORDS[lang]
    t = F.transform(tokens(text), lambda w: F.lower(w))
    hits = F.size(F.filter(t, lambda w: w.isin(words)))
    return hits / F.greatest(F.size(t), F.lit(1))


def lang_hit_counts(text: str | Column = "text") -> dict[str, Column]:
    """Per-language stopword hits — the n-gram-free lang-ID heuristic."""
    t = F.transform(tokens(text), lambda w: F.lower(w))
    return {
        lang: F.size(F.filter(t, lambda w: w.isin(words)))
        for lang, words in LANG_STOPWORDS.items()
    }


def lang_id(text: str | Column = "text") -> Column:
    """argmax language by stopword hits; 'und' (undetermined) when all 0.

    Deterministic tiebreak: language order en > de > fr > es (first max
    wins in that order)."""
    hits = lang_hit_counts(text)
    best = F.greatest(*hits.values())
    out = F.lit("und")
    # reversed so earlier languages win ties via later when() precedence
    for lang in reversed(list(hits)):
        out = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(out)
    return out


def quality_score(text: str | Column = "text") -> Column:
    """Composite quality in [0,1]: length factor × (1 - punct excess) ×
    stopword presence factor.  Deterministic, SQL-only."""
    c = F.col(text) if isinstance(text, str) else text
    n = token_count(c)
    length_f = F.least(n / F.lit(100.0), F.lit(1.0))
    punct_f = F.lit(1.0) - F.least(punct_ratio(c) * F.lit(5.0), F.lit(1.0))
    stop_f = F.least(stopword_ratio(c) * F.lit(10.0), F.lit(1.0))
    return F.round(length_f * (F.lit(0.5) + F.lit(0.25) * punct_f + F.lit(0.25) * stop_f), 6)


def doc_fingerprint(text: str | Column = "text") -> Column:
    """md5 of whitespace-normalized lowercased text — the exact-dup key
    (both Spark and DuckDB expose identical md5)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


def word_ngrams(text: str | Column = "text", k: int = 3) -> Column:
    """ALL word k-grams in order (with repeats — unlike word_shingles'
    distinct set); empty for <k tokens (same guard).  Token array
    let-bound + capture-free zip build: split and gram pass are each
    O(len) per row (see :func:`let_bound` / :func:`shifted_grams`)."""
    return let_bound(
        tokens(text),
        lambda w: F.when(F.size(w) < k, F.array().cast("array<string>")).otherwise(
            shifted_grams(w, k)
        ),
    )


def ngram_repetition(text: str | Column = "text", k: int = 3) -> Column:
    """Duplicated k-gram fraction — the within-document repetition
    signal LLM corpus filters use (Rae et al. Gopher §A.1.1, public):
    1 − distinct/total over word k-grams; 0.0 when fewer than k tokens.

    The gram array is LET-BOUND via ``transform(array(g), a -> ...)[0]``
    so it evaluates ONCE per row: higher-order functions are
    CodegenFallback (interpreted), and referencing ``g`` three times in
    the naive expression re-built every gram string thrice — 2.8× the
    scan cost at sf0.1 (surfaced by the round-5 forced-materialization
    bench protocol).  A lambda variable binds the evaluated value, so
    every reference inside is free."""
    g = word_ngrams(text, k)
    return F.transform(
        F.array(g),
        lambda a: F.when(F.size(a) <= 0, F.lit(0.0)).otherwise(
            F.round(F.lit(1.0) - F.size(F.array_distinct(a)) / F.size(a), 6)
        ),
    )[0]


# PII patterns restricted to the Java-regex ∩ RE2 common subset so the
# Spark expressions and DuckDB oracles match character-for-character.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"


def pii_email_count(text: str | Column = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(EMAIL_PATTERN))


def pii_phone_count(text: str | Column = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(PHONE_PATTERN))


def scrub_pii(text: str | Column = "text", repl: str = "[PII]") -> Column:
    """Redact emails then phone numbers — the pre-training scrub pass.
    regexp_replace is JVM codegen'd: the scrub runs at scan speed over
    100 TB with no UDF."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(
        F.regexp_replace(c, EMAIL_PATTERN, repl), PHONE_PATTERN, repl
    )


def mean_word_length(text: str | Column = "text") -> Column:
    w = tokens(text)
    total = F.aggregate(
        F.transform(w, lambda x: F.length(x)), F.lit(0), lambda acc, x: acc + x
    )
    return F.round(total / F.greatest(F.size(w), F.lit(1)), 6)


def alpha_word_ratio(text: str | Column = "text") -> Column:
    """Fraction of words containing ≥1 alphabetic char (Gopher rule)."""
    w = tokens(text)
    hits = F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]")))
    return F.round(hits / F.greatest(F.size(w), F.lit(1)), 6)


def gopher_quality_flags(text: str | Column = "text") -> dict[str, Column]:
    """Gopher-style corpus-filter rules (Rae et al. 2021 §A.1.1 —
    public thresholds), each as a boolean column:

      words_ok      50 ≤ #words ≤ 100,000
      word_len_ok   3 ≤ mean word length ≤ 10
      alpha_ok      ≥ 80% of words contain an alphabetic character
      stopword_ok   ≥ 2 distinct common-stopword hits
      repetition_ok duplicated 3-gram fraction ≤ 0.2

    All built-in SQL; ``passes`` is their conjunction."""
    n = token_count(text)
    mwl = mean_word_length(text)
    t = F.transform(tokens(text), lambda w: F.lower(w))
    stop_hits = F.size(
        F.array_distinct(F.filter(t, lambda w: w.isin(LANG_STOPWORDS["en"])))
    )
    flags = {
        "words_ok": (n >= 50) & (n <= 100_000),
        "word_len_ok": (mwl >= 3.0) & (mwl <= 10.0),
        "alpha_ok": alpha_word_ratio(text) >= 0.8,
        "stopword_ok": stop_hits >= 2,
        "repetition_ok": ngram_repetition(text) <= 0.2,
    }
    passes = None
    for c in flags.values():
        passes = c if passes is None else (passes & c)
    flags["passes"] = passes
    return flags


# GPT-2-style pre-tokenizer pattern (public: the openai/gpt-2 encoder
# regex), restricted to the common subset of Java regex (Spark) and RE2
# (DuckDB): contraction suffixes, letter runs, digit runs, punctuation
# runs, whitespace runs — the original's trailing-space lookahead is
# dropped (RE2 has no lookahead), which only re-attributes trailing
# whitespace between matches, not the count scale.
BPE_TOKEN_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+"


def subword_token_count(text: str | Column = "text") -> Column:
    """BPE-ish token count: matches of the pre-tokenizer regex — the
    count an LLM-data pipeline budgets corpus size with (whitespace
    token_count undercounts punctuation-heavy text).  Pure JVM
    regexp_count, scan-speed at 100 TB."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(BPE_TOKEN_PATTERN))


def winnow_fingerprints(
    text: str | Column = "text",
    k: int = 7,
    window: int = 4,
    prime: int = (1 << 31) - 1,
    base: int = 257,
) -> Column:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    SIGMOD'03 — public algorithm): Rabin-Karp rolling hash over
    normalized characters, k-gram hashes, min-sampled per window of
    ``window`` consecutive hashes, deduplicated + sorted.  Guarantees
    any shared substring >= k+window-1 chars yields at least one shared
    fingerprint — the local document-fingerprint family next to
    MinHash's global one.

    Arrow-vectorized numpy UDF (a pure-SQL nested transform/slice
    formulation is interpreted, not codegen'd — measured ~4 s/doc);
    the polynomial-dot-mod-p equals the iterative (acc*base+x) mod p
    the DuckDB oracle computes, and prime 2^31-1 keeps every
    intermediate under 2^55 — int64-safe in both engines."""
    pows = np.array([pow(base, k - 1 - j, prime) for j in range(k)], dtype=np.uint64)

    @F.pandas_udf(ArrayType(LongType()))
    def winnow(texts: pd.Series) -> pd.Series:
        def fp(t):
            if t is None:
                return []
            s = _re.sub(r"\s+", " ", t.strip().lower())
            if len(s) < k:
                return []
            c = np.fromiter((ord(ch) for ch in s), dtype=np.uint64, count=len(s))
            win_view = np.lib.stride_tricks.sliding_window_view(c, k)
            grams = (win_view * pows[None, :]).sum(axis=1) % np.uint64(prime)
            if grams.size < window:
                mins = np.array([grams.min()])
            else:
                mins = np.lib.stride_tricks.sliding_window_view(grams, window).min(axis=1)
            return sorted({int(x) for x in mins})

        return texts.map(fp)

    c = F.col(text) if isinstance(text, str) else text
    return winnow(c)
