"""Text-analysis operators over the documents table.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen); the only Python is the language-ID kernel, which runs
as an Arrow-batched pandas UDF. Designed for the flat driver shape
``documents(doc_id, text, lang, source, n_chars)`` but any (id, text) works.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import StringType

# A small function-word list (shared with the DuckDB oracle SQL verbatim).
STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "for", "on", "with"]


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization with empties dropped (split on runs)."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add token_count / char_count / avg_token_len / stopword_ratio."""
    toks = tokens_col(F.col(text_col))
    n = F.size(toks)
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
    return (
        df.withColumn("token_count", n)
        .withColumn("char_count", F.length(F.col(text_col)))
        .withColumn(
            "avg_token_len",
            F.when(
                n > 0,
                F.round(
                    F.aggregate(
                        toks, F.lit(0).cast("double"), lambda acc, t: acc + F.length(t)
                    )
                    / n,
                    4,
                ),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "stopword_ratio",
            F.when(n > 0, F.round(n_stop.cast("double") / n, 4)).otherwise(F.lit(0.0)),
        )
    )


# GPT-2-style pre-tokenizer pattern, simplified to the lookahead-free subset
# both Java regex (Spark) and RE2 (DuckDB) match identically — contractions,
# space-absorbing letter/digit/punct runs, residual whitespace. The real BPE
# merge table is irrelevant for *counting*: token count == pre-token count.
BPE_TOKEN_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def with_bpe_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``bpe_token_count``: BPE-ish subword-boundary token count.

    One JVM-side ``regexp_count`` — no UDF, codegen-friendly, and
    engine-portable (parity with DuckDB's ``regexp_extract_all`` length is
    oracle-checked by the ``doc_bpe_tokens`` driver query).
    """
    return df.withColumn(
        "bpe_token_count",
        F.regexp_count(
            F.coalesce(F.col(text_col), F.lit("")), F.lit(BPE_TOKEN_PATTERN)
        ),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality score in [0,1] from length/stopword/shape signals.

    Heuristics in the Gopher/C4 style: prefer documents with a healthy token
    count, moderate mean token length, and some function-word mass. Pure
    column expressions — no UDF.
    """
    d = with_token_stats(df, text_col)
    len_ok = F.when(
        (F.col("token_count") >= 5) & (F.col("token_count") <= 5000), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    tok_ok = F.when(
        (F.col("avg_token_len") >= 2.0) & (F.col("avg_token_len") <= 12.0), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    stop_ok = F.when(F.col("stopword_ratio") >= 0.02, F.lit(1.0)).otherwise(F.lit(0.0))
    return d.withColumn(
        "quality_score", F.round((len_ok + tok_ok + stop_ok) / 3.0, 4)
    )


# --- language ID (n-gram heuristic; pandas UDF → rows-only driver check) ---

# Minimal character-trigram profiles per language; deterministic and
# self-contained (a real system would load trained profiles).
_LANG_PROFILES = {
    "en": ["the", "and", "ing", "ion", "ent", " th", "he ", "er ", "on ", "re "],
    "de": ["der", "die", "und", "sch", "ein", "ich", "en ", "ch ", "nd ", "ung"],
    "es": ["que", "ión", "los", "ent", "de ", "la ", "el ", "os ", "as ", "ara"],
    "fr": ["les", "ent", "que", "des", "ion", "de ", "le ", "es ", "re ", "ais"],
    "zh": [],  # CJK detection is unicode-range-based below
}


def _lang_id_kernel(text: str) -> str:
    """Scalar reference kernel (tests assert the vectorized twin matches)."""
    if not text:
        return "und"
    n_cjk = sum(1 for c in text if "一" <= c <= "鿿")
    if n_cjk > len(text) * 0.2:
        return "zh"
    low = text.lower()
    best, best_score = "und", 0
    for lang, grams in _LANG_PROFILES.items():
        score = sum(low.count(g) for g in grams)
        if score > best_score:
            best, best_score = lang, score
    return best


_SCORED_LANGS = [lang for lang, grams in _LANG_PROFILES.items() if grams]


def _lang_id_batch(texts: pd.Series) -> pd.Series:
    """Vectorized language ID — per-gram ``Series.str.count`` passes.

    Semantics are identical to :func:`_lang_id_kernel` (non-overlapping gram
    counts, first-language-wins ties, CJK ratio > 0.2 → zh), but each gram is
    one C-level pass over the whole batch instead of a Python loop per row.
    """
    import numpy as np
    import re

    filled = texts.fillna("")
    lengths = filled.str.len().to_numpy()
    n_cjk = filled.str.count(r"[一-鿿]").to_numpy()
    low = filled.str.lower()
    scores = np.zeros((len(filled), len(_SCORED_LANGS)), dtype=np.int64)
    for k, lang in enumerate(_SCORED_LANGS):
        for g in _LANG_PROFILES[lang]:
            scores[:, k] += low.str.count(re.escape(g)).to_numpy()
    # first-wins argmax matches the scalar kernel's strict-> update rule
    best_idx = scores.argmax(axis=1)
    best_score = scores.max(axis=1)
    langs = np.array(_SCORED_LANGS, dtype=object)
    out = np.where(best_score > 0, langs[best_idx], "und")
    out = np.where(n_cjk > lengths * 0.2, "zh", out)
    out = np.where(lengths == 0, "und", out)
    return pd.Series(out, index=texts.index, dtype=object)


@pandas_udf(StringType())
def lang_id_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for texts in batches:
        yield _lang_id_batch(texts)


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("lang_pred", lang_id_udf(F.col(text_col)))


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprints: normalized-text hash + first/last shingle hashes.

    ``fp64`` is the exact-dup key on normalized text (case/whitespace/punct
    folded) — the first 16 hex chars (64 bits) of its md5;
    ``fp_prefix``/``fp_suffix`` catch head/tail containment. All JVM-side
    (md5 + regexp), no Python. md5 (not xxhash64) so the values are
    engine-portable: DuckDB's ``md5()`` over the same UTF-8 bytes reproduces
    them byte-for-byte, which makes this operator oracle-checkable; the
    engine-internal interned ids elsewhere stay on the cheaper xxhash64.
    """
    norm = F.lower(F.regexp_replace(F.col(text_col), r"[^\p{L}\p{N}]+", " "))
    norm = F.trim(norm)
    return (
        df.withColumn("fp64", F.substring(F.md5(norm), 1, 16))
        .withColumn("fp_prefix", F.md5(F.substring(norm, 1, 64)))
        # right(), not reverse()+prefix: DuckDB's reverse is grapheme-
        # cluster-aware while Spark's is code-point-based, so reversed
        # strings diverge on multi-codepoint clusters (e.g. decomposed
        # Hangul jamo) and would break the oracle's bit-parity; right()
        # is code-point-counted in both engines.
        .withColumn("fp_suffix", F.md5(F.right(norm, F.lit(64))))
    )


def with_repetition_stats(
    df: DataFrame, text_col: str = "text", ngram_n: int = 3
) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021 §A1.1).

    Adds two columns used to filter boilerplate/spammy training documents:

    - ``dup_line_frac`` — fraction of non-empty (trimmed) lines that are
      repeats of an earlier line: ``(n_lines - n_distinct_lines) / n_lines``.
    - ``dup_ngram_frac`` — fraction of lowercased token ``ngram_n``-grams
      that are repeats: ``(n_grams - n_distinct_grams) / n_grams``.

    Both are 0.0 for documents too short to have the unit (no non-empty
    lines / fewer than ``ngram_n`` tokens). Pure column expressions — the
    n-grams are built with ``transform(sequence(...), slice)`` entirely
    JVM-side, so the operator stays inside whole-stage codegen and
    per-document cost is linear in document length: it parallelizes
    embarrassingly (no shuffle, no UDF) at any corpus size.
    """
    col = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.filter(
        F.transform(F.split(col, "\n"), lambda l: F.trim(l)), lambda l: l != ""
    )
    n_lines = F.size(lines)
    toks = F.transform(tokens_col(col), lambda t: F.lower(t))
    n_toks = F.size(toks)
    # sequence() with stop < start counts DOWN in Spark, so the >= ngram_n
    # guard is load-bearing, not just a divide-by-zero shield.
    grams = F.transform(
        F.sequence(F.lit(1), n_toks - F.lit(ngram_n - 1)),
        lambda i: F.array_join(F.slice(toks, i, ngram_n), " "),
    )
    n_grams = F.size(grams)
    return (
        df.withColumn(
            "dup_line_frac",
            F.when(
                n_lines > 0,
                F.round(
                    (n_lines - F.size(F.array_distinct(lines))).cast("double")
                    / n_lines,
                    4,
                ),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "dup_ngram_frac",
            F.when(
                n_toks >= ngram_n,
                F.round(
                    (n_grams - F.size(F.array_distinct(grams))).cast("double")
                    / n_grams,
                    4,
                ),
            ).otherwise(F.lit(0.0)),
        )
    )


def with_boilerplate_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style shape signals: symbol ratio and list/ellipsis line shares.

    - ``symbol_word_ratio`` — (# of ``#`` and ``...`` occurrences) / words;
      Gopher drops documents above 0.1.
    - ``bullet_line_frac`` — fraction of non-empty lines starting with a
      bullet marker (``-``, ``*``, ``•``); Gopher drops above 0.9.
    - ``ellipsis_line_frac`` — fraction of non-empty lines ending in
      ``...`` or ``…``; Gopher drops above 0.3.

    Pure column expressions over one line split — no UDF, no shuffle.
    """
    col = F.coalesce(F.col(text_col), F.lit(""))
    n_words = F.size(tokens_col(col))
    n_sym = F.regexp_count(col, F.lit(r"#|\.\.\.")).cast("double")
    lines = F.filter(
        F.transform(F.split(col, "\n"), lambda l: F.trim(l)), lambda l: l != ""
    )
    n_lines = F.size(lines)
    n_bullet = F.size(F.filter(lines, lambda l: l.rlike(r"^[-*•]")))
    n_ellipsis = F.size(F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)$")))
    frac = lambda n: F.when(  # noqa: E731
        n_lines > 0, F.round(n.cast("double") / n_lines, 4)
    ).otherwise(F.lit(0.0))
    return (
        df.withColumn(
            "symbol_word_ratio",
            F.when(n_words > 0, F.round(n_sym / n_words, 4)).otherwise(F.lit(0.0)),
        )
        .withColumn("bullet_line_frac", frac(n_bullet))
        .withColumn("ellipsis_line_frac", frac(n_ellipsis))
    )


def gopher_filter(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass corpus filter at the published Gopher operating points.

    Composes :func:`with_token_stats`, :func:`with_repetition_stats`, and
    :func:`with_boilerplate_stats` and emits ``keep`` (boolean) plus
    ``drop_reasons`` (array of rule names, empty when kept), so a 100 TB
    pipeline can both filter and audit its rejection mix in the same scan.
    Thresholds (Rae et al. 2021 §A1.1): token count in [50, 100k], mean
    token length in [3, 10], symbol/word ratio ≤ 0.1, bullet lines ≤ 90%,
    ellipsis lines ≤ 30%, stopword ratio ≥ 0.02 (their two-stopwords proxy),
    dup-line fraction ≤ 0.30, dup-3gram fraction ≤ 0.18. Everything stays a
    single projection over one scan — no shuffle, no UDF — so the filter is
    free to fuse with whatever the pipeline reads next.
    """
    d = with_boilerplate_stats(
        with_repetition_stats(with_token_stats(df, text_col), text_col),
        text_col,
    )
    rules = [
        ("n_tokens", (F.col("token_count") >= 50) & (F.col("token_count") <= 100000)),
        ("tok_len", (F.col("avg_token_len") >= 3.0) & (F.col("avg_token_len") <= 10.0)),
        ("symbol_ratio", F.col("symbol_word_ratio") <= 0.1),
        ("bullet_lines", F.col("bullet_line_frac") <= 0.9),
        ("ellipsis_lines", F.col("ellipsis_line_frac") <= 0.3),
        ("stopwords", F.col("stopword_ratio") >= 0.02),
        ("dup_lines", F.col("dup_line_frac") <= 0.30),
        ("dup_ngrams", F.col("dup_ngram_frac") <= 0.18),
    ]
    reasons = F.filter(
        F.array(
            *[F.when(~ok, F.lit(name)).otherwise(F.lit(None)) for name, ok in rules]
        ),
        lambda r: r.isNotNull(),
    )
    return d.withColumn("drop_reasons", reasons).withColumn(
        "keep", F.size(F.col("drop_reasons")) == 0
    )


# PII patterns — deliberately restricted to the regex subset Java regex
# (Spark) and RE2 (DuckDB) interpret identically: no lookaround, no
# backreferences, only non-capturing groups and \b anchors. Order of
# application matters: emails first (their local parts can contain digits),
# then IPv4 (dotted quads would otherwise match the phone pattern), then
# phones.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PII_PHONE_RE = (
    r"\+?\(?\d{1,4}\)?[-. ]?(?:\(?\d{2,4}\)?[-. ]?)?\d{3,4}[-. ]?\d{3,4}\b"
)


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub emails / IPv4s / phone-shaped numbers from a text column.

    Adds ``text_redacted`` (matches replaced by ``<EMAIL>`` / ``<IP>`` /
    ``<PHONE>``) and per-kind match counts ``n_pii_emails`` / ``n_pii_ips``
    / ``n_pii_phones`` (counted on the ORIGINAL text, so the counts are
    independent of replacement order). The C4/Dolma-style pre-training
    scrub: pure ``regexp_replace``/``regexp_count`` column expressions —
    JVM-side, codegen-friendly, no shuffle, linear per document — and the
    patterns are engine-portable so DuckDB replays them bit-identically.
    """
    col = F.coalesce(F.col(text_col), F.lit(""))
    red = F.regexp_replace(col, PII_EMAIL_RE, "<EMAIL>")
    red = F.regexp_replace(red, PII_IPV4_RE, "<IP>")
    red = F.regexp_replace(red, PII_PHONE_RE, "<PHONE>")
    return (
        df.withColumn("n_pii_emails", F.regexp_count(col, F.lit(PII_EMAIL_RE)))
        .withColumn("n_pii_ips", F.regexp_count(col, F.lit(PII_IPV4_RE)))
        .withColumn("n_pii_phones", F.regexp_count(col, F.lit(PII_PHONE_RE)))
        .withColumn("text_redacted", red)
    )


def tfidf_top_terms(
    df: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Top-k TF-IDF terms per document: (doc_id, term, tfidf, rank).

    tfidf = tf × (ln((N+1)/(df+1)) + 1) — smoothed idf, natural log, the
    sklearn-style variant. All JVM-side: one explode, two aggregations, a
    term-keyed join for idf, a single-row broadcast for N, and a per-doc
    window for the top-k (partition = doc_id, so the window never sees more
    rows than one document's vocabulary — no global sort). Ranking uses the
    UNROUNDED score with the term string as the deterministic tie-break
    (equal tf+df ⇒ byte-equal doubles in any IEEE engine, so ties resolve
    identically everywhere); the emitted score is rounded for value-hash
    comparison. At corpus scale the df table is vocabulary-sized — the one
    shuffle that matters is the term-keyed idf join, which AQE handles (the
    head of the Zipf curve is exactly the skew-join case).
    """
    from pyspark.sql.window import Window

    terms = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col(F.col(text_col))).alias("tok"),
    ).select("doc_id", F.lower("tok").alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "_s",
            F.col("tf")
            * (F.log((F.col("n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))) + F.lit(1.0)),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("_s"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "term", F.round("_s", 6).alias("tfidf"), "rank")
    )
