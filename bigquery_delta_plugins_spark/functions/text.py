"""Text-analysis column builders for training-data pipelines.

These are the web-text quality/statistics primitives a 100 TB corpus
pipeline runs over every document: tokenization, token statistics,
quality scoring, stopword-profile language ID, and position-weighted
document fingerprinting.  No reference counterpart (the reference's only
string processing is identifier normalization, BigQueryUtils.java:194-269);
these are mandated by the training-data-pipeline scope of the build.

Everything is a pure Catalyst ``Column`` expression — JVM-side,
whole-stage-codegen'd, no Python in the hot path — so a scan over a
trillion documents never leaves Tungsten.  Each builder has an exact
ANSI-SQL twin in ``plans/pipeline_queries.py`` used as the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword profiles for the language-ID heuristic (alphabetical lang order;
# ties resolve to the alphabetically-first language).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "es": ("el", "los", "las", "una", "y", "que", "en", "se"),
    "fr": ("le", "la", "les", "et", "des", "un", "une", "que"),
    "zh": ("的", "是", "了", "在", "我", "有"),
}
LANGS = tuple(sorted(STOPWORDS))
ALL_STOPWORDS = tuple(sorted({w for ws in STOPWORDS.values() for w in ws}))

FINGERPRINT_MOD = 1_000_003  # keeps SUM(h*pos) far from 2^63 at any doc length


def tokens(text: Column) -> Column:
    r"""Whitespace tokenization: ``split(trim(text), '\s+')``."""
    return F.split(F.trim(text), r"\s+")


# PII patterns restricted to constructs Java regex and RE2 (DuckDB)
# evaluate identically (no lookaround, no backrefs).  Applied in dict
# order — order matters for overlap, so the oracle applies the same one.
PII_PATTERNS: dict[str, str] = {
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "IPV4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "PHONE": r"\+?\d[\d -]{7,}\d",
}


def pii_count(text: Column, kind: str) -> Column:
    """Occurrences of one PII pattern (pre-redaction)."""
    return F.size(
        F.regexp_extract_all(text, F.lit(PII_PATTERNS[kind]), F.lit(0))
    ).cast("long")


def redact_pii(text: Column) -> Column:
    """Replace every PII match with a ``<KIND>`` placeholder, patterns
    applied in PII_PATTERNS order.  Pure Catalyst regexp_replace chain —
    whole-stage codegen, no Python."""
    out = text
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{kind}>")
    return out


def ngram_array(t: Column, n: int) -> Column:
    """Word n-grams over a token array, space-joined; empty array when
    the doc is shorter than ``n`` (so an explode drops it, matching the
    oracle's UNNEST of an empty list).  Pure Catalyst — the sequence/
    transform/element_at chain stays in whole-stage codegen."""
    gram = lambda i: F.concat_ws(
        " ", *[F.element_at(t, i + j) for j in range(n)]
    )
    return F.when(
        F.size(t) >= n,
        F.transform(F.sequence(F.lit(1), F.size(t) - (n - 1)), gram),
    ).otherwise(F.array().cast("array<string>"))


def hash32(col: Column) -> Column:
    """Deterministic 32-bit hash shared with the DuckDB oracle:
    first 8 hex digits of md5, as a bigint."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


# GPT-2-style pre-tokenizer, restricted to constructs Java regex and RE2
# (DuckDB) evaluate identically: contractions, optional-space letter /
# digit / punctuation runs, whitespace runs.  (The upstream pattern's
# trailing negative lookahead is dropped — RE2 has no lookaround; on
# whitespace-normalized web text the token COUNT is unchanged.)
BPE_PRETOKEN_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"
)


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: number of pre-tokenizer matches — the
    standard proxy for LLM token budgets when the real BPE vocab isn't
    in the engine."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PRETOKEN_PATTERN), F.lit(0))).cast(
        "long"
    )


def distinct_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text))).cast("long")


def stopword_count(text: Column, words: tuple[str, ...] = ALL_STOPWORDS) -> Column:
    return F.size(F.filter(tokens(text), lambda x: x.isin(*words))).cast("long")


def char_count(text: Column) -> Column:
    return F.length(text).cast("long")


def token_len_sum(text: Column) -> Column:
    return F.aggregate(
        tokens(text), F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length saturation + type-token
    ratio + non-stopword mass, in a fixed double-arithmetic order so the
    SQL oracle reproduces it bit-for-bit."""
    n = token_count(text)
    ttr = distinct_token_count(text) / n
    stop = stopword_count(text) / n
    sat = F.least(F.lit(1.0), n / F.lit(100.0))
    return F.lit(0.3) * sat + F.lit(0.4) * ttr + F.lit(0.3) * (F.lit(1.0) - stop)


def lang_hits(text: Column, lang: str) -> Column:
    return F.size(F.filter(tokens(text), lambda x: x.isin(*STOPWORDS[lang]))).cast(
        "long"
    )


def predicted_lang(text: Column) -> Column:
    """Argmax stopword-profile language, alphabetical tie-break, 'und'
    when no profile matches at all."""
    hits = {lang: lang_hits(text, lang) for lang in LANGS}
    g = F.greatest(*hits.values())
    out = F.lit("und")
    expr = F.when(g == 0, F.lit("und"))
    for lang in LANGS:  # alphabetical: first equal to the max wins
        expr = expr.when(hits[lang] == g, F.lit(lang))
    return expr.otherwise(out)


def fingerprint(text: Column) -> Column:
    """Position-weighted rolling document fingerprint:
    ``SUM((hash32(token) % M) * (1-based position))`` — integer-exact,
    order-sensitive, identical in any SQL dialect with md5."""
    toks = tokens(text)
    idx = F.sequence(F.lit(1), F.size(toks))
    weighted = F.zip_with(
        toks, idx, lambda t, i: (hash32(t) % FINGERPRINT_MOD) * i.cast("long")
    )
    return F.aggregate(weighted, F.lit(0).cast("long"), lambda acc, x: acc + x)
