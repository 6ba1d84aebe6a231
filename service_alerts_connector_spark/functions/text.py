"""Text-analysis column expressions for training-data pipelines.

Language-ID heuristics, quality scoring, token counting, shingling, and
document fingerprinting — all as Catalyst expressions (no Python UDFs), so
they run JVM-side at scan speed over 100 TB of documents.  These extend the
reference's string-function surface (SURVEY §2.7) with the operators a
large-scale corpus pipeline needs (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A tiny, deterministic stopword list for the language heuristic.
EN_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")

HEX_DIGITS = "0123456789abcdef"


def tokens(col: Column) -> Column:
    """Lower-cased whitespace tokens; empty/null text → empty array."""
    trimmed = F.trim(F.lower(col))
    return F.when(
        trimmed.isNull() | (trimmed == ""), F.array().cast("array<string>")
    ).otherwise(F.split(trimmed, r"\s+"))


def token_count(col: Column) -> Column:
    """Whitespace token count (0 for empty/null)."""
    return F.size(tokens(col))


def char_count(col: Column) -> Column:
    return F.coalesce(F.length(col), F.lit(0))


def punct_count(col: Column) -> Column:
    """Characters that are neither alphanumeric nor whitespace."""
    return F.length(col) - F.length(
        F.regexp_replace(col, r"[^A-Za-z0-9\s]", "")
    )


def stopword_count(col: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    pattern = r"\b(" + "|".join(stopwords) + r")\b"
    return F.regexp_count(F.lower(col), F.lit(pattern))


def lang_guess(col: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """N-gram/stopword language heuristic: ≥2 English stopword hits → 'en',
    ≥1 → 'maybe_en', else 'other'.  (A real deployment would plug a model in
    via mapInPandas; the heuristic keeps the operator JVM-side.)"""
    hits = stopword_count(col, stopwords)
    return (
        F.when(hits >= 2, F.lit("en"))
        .when(hits >= 1, F.lit("maybe_en"))
        .otherwise(F.lit("other"))
    )


def quality_score(col: Column) -> Column:
    """Deterministic quality score in [0, ~1]: rewards word density,
    penalizes punctuation load.  Pure integer-derived double arithmetic —
    bit-identical across engines."""
    n_chars = char_count(col).cast("double")
    n_tokens = token_count(col).cast("double")
    n_punct = punct_count(col).cast("double")
    return (n_tokens * 5.0) / (n_chars + 1.0) - (n_punct / (n_chars + 1.0))


def word_shingles_of(toks: Column, k: int = 3) -> Column:
    """Array of word k-gram shingles (space-joined) from a *materialized*
    token-array column; texts shorter than k words yield one whole-text
    shingle.

    Perf note: ``toks`` must be a plain column reference, not an inline
    ``tokens(text)`` expression — expressions captured inside a higher-order
    ``transform`` lambda are re-evaluated per element (and HOF lambdas run
    interpreted, outside codegen), turning shingling O(tokens²)-with-resplit.
    Materialize tokens in a preceding projection; Spark's CollapseProject
    keeps non-cheap duplicated aliases in their own project, so the split
    runs once per row."""
    return F.when(
        F.size(toks) < k, F.array(F.array_join(toks, " "))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - k),
            lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
        )
    )


def word_shingles(col: Column, k: int = 3) -> Column:
    """Convenience form over raw text — fine for small inputs/tests; hot
    paths should materialize ``tokens()`` first and use ``word_shingles_of``
    (see perf note there)."""
    return word_shingles_of(tokens(col), k)


def doc_fingerprint_of(toks: Column, k: int = 3) -> Column:
    """Document fingerprint = lexicographic-min md5 over word k-shingles —
    a 1-permutation MinHash; two documents sharing it are Jaccard-likely
    duplicates.  Takes a materialized token array (see word_shingles_of)."""
    return F.array_min(F.transform(word_shingles_of(toks, k), F.md5))


def doc_fingerprint(col: Column, k: int = 3) -> Column:
    return doc_fingerprint_of(tokens(col), k)


def token_hash32(col: Column) -> Column:
    """Deterministic 32-bit token hash shared with SQL oracles: the first 8
    hex chars of md5, parsed as an integer.  (Spark's ``hash()`` / DuckDB's
    ``hash()`` differ; md5 is the portable common denominator.)"""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


# ---------------------------------------------------------------------------
# PII redaction + repetition metrics (corpus-cleaning expressions)
# ---------------------------------------------------------------------------

# RE2-safe patterns (no lookaround/backrefs) so Spark's Java regex and
# DuckDB's RE2 agree match-for-match; order matters — URLs first (they may
# contain '@' and digits), then emails, then phone-ish runs.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"https?://[^\s]+", "<URL>"),
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?[0-9][0-9()\- ]{6,}[0-9]", "<PHONE>"),
)


def redact_pii(col: Column) -> Column:
    """Replace URLs, email addresses, and phone-number-like digit runs with
    typed placeholder tokens — left-to-right non-overlapping replacement in
    pattern order, identical under Java regex and RE2."""
    out = col
    for pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_count(col: Column) -> Column:
    """How many PII spans ``redact_pii`` would replace (counted against the
    progressively-redacted text, mirroring the replacement order)."""
    out, n = col, F.lit(0)
    for pattern, token in PII_PATTERNS:
        n = n + F.regexp_count(out, F.lit(pattern))
        out = F.regexp_replace(out, pattern, token)
    return n


def distinct_token_count(toks: Column) -> Column:
    """Distinct-token count over a materialized token array."""
    return F.size(F.array_distinct(toks))


def dup_token_ratio(toks: Column) -> Column:
    """Within-document repetition: fraction of tokens that are repeats of
    an earlier token (0.0 for empty docs).  High values flag boilerplate /
    degenerate generations.  Integer-derived double division — identical
    across engines."""
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        (n - nd).cast("double") / n.cast("double")
    )


# A GPT-2-style pre-tokenizer approximation, RE2-safe (no lookahead — the
# real GPT-2 pattern's ` ?\p{L}+` contraction lookaheads don't survive both
# engines): a token is a letter run, a digit run, or a single
# non-alphanumeric-non-space character.  Counts land within a few percent
# of a real BPE tokenizer's on English prose, which is what a token-budget
# estimator needs — the exact vocab merge step requires the tokenizer model
# itself and stays out of the engine.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_ish_token_count(col: Column) -> Column:
    """Approximate BPE token count: one count per letter-run / digit-run /
    punctuation character (null text → 0)."""
    return F.coalesce(
        F.regexp_count(col, F.lit(BPE_ISH_PATTERN)), F.lit(0)
    )


def tokens_per_word_micro(col: Column) -> Column:
    """BPE-ish tokens per whitespace word, ×1e6 floored to a bigint — the
    "fertility" signal quality filters threshold on.  Exact integer
    arithmetic (``(a − a mod b) / b`` on bigints ≤ 2^53 divides exactly),
    so no engine's float division enters.  0 for empty docs."""
    a = bpe_ish_token_count(col).cast("bigint") * 1_000_000
    b = token_count(col).cast("bigint")
    exact = (a - (a % b)) / b
    return F.when(b <= 0, F.lit(0)).otherwise(exact).cast("bigint")
