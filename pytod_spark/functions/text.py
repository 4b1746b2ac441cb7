"""Text-analysis column builders (all JVM-side Catalyst expressions).

Training-data pipeline features over a document/text column: token
counts, shingles, quality signals, language-ID scores, fingerprints.
Everything here is a pure Column expression (split/transform/
aggregate/regexp) so it stays inside whole-stage codegen — no Python
in the hot path; the DuckDB oracle SQL mirrors each formula exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny, fixed stopword lists for the language-ID heuristic (shared
# verbatim with the oracle SQL; accuracy is a measured output, not a
# promise)
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "on", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "auf", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "de", "un", "une", "dans", "pour"],
    "es": ["el", "la", "los", "y", "es", "de", "un", "una", "en", "para"],
}

PUNCT_CLASS = r"[.,;:!?'\"()\[\]{}\-]"
# BPE-ish token pattern: letter runs | digit runs | single punctuation
BPE_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def tokens(col: Column) -> Column:
    return F.split(F.lower(col), r"\s+")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_token_count(col: Column) -> Column:
    """Whitespace-free tokenizer proxy: counts BPE-ish units."""
    return F.regexp_count(F.lower(col), F.lit(BPE_PATTERN))


def avg_token_len(col: Column) -> Column:
    t = tokens(col)
    total = F.aggregate(F.transform(t, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x)
    return total.cast("double") / F.size(t)


def punct_ratio(col: Column) -> Column:
    return (
        F.length(col) - F.length(F.regexp_replace(col, PUNCT_CLASS, ""))
    ).cast("double") / F.length(col)


def stopword_hits(col: Column, lang: str) -> Column:
    words = STOPWORDS[lang]
    t = tokens(col)
    return F.aggregate(
        F.transform(t, lambda x: F.when(x.isin(*words), 1).otherwise(0)),
        F.lit(0),
        lambda a, x: a + x,
    )


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    return stopword_hits(col, lang).cast("double") / token_count(col)


def word_grams(col: Column, n: int) -> Column:
    """Raw (non-distinct, order-preserving) word n-gram array.

    Built by zip_with-ing the token array against its own left-shifted
    slices (gram_i = t[i] + ' ' + t[i+1] + ... ), NOT by indexing with
    transform(sequence(...), i -> element_at(t, i+j)): Catalyst inlines
    the tokenizing split() into every element_at of every lambda
    element, which re-splits the whole document O(n_tokens * n) times
    per row (measured ~9s for 5k docs); the zip_with form evaluates
    split() a constant ~2n times per row (~40x faster)."""
    t = tokens(col)
    g = t
    for j in range(1, n):
        # zip_with pads the shorter side with NULL and concat_ws skips
        # nulls, so the last j entries are truncated grams — dropped by
        # the final slice
        g = F.zip_with(
            g,
            F.slice(t, j + 1, F.greatest(F.size(t) - j, F.lit(0))),
            lambda x, y: F.concat_ws(" ", x, y),
        )
    g = F.slice(g, 1, F.greatest(F.size(t) - (n - 1), F.lit(0)))
    return F.when(F.size(t) >= n, g).otherwise(F.array().cast("array<string>"))


def shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (space-joined), the MinHash/LSH
    input unit. Documents with < n tokens yield an empty array."""
    return F.array_distinct(word_grams(col, n))


def dup_token_fraction(col: Column) -> Column:
    """Gopher-style repetition signal: fraction of tokens that are
    repeats of an earlier token, 1 - |distinct|/|tokens|. Pure
    map-side array arithmetic — no shuffle, scales linearly."""
    t = tokens(col)
    return F.lit(1.0) - F.size(F.array_distinct(t)).cast("double") / F.size(t)


def dup_gram_fraction(col: Column, n: int = 2) -> Column:
    """Fraction of word n-grams that are repeats (Gopher's duplicate
    n-gram fraction). 0.0 for documents with < n tokens."""
    g = word_grams(col, n)
    return F.when(
        F.size(g) > 0,
        F.lit(1.0) - F.size(F.array_distinct(g)).cast("double") / F.size(g),
    ).otherwise(F.lit(0.0))


def top_token_fraction(col: Column) -> Column:
    """Fraction of tokens taken by the single most frequent token
    (Gopher's top-1-gram fraction). Computed WITHOUT a shuffle: the
    mode count of a sorted array equals its longest equal-run, found
    by one aggregate() pass with a (prev, run, best) accumulator —
    the whole signal stays map-side in whole-stage codegen, vs the
    explode -> groupBy(doc, tok) -> groupBy(doc) two-shuffle plan."""
    t = tokens(col)
    st = F.array_sort(t)
    run = lambda a, x: F.when(x == a.prev, a.run + 1).otherwise(F.lit(1))  # noqa: E731
    best = F.aggregate(
        st,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda a, x: F.struct(
            x.alias("prev"),
            run(a, x).alias("run"),
            F.greatest(a.best, run(a, x)).alias("best"),
        ),
        lambda a: a.best,
    )
    return best.cast("double") / F.size(t)


def md5_hash60(col: Column) -> Column:
    """Portable 60-bit integer hash: first 15 hex digits of md5.

    Chosen because both Spark (conv(substr(md5, 1, 15), 16, 10)) and
    DuckDB (('0x' || substr(md5, 1, 15))::BIGINT) compute the exact
    same value — the cross-engine-stable base hash for MinHash /
    SimHash / fingerprints.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def char_ngram_fingerprint(col: Column, n: int = 5) -> Column:
    """Winnowing-lite document fingerprint: min over the 60-bit hashes
    of all character n-grams (rolling-hash fingerprint family)."""
    idx = F.sequence(F.lit(1), F.length(col) - n + 1)
    hashes = F.transform(idx, lambda i: md5_hash60(F.substr(col, i, F.lit(n))))
    return F.when(F.length(col) >= n, F.array_min(hashes)).otherwise(md5_hash60(col))


def quality_score(col: Column) -> Column:
    """Composite quality heuristic in [0, 1]: rewards moderate length,
    low punctuation density, and presence of stopwords (fixed weights,
    mirrored in the oracle SQL)."""
    n_tok = token_count(col)
    length_term = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(col) * 5, F.lit(1.0))
    stop_term = F.least(stopword_ratio(col, "en") * 4, F.lit(1.0))
    return F.round(0.4 * length_term + 0.3 * punct_term + 0.3 * stop_term, 6)


# PII redaction patterns — simple character-class regexes chosen to
# parse identically under Java regex (Spark) and RE2 (DuckDB): no
# lookaround, no backreferences. Order matters: emails are redacted
# before IPs/hex runs so their digit substrings can't be re-matched.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("hex_secret", r"\b[0-9a-fA-F]{32,}\b", "<HEX>"),
)


def pii_count(col: Column, pattern: str) -> Column:
    """Number of non-overlapping matches of one PII pattern."""
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


def redact_pii(col: Column) -> Column:
    """Replace every PII_PATTERNS match with its placeholder token —
    the classic pre-training scrub stage. A chained regexp_replace:
    one projection, stays in whole-stage codegen, and the DuckDB
    oracle mirrors it with regexp_replace(..., 'g'). Idempotent (the
    placeholder tokens match none of the patterns)."""
    out = col
    for _, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out
