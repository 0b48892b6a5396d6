"""Text-analysis operators for large-scale training-data pipelines.

All JVM-side column expressions (regexp_*, aggregate, transform) — no
Python on the hot path. Operates on the ``documents(doc_id, text, lang,
source, n_chars)`` table shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: letter runs, digit runs, or single non-space symbols.
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny per-language stopword sets for the n-gram/stopword language-ID
# heuristic (public common-word lists).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "ich", "zu"],
    "fr": ["le", "la", "les", "et", "des", "est", "dans", "que", "une", "pour"],
    "es": ["el", "la", "los", "que", "de", "es", "en", "una", "por", "para"],
}


def tokens(col) -> Column:
    """Array of BPE-ish tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(TOKEN_RE), 0)


def token_count(col) -> Column:
    return F.size(tokens(col))


def whitespace_token_count(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != F.lit("")))


def words_lower(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(r"[a-z]+"), 0)


def stopword_ratio(col, lang: str = "en") -> Column:
    ws = words_lower(col)
    hits = F.size(F.array_intersect(F.array_distinct(ws), F.array(*[F.lit(w) for w in STOPWORDS[lang]])))
    # ratio of distinct stopwords present (0..1) — cheap quality proxy
    return hits / F.lit(float(len(STOPWORDS[lang])))


def punct_ratio(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(F.regexp_replace(c, r"[^\.,;:!\?]", ""))
    return n_punct / F.greatest(F.length(c), F.lit(1)).cast("double")


def mean_word_len(col) -> Column:
    ws = words_lower(col)
    total = F.aggregate(ws, F.lit(0), lambda acc, w: acc + F.length(w))
    return total / F.greatest(F.size(ws), F.lit(1)).cast("double")


def quality_score(col) -> Column:
    """Composite quality score in [0, 1]: length, punctuation presence,
    stopword coverage, word-length sanity. Deterministic and documented —
    the exact formula is the spec (tests + oracle share it)."""
    c = F.col(col) if isinstance(col, str) else col
    len_ok = F.least(F.length(c) / F.lit(500.0), F.lit(1.0))
    sw = stopword_ratio(col, "en")
    p = punct_ratio(col)
    punct_ok = F.when((p > 0.001) & (p < 0.2), F.lit(1.0)).otherwise(F.lit(0.0))
    mwl = mean_word_len(col)
    wl_ok = F.when((mwl >= 3.0) & (mwl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.0))
    return (len_ok + sw + punct_ok + wl_ok) / F.lit(4.0)


def detect_language(col) -> Column:
    """Argmax language by distinct-stopword hits; ties -> lexicographically
    first lang; 'und' (undetermined) when nothing matches."""
    ws = F.array_distinct(words_lower(col))
    hits = {
        lang: F.size(F.array_intersect(ws, F.array(*[F.lit(w) for w in sw])))
        for lang, sw in sorted(STOPWORDS.items())
    }
    best = F.greatest(*hits.values())
    out = F.when(best <= 0, F.lit("und"))
    for lang in sorted(hits):  # alphabetical: first match wins ties
        out = out.when(hits[lang] == best, F.lit(lang))
    return out


def fingerprint_winnow(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    k: int = 8, window: int = 4, hash_mode: str = "xxhash64",
) -> DataFrame:
    """Winnowing document fingerprint (Schleimer et al., SIGMOD 2003):
    rolling k-gram hashes, minimum per sliding window of ``window``
    hashes, distinct. Output: DataFrame[id_col, fp_hash] (several
    rows per doc). All array expressions — no shuffle until the final
    explode, no Python.

    ``hash_mode``: "xxhash64" (long, fastest — the production path) or
    "md5hex" (first 15 hex chars of md5 as a string; lexicographic order
    on fixed-width lowercase hex == unsigned numeric order, and md5 is
    reproducible in DuckDB — the oracle-checkable path)."""
    c = F.col(text_col)
    n = F.length(c) - F.lit(k - 1)
    # sequence(a, b) counts DOWN when a > b — guard the empty cases
    if hash_mode == "xxhash64":
        empty = F.array().cast("array<bigint>")
        gram_hash = lambda i: F.xxhash64(c.substr(i, F.lit(k)))
    elif hash_mode == "md5hex":
        empty = F.array().cast("array<string>")
        gram_hash = lambda i: F.substring(F.md5(c.substr(i, F.lit(k))), 1, 15)
    else:
        raise ValueError(f"unknown hash_mode: {hash_mode}")
    grams = F.when(
        n >= 1,
        F.transform(F.sequence(F.lit(1), n), gram_hash),
    ).otherwise(empty)
    # materialize grams as a column BEFORE the windowed-min pass: an
    # expression referenced inside a lambda is re-evaluated per element
    # (O(L^2) hashing); a column reference is evaluated once per row.
    # Right-size first: this is a pure projection, so it runs at the
    # input's split count — one task for a single-file local scan
    # (measured 2.8s -> 0.8s at sf0.1/local[32]); no-op on a wide scan.
    from ..session import right_size

    staged = right_size(df).select(id_col, grams.alias("_grams"))
    g = F.col("_grams")
    nw = F.size(g) - F.lit(window - 1)
    mins = F.when(
        nw >= 1,
        F.transform(
            F.sequence(F.lit(1), nw),
            lambda j: F.array_min(F.slice(g, j, window)),
        ),
    ).otherwise(empty)
    return staged.select(id_col, F.explode(F.array_distinct(mins)).alias("fp_hash"))


def doc_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per doc: token counts, ratios, quality, language."""
    return df.select(
        id_col,
        token_count(text_col).alias("n_tokens"),
        whitespace_token_count(text_col).alias("n_ws_tokens"),
        F.length(text_col).alias("n_chars"),
        punct_ratio(text_col).alias("punct_ratio"),
        stopword_ratio(text_col).alias("stopword_ratio"),
        mean_word_len(text_col).alias("mean_word_len"),
        quality_score(text_col).alias("quality"),
        detect_language(text_col).alias("lang_detected"),
    )
