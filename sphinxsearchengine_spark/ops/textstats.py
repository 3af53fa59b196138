"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting.

All JVM-side column expressions where possible (token counts, quality
ratios); language-ID and fingerprints use deterministic hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TOKEN_SPLIT = "[^a-z0-9]+"

STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for",
    "on", "with", "as", "by", "at", "this", "that", "be", "are",
]

# tiny per-language marker lexicons for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "is", "with"],
    "de": ["der", "die", "und", "ist", "mit"],
    "es": ["el", "la", "los", "es", "con"],
    "fr": ["le", "la", "les", "est", "avec"],
}


def _tokens(col):
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT), lambda x: F.length(x) > 0)


def token_count(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_tokens) — whitespace/punct regex tokenization."""
    return df.select(
        F.col(id_col).alias("id"), F.size(_tokens(F.col(text_col))).alias("n_tokens")
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_tokens, mean_token_len, stopword_ratio, quality) — the
    classic cheap quality gates (length / stopword-density heuristics)."""
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    total_len = F.aggregate(
        F.transform(toks, lambda x: F.length(x)), F.lit(0), lambda a, v: a + v
    )
    stop = F.size(F.filter(toks, lambda x: x.isin(STOPWORDS)))
    mean_len = F.when(n > 0, total_len.cast("double") / n).otherwise(F.lit(0.0))
    stop_ratio = F.when(n > 0, stop.cast("double") / n).otherwise(F.lit(0.0))
    quality = (
        F.when((n >= 10) & (mean_len >= 2.5) & (stop_ratio <= 0.6), F.lit(1.0))
        .otherwise(F.lit(0.0))
    )
    return df.select(
        F.col(id_col).alias("id"),
        n.alias("n_tokens"),
        F.round(mean_len, 4).alias("mean_token_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        quality.alias("quality"),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pred_lang, hits) — marker-word voting heuristic.  Real
    deployments swap in fastText/cld3 behind the same signature."""
    toks = _tokens(F.col(text_col))
    scores = [
        F.struct(
            F.size(F.filter(toks, lambda x: x.isin(m))).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, m in sorted(LANG_MARKERS.items())
    ]
    best = F.array_max(F.array(*scores))
    return df.select(
        F.col(id_col).alias("id"),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("pred_lang"),
        best["hits"].alias("hits"),
    )


def fingerprint(
    df: DataFrame, id_col: str, text_col: str, k: int = 5,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, fp) — winnowing-style document fingerprint: min hash over
    k-token shingles (robust to local edits; deterministic).

    ``hash_fn='xxhash64'`` (default, fastest JVM hash, fp is long) or
    ``'md5'`` (fp is the hex digest string) — md5 exists in DuckDB too,
    which makes the op value-checkable against an ANSI-SQL oracle."""
    toks = _tokens(F.col(text_col))
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    if hash_fn == "md5":
        fp = F.array_min(F.transform(sh, lambda s: F.md5(s)))
    else:
        fp = F.array_min(F.transform(sh, lambda s: F.xxhash64(s)))
    return df.select(F.col(id_col).alias("id"), fp.alias("fp"))
