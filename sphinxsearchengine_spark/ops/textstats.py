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


def _quality_parts(text_col: str):
    """(n_tokens, mean_len, stop_ratio) column expressions shared by
    quality_score and quality_flag."""
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    total_len = F.aggregate(
        F.transform(toks, lambda x: F.length(x)), F.lit(0), lambda a, v: a + v
    )
    stop = F.size(F.filter(toks, lambda x: x.isin(STOPWORDS)))
    mean_len = F.when(n > 0, total_len.cast("double") / n).otherwise(F.lit(0.0))
    stop_ratio = F.when(n > 0, stop.cast("double") / n).otherwise(F.lit(0.0))
    return n, mean_len, stop_ratio


# BPE-ish pre-tokenization pieces, restricted to the Java∩RE2 regex
# dialect (no lookahead/unicode-category classes of the real GPT-2
# pattern): letter runs, digit runs, punctuation runs.  Counts track
# subword-tokenizer budgets far better than whitespace words on code
# and punctuation-heavy text.
BPE_PIECE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def token_count_bpe(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_pieces) — BPE-ish piece count via one JVM regexp_count
    (narrow plan, zero shuffle)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.regexp_count(F.col(text_col), F.lit(BPE_PIECE_PATTERN)).alias(
            "n_pieces"
        ),
    )


def quality_flag(text_col: str):
    """The quality gate as a bare boolean Column — lets pipelines filter
    rows in place (zero shuffle, no join back on id)."""
    n, mean_len, stop_ratio = _quality_parts(text_col)
    return (n >= 10) & (mean_len >= 2.5) & (stop_ratio <= 0.6)


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_tokens, mean_token_len, stopword_ratio, quality) — the
    classic cheap quality gates (length / stopword-density heuristics)."""
    n, mean_len, stop_ratio = _quality_parts(text_col)
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


def _run_stats(arr, with_chars: bool = False):
    """Fold over a SORTED string array counting equal-run statistics —
    the in-row (zero-shuffle, whole-stage-codegen) alternative to
    explode + groupBy for per-document repetition measures.

    Returns struct(cnt, mx, dup[, chars, dup_chars]):
      cnt       — element count (so callers need no separate size()
                  evaluation of the — possibly expensive — array expr),
      mx        — count of the most frequent element,
      dup       — number of INSTANCES whose value occurs more than once
                  (when a run reaches length 2 both members join; each
                  further member adds one — no flush pass needed),
      chars     — total characters (only when ``with_chars``),
      dup_chars — total characters of duplicated instances (only when
                  ``with_chars``).

    IMPORTANT for callers: extract MULTIPLE fields only from a
    materialized attribute (e.g. behind the `_once` explode barrier),
    never directly — each direct getField would re-run the whole fold.
    """
    fields = [
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("cnt"),
        F.lit(0).alias("mx"),
        F.lit(0).alias("dup"),
    ]
    if with_chars:
        fields.append(F.lit(0).alias("chars"))
        fields.append(F.lit(0).alias("dup_chars"))

    def merge(acc, x):
        # run > 0 guards the initial prev="" sentinel: a legitimate
        # empty-string first element must START a run, not extend one
        same = (x == acc["prev"]) & (acc["run"] > 0)
        run2 = acc["run"] + 1
        new = [
            x.alias("prev"),
            F.when(same, run2).otherwise(F.lit(1)).alias("run"),
            (acc["cnt"] + 1).alias("cnt"),
            F.when(same, F.greatest(acc["mx"], run2))
            .otherwise(F.greatest(acc["mx"], F.lit(1))).alias("mx"),
            F.when(
                same,
                acc["dup"] + F.when(run2 == 2, F.lit(2)).otherwise(F.lit(1)),
            ).otherwise(acc["dup"]).alias("dup"),
        ]
        if with_chars:
            new.append((acc["chars"] + F.length(x)).alias("chars"))
            new.append(
                F.when(
                    same,
                    acc["dup_chars"]
                    + F.length(x)
                    * F.when(run2 == 2, F.lit(2)).otherwise(F.lit(1)),
                ).otherwise(acc["dup_chars"]).alias("dup_chars")
            )
        return F.struct(*new)

    return F.aggregate(F.array_sort(arr), F.struct(*fields), merge)


def _once(df: DataFrame, id_col: str, expr) -> DataFrame:
    """(id, x=expr) with ``expr`` GUARANTEED to evaluate once per row:
    explode(array(expr)) puts it inside a Generate, which projection
    collapse cannot cross — without this, every output column that
    extracts a field would re-run the whole (expensive) fold, and the
    optimizer would happily inline it (measured 6x waste in the
    text_repetition gate)."""
    return df.select(
        F.col(id_col).alias("id"), F.explode(F.array(expr)).alias("x")
    )


def _frac(num, den):
    return F.round(
        F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0)), 6
    )


def _ngrams(toks, n: int):
    """All n-gram instance strings of a token array (space-joined),
    empty array when the document has fewer than n tokens."""
    count = F.size(toks) - (n - 1)
    idx = F.when(count > 0, F.sequence(F.lit(0), count - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))


def ngram_repetition(
    df: DataFrame, id_col: str, text_col: str, ns: tuple[int, ...] = (2, 3)
) -> DataFrame:
    """(id, n_tokens, top_{n}gram_frac, dup_{n}gram_frac per n) — the
    Gopher-style repetition quality signals (Rae et al. 2021 §A1.1),
    token-level variant:

      top_ngram_frac — instances of the single most frequent n-gram /
                       total n-gram instances,
      dup_ngram_frac — instances whose n-gram occurs more than once /
                       total n-gram instances.

    Boilerplate and templated spam score high on both; 0.0 for
    documents with fewer than n tokens.  Pure in-row column
    expressions (sorted-fold, no explode/shuffle/UDF): at 100 TB this
    is a narrow map over the corpus scan.
    """
    toks = _tokens(F.col(text_col))
    inner = F.struct(
        F.size(toks).alias("n_tokens"),
        *[_run_stats(_ngrams(toks, n)).alias(f"st{n}") for n in ns],
    )
    once = _once(df, id_col, inner)
    cols = [F.col("id"), F.col("x.n_tokens").alias("n_tokens")]
    for n in ns:
        st = F.col(f"x.st{n}")
        cols.append(_frac(st["mx"], st["cnt"]).alias(f"top_{n}gram_frac"))
        cols.append(_frac(st["dup"], st["cnt"]).alias(f"dup_{n}gram_frac"))
    return once.select(*cols)


def line_repetition(
    df: DataFrame, id_col: str, text_col: str, sep: str = "\n"
) -> DataFrame:
    """(id, n_lines, dup_line_frac, dup_line_char_frac) — fraction of
    lines (and of line characters) belonging to a line value that
    occurs more than once in the document (Gopher §A1.1 duplicate-line
    filters).  Lines are ``sep``-split, trimmed, empties dropped.
    Same zero-shuffle sorted-fold as ngram_repetition."""
    # NB: the trim lambda must be single-arg — F.trim itself takes an
    # optional second param (the trim char set) and transform() would
    # feed it the element INDEX, silently trimming digits instead.
    lines = F.filter(
        F.transform(F.split(F.col(text_col), sep), lambda x: F.trim(x)),
        lambda x: F.length(x) > 0,
    )
    once = _once(df, id_col, _run_stats(lines, with_chars=True))
    st = F.col("x")
    return once.select(
        "id",
        st["cnt"].alias("n_lines"),
        _frac(st["dup"], st["cnt"]).alias("dup_line_frac"),
        _frac(st["dup_chars"], st["chars"]).alias("dup_line_char_frac"),
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
