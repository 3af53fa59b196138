"""Excerpts/snippets (SURVEY.md Q16).

The reference round-trips each hit through ``CALL SNIPPETS``
(SphinxSearchEngine_class.php:245-282) — an N+1 pattern.  Here one
Arrow-vectorized pass builds all excerpts: match spans are located with
the SAME tokenizer contract as the index (fold, blend, stem, exact),
windows of ±`around` words are merged, chunks joined by the separator
and capped at `limit` chars.

Defaults mirror $wgSphinxSE_excerpts_options (SphinxSearchEngine.php:101-107):
before_match='<b>', after_match='</b>', chunk_separator=' … ',
limit=200, around=15.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from sphinxsearchengine_spark.text import charset
from sphinxsearchengine_spark.text.tokenizer import stem_token
from sphinxsearchengine_spark.query.parser import Query, parse_query

DEFAULTS = {
    "before_match": "<b>",
    "after_match": "</b>",
    "chunk_separator": " … ",
    "limit": 200,
    "around": 15,
    # The reference html-escapes document text and protects its match
    # markers with the \x01/\x02 placeholder trick
    # (SphinxSearchEngine_class.php:252-266).  We build the excerpt from
    # pieces, so escaping each text slice before inserting the (never
    # escaped) markers is equivalent — and keeps HTML-ish corpora from
    # injecting markup into results.
    "html_escape": True,
}


def _query_matchers(query: Query):
    """(stems, exacts, prefixes) a token must hit to count as a match."""
    stems: set[str] = set()
    exacts: set[str] = set()
    prefixes: list[str] = []
    for g in query.groups:
        for a in g.alts:
            if a.kind == "kw":
                stems.add(stem_token(a.words[0]))
                exacts.add(a.words[0])
            elif a.kind == "exact":
                exacts.add(a.words[0])
            elif a.kind == "prefix":
                prefixes.append(a.words[0])
            else:
                stems.update(stem_token(w) for w in a.words)
    return stems, exacts, tuple(prefixes)


def build_excerpt(text: str, stems, exacts, prefixes, opts) -> str:
    """Single-document excerpt (shared by the pandas UDF and tests)."""
    import html as _html

    esc = _html.escape if opts.get("html_escape") else (lambda s: s)
    folded = charset.fold(text)
    tokens = []  # (start_char, end_char, matched)
    for m in charset.PRIMARY_TOKEN_RE.finditer(folded):
        tok = m.group(0)
        hit = False
        for part in charset.BLEND_SPLIT_RE.split(tok):
            if not part:
                continue
            if (
                part in exacts
                or stem_token(part) in stems
                or (prefixes and part.startswith(prefixes))
            ):
                hit = True
                break
        if not hit and (tok in exacts or stem_token(tok) in stems):
            hit = True
        tokens.append((m.start(), m.end(), hit))
    if not tokens:
        return esc(text[: opts["limit"]])
    matched_idx = [i for i, t in enumerate(tokens) if t[2]]
    if not matched_idx:
        # no match → document head (the reference shows leading text)
        end = tokens[min(len(tokens) - 1, 2 * opts["around"])][1]
        return esc(text[: min(end, opts["limit"])])
    around = opts["around"]
    windows: list[list[int]] = []
    for i in matched_idx:
        lo, hi = max(0, i - around), min(len(tokens) - 1, i + around)
        if windows and lo <= windows[-1][1] + 1:
            windows[-1][1] = hi
        else:
            windows.append([lo, hi])
    out_parts = []
    budget = opts["limit"]
    for lo, hi in windows:
        if budget <= 0:
            break
        frag = ""
        cursor = tokens[lo][0]
        for i in range(lo, hi + 1):
            s, e, hit = tokens[i]
            frag += esc(text[cursor:s])
            word = esc(text[s:e])
            frag += (opts["before_match"] + word + opts["after_match"]) if hit else word
            cursor = e
        frag = frag.strip()
        out_parts.append(frag[: max(budget, 0)])
        budget -= len(frag) + len(opts["chunk_separator"])
    return opts["chunk_separator"].join(out_parts)


def with_snippets(
    results: DataFrame, query: Query | str, text_col: str = "content",
    out_col: str = "snippet", **options
) -> DataFrame:
    """Add an excerpt column to a hydrated result DataFrame."""
    if isinstance(query, str):
        query = parse_query(query)
    opts = {**DEFAULTS, **options}
    stems, exacts, prefixes = _query_matchers(query)

    @F.pandas_udf("string")
    def make(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: build_excerpt(t or "", stems, exacts, prefixes, opts)
        )

    return results.withColumn(out_col, make(F.col(text_col)))
