"""Spell suggestion — "did you mean" (SURVEY.md Q17).

The reference shells out to pspell/aspell and picks the suggestion with
minimal Levenshtein distance (SphinxSearch_spell.php:14-47,170-188).
No external speller exists at 10^12-doc scale anyway; the index's own
term dictionary is the richer lexicon.  For each query keyword that is
rare/absent, propose the dictionary term with (edit distance <= 2)
minimizing (distance, -df, term).

ALL unknown keywords of a query are resolved in ONE pass (round 2 ran
one Spark job per keyword — the N+1 pattern struck exactly when a query
had several typos, the worst latency moment):

- Spark path: one job — broadcast the word list against the dictionary
  pruned to the union of length bands, JVM-side F.levenshtein, one
  min-struct aggregation for every word at once.
- Driver-RAM path (Searcher's pinned dictionary, the searchd-wordlist
  analog): zero Spark jobs — banded candidate scan + a small pure-python
  edit-distance DP over the band.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from sphinxsearchengine_spark.config import EXACT_PREFIX
from sphinxsearchengine_spark.index.layout import IndexLayout
from sphinxsearchengine_spark.query.parser import parse_query
from sphinxsearchengine_spark.text.tokenizer import stem_token


def _levenshtein(a: str, b: str) -> int:
    """Plain O(|a|·|b|) DP — only runs on the driver over length-banded
    candidates of explicitly-typoed words, never in a hot loop."""
    if a == b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def suggest_terms(
    spark: SparkSession,
    index_dir: str,
    words: list[str],
    max_dist: int = 2,
    min_df: int = 1,
    dict_pdf=None,
    extra_words: list[str] | None = None,
) -> dict[str, str | None]:
    """Best dictionary replacement for EVERY word in one pass.

    Returns {word: suggestion-or-None}; None when no candidate within
    ``max_dist`` exists or the best candidate is the word itself.
    ``dict_pdf``: Searcher's driver-pinned dictionary frame — when given,
    no Spark job runs at all.
    ``extra_words``: additional candidate words (the user's personal
    dictionary, Q18) that outrank index terms on the df tie-break.
    """
    words = [w.lower() for w in words]
    if not words:
        return {}
    # best candidate per word as a (dist, -df, term) key; min wins —
    # identical ordering on every path (index terms, personal words)
    best_key: dict[str, tuple] = {}

    def offer(w: str, key: tuple) -> None:
        if w in best_key and best_key[w] <= key:
            return
        best_key[w] = key

    if extra_words:
        from sphinxsearchengine_spark.query.personal_dict import PERSONAL_DF

        for w in words:
            for c in extra_words:
                if abs(len(c) - len(w)) <= max_dist:
                    d = _levenshtein(c, w)
                    if d <= max_dist:
                        offer(w, (d, -PERSONAL_DF, c))

    lens = {len(w) for w in words}
    band_lens = sorted(
        {n + d for n in lens for d in range(-max_dist, max_dist + 1) if n + d > 0}
    )

    if dict_pdf is not None:
        cand = dict_pdf[
            ~dict_pdf["term"].str.startswith(EXACT_PREFIX)
            & dict_pdf["term"].str.len().isin(band_lens)
            & (dict_pdf["df"] >= min_df)
        ]
        # duplicate terms across segments: sum df like the Spark path
        df_by_term = cand.groupby("term")["df"].sum()
        for w in words:
            for term, dfv in df_by_term.items():
                if abs(len(term) - len(w)) > max_dist:
                    continue
                d = _levenshtein(term, w)
                if d <= max_dist:
                    offer(w, (d, -int(dfv), term))
    else:
        from sphinxsearchengine_spark.query.executor import _live_union

        layout = IndexLayout(index_dir)
        dic = _live_union(spark, layout, "dict")
        wdf = spark.createDataFrame([(w,) for w in words], "word string")
        j = (
            dic.filter(
                (~F.col("term").startswith(EXACT_PREFIX))
                & F.length("term").isin(band_lens)
                & (F.col("df") >= min_df)
            )
            .groupBy("term")
            .agg(F.sum("df").alias("df"))
            .join(F.broadcast(wdf),
                  F.abs(F.length("term") - F.length("word")) <= max_dist)
            .withColumn("dist", F.levenshtein(F.col("term"), F.col("word")))
            .filter(F.col("dist") <= max_dist)
        )
        best = j.groupBy("word").agg(
            F.min(F.struct(F.col("dist"), (-F.col("df")).alias("ndf"),
                           F.col("term"))).alias("b")
        )
        for r in best.collect():
            offer(r.word, (int(r.b.dist), int(r.b.ndf), r.b.term))

    out: dict[str, str | None] = {w: None for w in words}
    for w, key in best_key.items():
        if key[0] > 0:
            out[w] = key[2]
    return out


def suggest_term(
    spark: SparkSession, index_dir: str, word: str, max_dist: int = 2,
    min_df: int = 1,
) -> str | None:
    """Best dictionary replacement for one `word`, or None."""
    return suggest_terms(spark, index_dir, [word], max_dist, min_df)[word.lower()]


def did_you_mean(
    spark: SparkSession, index_dir: str, raw_query: str, rare_df: int = 1,
    _ctx: dict | None = None, user: str | None = None,
) -> str | None:
    """Rebuild the query with suggestions for unknown/rare keywords;
    None when every keyword is known (reference behavior: only offer a
    suggestion when something actually changed).  All unknown keywords
    resolve in one batched pass (zero Spark jobs with a Searcher-pinned
    dictionary, one otherwise).

    ``user``: consult that user's personal dictionary (Q18) — personal
    words are never flagged as typos and join the candidate pool with
    top priority, like the reference's pspell personal-dict config
    (SphinxSearch_spell.php:51-99)."""
    from sphinxsearchengine_spark.query.executor import _expand_groups

    q = parse_query(raw_query)
    if q.blank or not q.groups:
        return None
    layout = IndexLayout(index_dir)
    dict_pdf = _ctx.get("dict_pdf") if _ctx else None
    _mapping, stats, _b = _expand_groups(spark, layout, q, dict_pdf)

    personal: list[str] = []
    if user is not None:
        from sphinxsearchengine_spark.query import personal_dict

        personal = personal_dict.words(index_dir, user)
    pset = set(personal)

    rare: list[str] = []
    for g in q.groups:
        for a in g.alts:
            if a.kind == "phrase":
                continue
            w = a.words[0]
            if w.lower() in pset:
                continue  # personal word — known by definition
            if stats.get(stem_token(w), (0, 0, 0))[0] <= rare_df - 1:
                rare.append(w)
    suggestions = suggest_terms(spark, index_dir, rare, dict_pdf=dict_pdf,
                                extra_words=personal)

    changed = False
    out_words: list[str] = []
    for g in q.groups:
        for a in g.alts:
            if a.kind == "phrase":
                out_words.extend(a.words)
                continue
            w = a.words[0]
            s = suggestions.get(w.lower())
            if s and s != w:
                out_words.append(s)
                changed = True
            else:
                out_words.append(w)
    return " ".join(out_words) if changed else None
