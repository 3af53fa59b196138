"""Spell suggestion — "did you mean" (SURVEY.md Q17).

The reference shells out to pspell/aspell and picks the suggestion with
minimal Levenshtein distance (SphinxSearch_spell.php:14-47,170-188).
No external speller exists at 10^12-doc scale anyway; the index's own
term dictionary is the richer lexicon.  For each query keyword that is
rare/absent, propose the dictionary SURFACE FORM with (edit distance
<= 2) minimizing (distance, -count, form).

Candidates are surface forms, not stems (round-3 verdict #3: the
stemmed dictionary suggested 'merg' for 'mergge' — a stem the reference
speller would never utter).  index_exact_words=1 means the index
already stores every surface form with a doc count: a stem-changing
surface w lives on its own '=w' row (whose exact_df == its df), a
stem-identical surface lives on its stem row's exact_df.  So the
candidate pool is simply ALL dictionary rows with exact_df > 0, keyed
by the '='-stripped term — real indexed words, ranked by how many
live docs contain them verbatim.

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
    """Best surface-form replacement for EVERY word in one pass.

    Returns {word: suggestion-or-None}; None when no candidate within
    ``max_dist`` exists or the best candidate is the word itself.
    ``min_df``: minimum exact-occurrence doc count for a surface form
    to be suggestable.
    ``dict_pdf``: Searcher's driver-pinned dictionary frame — when given,
    no Spark job runs at all.
    ``extra_words``: additional candidate words (the user's personal
    dictionary, Q18) that outrank index terms on the count tie-break.
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

    # surface form = '='-stripped term; count = exact_df (for '=w' rows
    # exact_df == df; for stem-identical surfaces it is the stem row's
    # exact-occurrence doc count) — see module docstring
    if dict_pdf is not None:
        cand = dict_pdf[dict_pdf["exact_df"] >= max(min_df, 1)]
        forms = cand["term"].where(
            ~cand["term"].str.startswith(EXACT_PREFIX),
            cand["term"].str.slice(len(EXACT_PREFIX)),
        )
        cand = cand.assign(form=forms)
        cand = cand[cand["form"].str.len().isin(band_lens)]
        cnt_by_form = cand.groupby("form")["exact_df"].sum()
        for w in words:
            for form, cv in cnt_by_form.items():
                if abs(len(form) - len(w)) > max_dist:
                    continue
                d = _levenshtein(form, w)
                if d <= max_dist:
                    offer(w, (d, -int(cv), form))
    else:
        from sphinxsearchengine_spark.query.executor import _live_union

        layout = IndexLayout(index_dir)
        dic = _live_union(spark, layout, "dict")
        wdf = spark.createDataFrame([(w,) for w in words], "word string")
        form = F.when(
            F.col("term").startswith(EXACT_PREFIX),
            F.expr(f"substring(term, {len(EXACT_PREFIX) + 1})"),
        ).otherwise(F.col("term"))
        j = (
            dic.filter(F.col("exact_df") >= max(min_df, 1))
            .select(form.alias("form"), "exact_df")
            .filter(F.length("form").isin(band_lens))
            .groupBy("form")
            .agg(F.sum("exact_df").alias("cnt"))
            .join(F.broadcast(wdf),
                  F.abs(F.length("form") - F.length("word")) <= max_dist)
            .withColumn("dist", F.levenshtein(F.col("form"), F.col("word")))
            .filter(F.col("dist") <= max_dist)
        )
        best = j.groupBy("word").agg(
            F.min(F.struct(F.col("dist"), (-F.col("cnt")).alias("ncnt"),
                           F.col("form"))).alias("b")
        )
        for r in best.collect():
            offer(r.word, (int(r.b.dist), int(r.b.ncnt), r.b.form))

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
