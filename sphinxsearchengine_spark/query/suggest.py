"""Spell suggestion — "did you mean" (SURVEY.md Q17).

The reference shells out to pspell/aspell and picks the suggestion with
minimal Levenshtein distance (SphinxSearch_spell.php:14-47,170-188).
No external speller exists at 10^12-doc scale anyway; the index's own
term dictionary is the richer lexicon.  For each query keyword that is
rare/absent, propose the dictionary term with (edit distance <= 2)
minimizing (distance, -df, term) — all JVM-side (F.levenshtein),
dictionary scan pruned by the length band |len(t)-len(w)| <= max_dist.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from sphinxsearchengine_spark.config import EXACT_PREFIX
from sphinxsearchengine_spark.index.layout import IndexLayout
from sphinxsearchengine_spark.query.parser import parse_query
from sphinxsearchengine_spark.text.tokenizer import stem_token


def suggest_term(
    spark: SparkSession, index_dir: str, word: str, max_dist: int = 2,
    min_df: int = 1,
) -> str | None:
    """Best dictionary replacement for `word`, or None."""
    from sphinxsearchengine_spark.query.executor import _live_union

    layout = IndexLayout(index_dir)
    dic = _live_union(spark, layout, "dict")
    w = word.lower()
    cand = (
        dic.filter(
            (~F.col("term").startswith(EXACT_PREFIX))
            & (F.length("term") >= len(w) - max_dist)
            & (F.length("term") <= len(w) + max_dist)
            & (F.col("df") >= min_df)
        )
        .withColumn("dist", F.levenshtein(F.col("term"), F.lit(w)))
        .filter(F.col("dist") <= max_dist)
        .groupBy("term", "dist")
        .agg(F.sum("df").alias("df"))
        .orderBy(F.col("dist").asc(), F.col("df").desc(), F.col("term").asc())
        .limit(1)
        .collect()
    )
    if not cand:
        return None
    best = cand[0]
    return None if best.dist == 0 else best.term


def did_you_mean(
    spark: SparkSession, index_dir: str, raw_query: str, rare_df: int = 1
) -> str | None:
    """Rebuild the query with suggestions for unknown/rare keywords;
    None when every keyword is known (reference behavior: only offer a
    suggestion when something actually changed)."""
    from sphinxsearchengine_spark.query.executor import _expand_groups

    q = parse_query(raw_query)
    if q.blank or not q.groups:
        return None
    layout = IndexLayout(index_dir)
    _mapping, stats, _b = _expand_groups(spark, layout, q)
    changed = False
    out_words: list[str] = []
    for g in q.groups:
        for a in g.alts:
            w = a.words[0] if a.kind != "phrase" else None
            if w is None:
                out_words.extend(a.words)
                continue
            df = stats.get(stem_token(w), (0, 0, 0))[0]
            if df <= rare_df - 1:
                s = suggest_term(spark, index_dir, w)
                if s and s != w:
                    out_words.append(s)
                    changed = True
                    continue
            out_words.append(w)
    return " ".join(out_words) if changed else None
