"""Ranking math (SURVEY.md Q7/Q8/Q14) — single source of truth.

These functions are imported by BOTH the Spark executor (driver-side idf
constants + pandas-UDF proximity) and the pure-Python oracle scorer, so
engine/oracle rank-identity holds by construction.

The ranker replicates the reference expression
(SphinxSearchEngine_class.php:113, identical at :170):

    sum(lcs*user_weight)/max_lcs*2000
      + bm25
      + 1000*pow(max(1-(now()-(date_insert+date_modify)/2)/47304000,0),4)

- ``bm25`` is Sphinx's classic (length-norm-free) BM25 scaled into
  [0, 999]: per matched term t, idf_t = ln((N-df_t+1)/df_t)/(2 ln(N+1))
  normalized by the query keyword count; doc value = (0.5 + Σ idf_t ·
  tf_t/(tf_t+k1)) · 999 with k1 = 1.2.  (Formula per the published
  Sphinx 2.x ranking docs; the [0,999] range is what the reference's
  max-score bound "+999" at :286,297 assumes.)
- ``max_lcs = n_keywords · Σ field_weights`` so the proximity term spans
  [0, 2000].
- ``now`` is a pinned query parameter, never wall clock (determinism,
  SURVEY.md §7 hard-part (c)).
- Q14 normalization: ``maxScore = n_keywords × Σweights × 1000 + 999``
  (SphinxSearchEngine_class.php:284-303); reported score = raw/maxScore.
"""

from __future__ import annotations

import math

from sphinxsearchengine_spark.config import (
    BM25_K1,
    BM25_SCALE,
    FIELD_WEIGHTS,
    FRESHNESS_BOOST,
    FRESHNESS_HORIZON_S,
    FRESHNESS_POW,
    PROXIMITY_SCALE,
)


def idf(df: int, n_docs: int, n_keywords: int) -> float:
    """Sphinx normalized idf, pre-divided by query keyword count.

    Clamped at 0 (Sphinx floors negative idf): segment-summed df can
    exceed live n_docs between compactions (dead copies counted), and
    without the clamp the log argument goes non-positive and raises.
    """
    if df <= 0 or n_docs <= 0:
        return 0.0
    x = (n_docs - df + 1) / df
    if x <= 1.0:
        return 0.0
    raw = math.log(x) / (2.0 * math.log(n_docs + 1))
    return raw / max(n_keywords, 1)


def bm25_term(idf_t: float, tf: int, k1: float = BM25_K1) -> float:
    return idf_t * tf / (tf + k1)


def bm25_scale(raw_sum: float) -> float:
    return (raw_sum + 0.5) * BM25_SCALE


def freshness(now_ts: int, date_insert: int, date_modify: int) -> float:
    age = now_ts - (date_insert + date_modify) / 2.0
    base = max(1.0 - age / FRESHNESS_HORIZON_S, 0.0)
    return FRESHNESS_BOOST * base**FRESHNESS_POW


def max_lcs(n_keywords: int, weights: dict[str, int] | None = None) -> int:
    w = weights or FIELD_WEIGHTS
    return max(n_keywords, 1) * sum(w.values())


def proximity_score(weighted_lcs_sum: float, n_keywords: int,
                    weights: dict[str, int] | None = None) -> float:
    return weighted_lcs_sum / max_lcs(n_keywords, weights) * PROXIMITY_SCALE


def max_score(n_keywords: int, weights: dict[str, int] | None = None,
              n_categories: int = 0) -> float:
    """Q14 normalizer (SphinxSearchEngine_class.php:284-303).

    ``n_keywords`` counts the *user* keywords (the reference regexes the
    raw term, :289); each selected category adds the category field
    weight once (:298-301)."""
    w = weights or FIELD_WEIGHTS
    base = max(n_keywords, 1) * sum(w.values()) * 1000 + 999
    return base + w.get("category_search", 0) * n_categories


def lcs_of_field(group_positions: dict[int, list[int]], n_groups: int) -> int:
    """Longest run of query keywords 0..n-1 matched at consecutive
    positions in one field — the per-field LCS of the proximity ranker.

    ``group_positions``: gid -> sorted positions where that keyword
    matched.  A phrase group's positions are its occurrence starts.
    """
    if not group_positions:
        return 0
    best = 1
    # chain[p] = length of keyword run ending with keyword g at position p
    prev: dict[int, int] = {}
    for g in range(n_groups):
        cur: dict[int, int] = {}
        for p in group_positions.get(g, ()):  # sorted
            length = prev.get(p - 1, 0) + 1
            cur[p] = length
            if length > best:
                best = length
        prev = cur
    return best
