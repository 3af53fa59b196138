"""Engine configuration constants.

Every constant mirrors a published operational limit of the reference
(cites are file:line inside /root/reference):

- FIELD_WEIGHTS: ``$wgSphinxQL_weights = array('category' => 2, 'text' => 1,
  'title' => 20)`` (SphinxSearchEngine.php:110).
- FRESHNESS_HORIZON_S / FRESHNESS_BOOST: ranker expression
  ``1000*pow(max(1-(now()-(date_insert+date_modify)/2)/47304000, 0), 4)``
  (SphinxSearchEngine_class.php:113).
- BM25_K1 / BM25_SCALE: classic Sphinx BM25 with k1=1.2 scaled into
  [0, 999] (the "+999" term of the max-score bound at
  SphinxSearchEngine_class.php:286,297).
- MIN_WORD_LEN: ``min_word_len = 2`` (sphinx.conf:18).
- FIELD_SIZE_CAP: 2 MB per field (SphinxSearchEngine_class.php:430).
- MATCH_CAP: per-query match cap 1000 (SphinxSearchEngine_class.php:169).
- FACET_CAP: category facet cap 1000 groups (SphinxSearchEngine_class.php:313).
"""

from __future__ import annotations

from dataclasses import dataclass, field

# --- field model (sphinx.conf:8-12) ------------------------------------
# Full-text fields, in declaration order.  Our source-code corpus maps
# content->text, path->title, mangled (repo,lang) tokens->category_search.
FIELDS: dict[str, int] = {"text": 0, "title": 1, "category_search": 2}
FIELD_NAMES: list[str] = ["text", "title", "category_search"]

# SphinxSearchEngine.php:110 — weights keyed by field name.
FIELD_WEIGHTS: dict[str, int] = {"text": 1, "title": 20, "category_search": 2}

# --- ranking (SphinxSearchEngine_class.php:113,284-303) -----------------
BM25_K1: float = 1.2
BM25_SCALE: int = 999
PROXIMITY_SCALE: int = 2000  # sum(lcs*user_weight)/max_lcs * 2000
FRESHNESS_HORIZON_S: int = 47_304_000  # ~1.5 years
FRESHNESS_BOOST: int = 1000
FRESHNESS_POW: int = 4

# --- tokenizer (sphinx.conf:15-20) --------------------------------------
MIN_WORD_LEN: int = 2
BLEND_CHARS: str = "_-&+@$"
EXACT_PREFIX: str = "="  # index_exact_words=1: raw form indexed as '=word'

# Sphinx's expand_keywords/dict=keywords pairs with an expansion_limit
# (public searchd option) so a short prefix cannot explode into 10^4
# keywords; the most-frequent terms win.  Deterministic tiebreak: term asc.
EXPANSION_LIMIT: int = 64

# --- operational limits --------------------------------------------------
FIELD_SIZE_CAP: int = 2 * 1024 * 1024  # bytes of text per field
MATCH_CAP: int = 1000
FACET_CAP: int = 1000
BULK_BATCH_ROWS: int = 256

# --- index layout ---------------------------------------------------------
# Postings are hash-bucketed by term so a query prunes to |terms| buckets.
# At 10^12-doc scale this would be thousands of buckets; for local test
# scale a small power of two keeps file counts sane.
DEFAULT_TERM_BUCKETS: int = 16
POSTINGS_BLOCK: int = 128  # docids per block for block-max metadata


@dataclass(frozen=True)
class EngineConfig:
    """Tunable knobs for one index instance."""

    term_buckets: int = DEFAULT_TERM_BUCKETS
    bm25_k1: float = BM25_K1
    min_word_len: int = MIN_WORD_LEN
    field_weights: dict[str, int] = field(
        default_factory=lambda: dict(FIELD_WEIGHTS)
    )
    postings_block: int = POSTINGS_BLOCK
