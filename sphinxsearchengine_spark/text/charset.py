"""Character-set contract of the index (sphinx.conf:15-16).

``charset_table = 0..9, A..Z->a..z, a..z, U+410..U+42F->U+430..U+44F,
U+430..U+44F`` — token characters are ASCII digits, Latin letters
(case-folded) and the basic Cyrillic block (case-folded); everything else
separates tokens.

``blend_chars = _, -, &, +, @, $`` — these characters are *both* token
characters and separators: ``foo_bar`` is indexed as the blended token
``foo_bar`` plus the parts ``foo`` and ``bar`` at the same position.

Note U+0401/U+0451 (Ё/ё) are deliberately NOT in the table — the reference
config omits them, so they act as separators.  We replicate that exactly.
"""

from __future__ import annotations

import re
import unicodedata

# Case-fold map: A..Z -> a..z, U+0410..U+042F -> U+0430..U+044F.
_FOLD = {c: c + 32 for c in range(ord("A"), ord("Z") + 1)}
_FOLD.update({c: c + 32 for c in range(0x410, 0x42F + 1)})
FOLD_TABLE = str.maketrans({chr(k): chr(v) for k, v in _FOLD.items()})

# Token character class AFTER folding (lowercase only).
TOKEN_CLASS = "0-9a-zа-я"
BLEND_CLASS = re.escape("_-&+@$")

# A primary token: a run of token chars and/or blend chars that contains at
# least one real token char (pure blend runs like "--" are separators).
PRIMARY_TOKEN_RE = re.compile(
    f"[{TOKEN_CLASS}{BLEND_CLASS}]*[{TOKEN_CLASS}][{TOKEN_CLASS}{BLEND_CLASS}]*"
)
# Pre-fold variant: folding only maps token chars to token chars
# (A..Z->a..z, А..Я->а..я), so matching the unfolded class yields the SAME
# spans as fold-then-match — lets bulk pipelines fold per unique token
# instead of per character of input.
TOKEN_CLASS_UNFOLDED = "0-9a-zA-Zа-яА-Я"
PRIMARY_TOKEN_UNFOLDED_RE = re.compile(
    f"[{TOKEN_CLASS_UNFOLDED}{BLEND_CLASS}]*[{TOKEN_CLASS_UNFOLDED}]"
    f"[{TOKEN_CLASS_UNFOLDED}{BLEND_CLASS}]*"
)
# Split a blended token into its parts.
BLEND_SPLIT_RE = re.compile(f"[{BLEND_CLASS}]+")
# Any blend char (to test whether a token is blended).
HAS_BLEND_RE = re.compile(f"[{BLEND_CLASS}]")
# Strip leading/trailing blend chars from the blended form (Sphinx trims
# blended tokens of boundary blend chars: "-foo-" blends to "foo").
EDGE_BLEND_RE = re.compile(f"^[{BLEND_CLASS}]+|[{BLEND_CLASS}]+$")

LATIN_RE = re.compile(r"^[a-z]+$")
CYRILLIC_RE = re.compile("^[а-я]+$")


def nfc(text: str) -> str:
    """T7 — Unicode NFC normalization (the reference applies MediaWiki's
    normalizeForSearch before indexing, SphinxSearchUpdate.php:56).
    Without it the NFC and NFD spellings of the same word tokenize
    differently (decomposed é = e + U+0301: the combining mark is a
    separator, so NFD 'café' would yield token 'cafe' while NFC yields
    'caf').  ``is_normalized`` short-circuits pure-ASCII text, keeping
    the bulk-tokenizer hot path unaffected."""
    if unicodedata.is_normalized("NFC", text):
        return text
    return unicodedata.normalize("NFC", text)


def fold(text: str) -> str:
    """NFC-normalize (T7), then case-fold per charset_table (Latin +
    basic Cyrillic)."""
    return nfc(text).translate(FOLD_TABLE)
