"""Personal dictionary CRUD — Q18 (SphinxSearch_PersonalDict.php:87-194).

The reference keeps one aspell ``.pws`` word file per user, edited
through a special page (view / add / delete), and merges the user's
words into spell-suggestion candidates (SphinxSearch_spell.php:51-99
loads the personal dict into the pspell config).

Spark-side analog: the word lists are tiny per-user admin metadata —
exactly like ``meta.json`` — so they live in one JSON document under the
index dir, written with the same scheme-aware atomic-rename fs helpers
the segment metadata uses (fs.py).  Integration points:

- :func:`did_you_mean` treats a user's personal words as KNOWN (never
  flagged as typos) when a ``user`` is passed,
- personal words join the suggestion candidate pool with top priority
  on the df tie-break (the reference merges user+language suggestions
  and picks min Levenshtein).
"""

from __future__ import annotations

import os

from sphinxsearchengine_spark import fs

_FILE = "personal_dict.json"

# df used for personal words in the (dist, -df, term) suggestion
# ordering: personal words win every same-distance tie, like the
# reference consulting the user's dict first.
PERSONAL_DF = 1 << 62


def _path(index_dir: str) -> str:
    return os.path.join(index_dir, _FILE)


def _load(index_dir: str) -> dict[str, list[str]]:
    return fs.read_json(_path(index_dir), default={})


def words(index_dir: str, user: str) -> list[str]:
    """Current word list for `user` (sorted; the special page 'view')."""
    return sorted(_load(index_dir).get(user, []))


def add_word(index_dir: str, user: str, word: str) -> bool:
    """Add `word` (lowercased) to the user's dictionary; False if it was
    already present (the reference ignores duplicate adds)."""
    word = word.strip().lower()
    if not word:
        return False
    d = _load(index_dir)
    lst = set(d.get(user, []))
    if word in lst:
        return False
    lst.add(word)
    d[user] = sorted(lst)
    fs.write_json_atomic(_path(index_dir), d)
    return True


def remove_word(index_dir: str, user: str, word: str) -> bool:
    """Delete `word` from the user's dictionary; False if absent."""
    word = word.strip().lower()
    d = _load(index_dir)
    lst = set(d.get(user, []))
    if word not in lst:
        return False
    lst.discard(word)
    if lst:
        d[user] = sorted(lst)
    else:
        d.pop(user, None)
    fs.write_json_atomic(_path(index_dir), d)
    return True
