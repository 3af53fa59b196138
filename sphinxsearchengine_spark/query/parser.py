"""Query-language parser (SURVEY.md §2.3 Q1-Q6).

Covers the Sphinx extended-mode subset the reference actually emits
(SphinxSearchEngine_class.php:98-110):

- implicit AND between space-separated units          (Q1)
- ``a|b`` OR alternation within a unit                (Q2)
- ``@field term`` / ``@field "phrase"`` field limit   (Q3)
- ``"quoted phrase"`` exact-adjacency phrase          (Q4)
- ``=word`` exact (pre-morphology) form               (part of Q5)
- ``word*`` explicit prefix wildcard                  (enable_star,
  SphinxSearchEngine.php:32)

With ``expand_keywords = 1`` (sphinx.conf:20) every plain keyword
auto-expands at planning time to ``(=kw | stem(kw) | kw*)``; explicit
``=word`` / ``word*`` atoms suppress the expansion.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

from sphinxsearchengine_spark.config import FIELDS
from sphinxsearchengine_spark.text.tokenizer import (
    is_blank_query,
    sanitize_query,
    tokenize,
)


@dataclass(frozen=True)
class Atom:
    kind: str            # 'kw' | 'exact' | 'prefix' | 'phrase'
    words: tuple         # normalized word(s); phrase → members in order


@dataclass
class Group:
    """One AND unit: OR'd alternatives, optional field restriction."""

    alts: list          # list[Atom]
    field: int = -1     # FIELDS id, -1 = all fields


@dataclass
class Query:
    groups: list = dc_field(default_factory=list)
    blank: bool = False
    raw: str = ""


# One unit = optional @field limit + a body of quoted spans / non-space
# runs.  Alternation (|) binds tighter than the implicit AND between
# units, and may mix keywords and quoted phrases — the reference emits
# exactly that shape for category filters:
# '@category_search "__c__"|"__d__"' (SphinxSearchEngine_class.php:98-102).
_UNIT_RE = re.compile(r'(?:@(?P<fld>\w+)\s+)?(?P<body>(?:"[^"]*"|\S)+)')


def _norm_word(w: str) -> list[str]:
    """Fold one query word through the index tokenizer; a blended token
    yields its split parts (consecutive positions) like the index side."""
    return [forms[0] for _, forms in tokenize(w)]


def _atom_from_text(text: str) -> list[Atom]:
    """One query word -> atom(s), honoring =exact / prefix* markers.

    On conflicting markers ('=word*') the exact marker wins — '=' is the
    stronger, more specific request (match this surface form only), and
    this preserves the pre-round-4 precedence (ADVICE r4)."""
    exact = text.startswith("=")
    prefix = text.endswith("*")
    stripped = text.strip("=*")
    if exact:
        words = _norm_word(stripped)
        if not words:
            return []
        return [Atom("exact", (w,)) for w in words]
    if prefix:
        # a prefix stub is not a word: min_word_len gates INDEXED terms
        # (and the expansion only ever yields real dict terms of full
        # length), so 'b*' must survive even with min_word_len=2
        from sphinxsearchengine_spark.config import MIN_WORD_LEN

        parts = [forms[0] for _, forms in tokenize(stripped, min_word_len=1)]
        if not parts:
            return []
        # only the last part keeps prefix semantics: "foo_ba*" → foo AND ba*
        atoms = [
            Atom("kw", (w,)) for w in parts[:-1] if len(w) >= MIN_WORD_LEN
        ]
        atoms.append(Atom("prefix", (parts[-1],)))
        return atoms
    words = _norm_word(stripped)
    if not words:
        return []
    if len(words) > 1:
        # blended query word like foo_bar → adjacency phrase of parts
        return [Atom("phrase", tuple(words))]
    return [Atom("kw", (words[0],))]


def _split_alts(body: str) -> list[str]:
    """Split a unit body on '|' outside quotes."""
    alts: list[str] = []
    cur: list[str] = []
    inq = False
    for ch in body:
        if ch == '"':
            inq = not inq
            cur.append(ch)
        elif ch == "|" and not inq:
            alts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    alts.append("".join(cur))
    return [a.strip() for a in alts if a.strip()]


def _quoted_atom(inner: str) -> Atom | None:
    """Atom for a quoted alternative.  A quoted single blended token
    ('"__some_cat__"') matches the blended *whole* form — the exact-match
    semantics the reference's category filter relies on
    (SphinxSearchEngine_class.php:348-359 manglers + :98-102 filter)."""
    from sphinxsearchengine_spark.text import charset
    from sphinxsearchengine_spark.text.tokenizer import tokenize

    inner = inner.strip()
    if not inner:
        return None
    if " " not in inner:
        folded = charset.fold(inner)
        for _pos, forms in tokenize(inner):
            for f in forms:
                if f == folded and charset.HAS_BLEND_RE.search(f):
                    return Atom("kw", (f,))
    words: list[str] = []
    for w in inner.split():
        words.extend(_norm_word(w.strip("=*")))
    if len(words) >= 2:
        return Atom("phrase", tuple(words))
    if words:
        return Atom("kw", (words[0],))
    return None


def _parse_unit(body: str, fld: int) -> list[Group]:
    """One AND unit (may contain | alternations, incl. quoted phrase
    alternatives) -> Group(s)."""
    raw_alts = _split_alts(body)
    alts: list[Atom] = []
    chain_groups: list[Group] = []
    for alt in raw_alts:
        if alt.startswith('"') and alt.endswith('"') and len(alt) >= 2:
            atom = _quoted_atom(alt[1:-1])
            if atom is not None:
                alts.append(atom)
            continue
        atoms = _atom_from_text(alt)
        if not atoms:
            continue
        if len(atoms) == 1:
            alts.append(atoms[0])
        elif len(raw_alts) == 1:
            # marker-split AND-chain (e.g. 'foo_ba*' -> foo AND ba*):
            # valid alone; emit as separate AND groups
            chain_groups.extend(Group([a], fld) for a in atoms)
        else:
            # AND-chain inside an OR alternation: flatten to OR
            # alternatives (documented approximation — Sphinx would nest
            # AND inside OR, which our group model can't express)
            alts.extend(atoms)
    groups: list[Group] = []
    if alts:
        groups.append(Group(alts, fld))
    groups.extend(chain_groups)
    return groups


def with_categories(query: Query | str, categories: list[str]) -> Query:
    """Append the reference's category filter: selected categories become
    one extra AND group '@category_search "__a__"|"__b__"' of mangled
    exact-match tokens (SphinxSearchEngine_class.php:98-102, mangling
    :348-359).  Returns a new Query; the input is not mutated."""
    from sphinxsearchengine_spark.text.tokenizer import mangle_category

    q = parse_query(query) if isinstance(query, str) else query
    if q.blank or not categories:
        return q
    alts = []
    for c in categories:
        atom = _quoted_atom(mangle_category(c))
        if atom is not None:
            alts.append(atom)
    if not alts:
        return q
    return Query(
        groups=list(q.groups) + [Group(alts, FIELDS["category_search"])],
        blank=q.blank,
        raw=q.raw,
    )


def parse_query(raw: str) -> Query:
    """Sanitize (T8) + parse into AND-of-OR groups."""
    if is_blank_query(raw):
        return Query(blank=True, raw=raw)
    s = sanitize_query(raw)
    if not s or is_blank_query(s):
        return Query(blank=True, raw=raw)
    q = Query(raw=raw)
    for m in _UNIT_RE.finditer(s):
        fld = FIELDS.get(m.group("fld"), -1) if m.group("fld") else -1
        q.groups.extend(_parse_unit(m.group("body"), fld))
    if not q.groups:
        q.blank = True
    return q
