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


_UNIT_RE = re.compile(
    r'@(?P<fld>\w+)\s+"(?P<fphrase>[^"]*)"'   # @field "phrase"
    r'|@(?P<fld2>\w+)\s+(?P<fterm>\S+)'        # @field term
    r'|"(?P<phrase>[^"]*)"'                    # "phrase"
    r"|(?P<plain>\S+)"
)


def _norm_word(w: str) -> list[str]:
    """Fold one query word through the index tokenizer; a blended token
    yields its split parts (consecutive positions) like the index side."""
    return [forms[0] for _, forms in tokenize(w)]


def _atom_from_text(text: str) -> list[Atom]:
    """One query word -> atom(s), honoring =exact / prefix* markers."""
    exact = text.startswith("=")
    prefix = text.endswith("*")
    stripped = text.strip("=*")
    words = _norm_word(stripped)
    if not words:
        return []
    if exact:
        return [Atom("exact", (w,)) for w in words]
    if prefix:
        # only the last part keeps prefix semantics: "foo_ba*" → foo AND ba*
        atoms = [Atom("kw", (w,)) for w in words[:-1]]
        atoms.append(Atom("prefix", (words[-1],)))
        return atoms
    if len(words) > 1:
        # blended query word like foo_bar → adjacency phrase of parts
        return [Atom("phrase", tuple(words))]
    return [Atom("kw", (words[0],))]


def _parse_unit(unit: str, fld: int) -> list[Group]:
    """One AND unit (may contain | alternations) -> Group(s)."""
    groups: list[Group] = []
    alt_sets: list[list[Atom]] = [[]]
    for alt in unit.split("|"):
        alt = alt.strip()
        if not alt:
            continue
        atoms = _atom_from_text(alt)
        if not atoms:
            continue
        if len(atoms) == 1:
            alt_sets[0].append(atoms[0])
        else:
            # multi-atom alternative (blended/prefix splits): AND-chain —
            # only valid alone; emit as separate groups
            groups.extend(Group([a], fld) for a in atoms)
    if alt_sets[0]:
        groups.insert(0, Group(alt_sets[0], fld))
    return groups


def parse_query(raw: str) -> Query:
    """Sanitize (T8) + parse into AND-of-OR groups."""
    if is_blank_query(raw):
        return Query(blank=True, raw=raw)
    s = sanitize_query(raw)
    if not s or is_blank_query(s):
        return Query(blank=True, raw=raw)
    q = Query(raw=raw)
    for m in _UNIT_RE.finditer(s):
        if m.group("fphrase") is not None or m.group("phrase") is not None:
            txt = m.group("fphrase") if m.group("fphrase") is not None else m.group("phrase")
            fld = FIELDS.get(m.group("fld"), -1) if m.group("fld") else -1
            words: list[str] = []
            for w in txt.split():
                words.extend(_norm_word(w.strip("=*")))
            if len(words) >= 2:
                q.groups.append(Group([Atom("phrase", tuple(words))], fld))
            elif words:
                q.groups.append(Group([Atom("kw", (words[0],))], fld))
        elif m.group("fterm") is not None:
            fld = FIELDS.get(m.group("fld2"), -1)
            for g in _parse_unit(m.group("fterm"), fld):
                q.groups.append(g)
        else:
            for g in _parse_unit(m.group("plain"), -1):
                q.groups.append(g)
    if not q.groups:
        q.blank = True
    return q
