"""Russian stemmer: the Snowball Russian algorithm.

Implements ``morphology = stem_enru``'s Russian half (sphinx.conf:17).
Written from the published Snowball specification
(https://snowballstem.org/algorithms/russian/stemmer.html) — public
knowledge; no stemmer package is available in this environment.

Operates on already case-folded Cyrillic [а-я] tokens; callers guard.
Note: the reference charset table (sphinx.conf:15) excludes ё, so inputs
never contain it (Snowball's "treat ё as е" rule is moot here).
"""

from __future__ import annotations

_VOWELS = "аеиоуыэюя"

_PERFECTIVE_1 = ("вшись", "вши", "в")          # require preceding а/я
_PERFECTIVE_2 = ("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")
_REFLEXIVE = ("ся", "сь")
_ADJECTIVE = (
    "ими", "ыми", "его", "ого", "ему", "ому", "ее", "ие", "ые", "ое",
    "ей", "ий", "ый", "ой", "ем", "им", "ым", "ом", "их", "ых",
    "ую", "юю", "ая", "яя", "ою", "ею",
)
_PARTICIPLE_1 = ("ющ", "ем", "нн", "вш", "щ")   # require preceding а/я
_PARTICIPLE_2 = ("ивш", "ывш", "ующ")
_VERB_1 = (                                      # require preceding а/я
    "ешь", "нно", "ете", "йте", "ла", "на", "ли", "ем", "ло", "но",
    "ет", "ют", "ны", "ть", "й", "л", "н",
)
_VERB_2 = (
    "ейте", "уйте", "ила", "ыла", "ена", "ите", "или", "ыли", "ило",
    "ыло", "ено", "ует", "уют", "ены", "ить", "ыть", "ишь",
    "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ят", "ит", "ыт", "ую", "ю",
)
_NOUN = (
    "иями", "ями", "ами", "ией", "иям", "ием", "иях",
    "ев", "ов", "ие", "ье", "еи", "ии", "ей", "ой", "ий", "ям", "ем",
    "ам", "ом", "ах", "ях", "ию", "ью", "ия", "ья",
    "а", "е", "и", "й", "о", "у", "ы", "ь", "ю", "я",
)
_SUPERLATIVE = ("ейше", "ейш")
_DERIVATIONAL = ("ость", "ост")


def _rv_r2(word: str) -> tuple[int, int]:
    """RV = after first vowel; R2 = after 2nd vowel-nonvowel boundary."""
    n = len(word)
    rv = n
    for i in range(n):
        if word[i] in _VOWELS:
            rv = i + 1
            break
    # R1: after first vowel followed by non-vowel
    r1 = n
    for i in range(n - 1):
        if word[i] in _VOWELS and word[i + 1] not in _VOWELS:
            r1 = i + 2
            break
    r2 = n
    for i in range(r1, n - 1):
        if word[i] in _VOWELS and word[i + 1] not in _VOWELS:
            r2 = i + 2
            break
    return rv, r2


def _ends(word: str, rv: int, suffixes: tuple[str, ...], need_ay: bool) -> str | None:
    """Longest suffix from the group lying wholly inside RV (with the
    а/я precondition char also inside RV for group-1 suffixes)."""
    for suf in sorted(suffixes, key=len, reverse=True):
        if not word.endswith(suf):
            continue
        cut = len(word) - len(suf)
        if need_ay:
            if cut == 0 or word[cut - 1] not in "ая":
                continue
            if cut - 1 < rv:
                continue
        elif cut < rv:
            continue
        return word[:cut]
    return None


def stem_ru(word: str) -> str:
    if len(word) <= 2:
        return word
    rv, r2 = _rv_r2(word)
    w = word

    # Step 1: perfective gerund, else [reflexive] adjectival|verb|noun
    g = _ends(w, rv, _PERFECTIVE_2, False)
    if g is None:
        g = _ends(w, rv, _PERFECTIVE_1, True)
    if g is not None:
        w = g
    else:
        r = _ends(w, rv, _REFLEXIVE, False)
        if r is not None:
            w = r
        a = _ends(w, rv, _ADJECTIVE, False)
        if a is not None:
            w = a
            p = _ends(w, rv, _PARTICIPLE_2, False)
            if p is None:
                p = _ends(w, rv, _PARTICIPLE_1, True)
            if p is not None:
                w = p
        else:
            v = _ends(w, rv, _VERB_2, False)
            if v is None:
                v = _ends(w, rv, _VERB_1, True)
            if v is not None:
                w = v
            else:
                n = _ends(w, rv, _NOUN, False)
                if n is not None:
                    w = n

    # Step 2: trailing и (in RV)
    if w.endswith("и") and len(w) - 1 >= rv:
        w = w[:-1]

    # Step 3: derivational (in R2)
    for suf in _DERIVATIONAL:
        if w.endswith(suf) and len(w) - len(suf) >= r2:
            w = w[: -len(suf)]
            break

    # Step 4
    if w.endswith("нн") and len(w) - 1 >= rv:
        w = w[:-1]
    else:
        s = _ends(w, rv, _SUPERLATIVE, False)
        if s is not None:
            w = s
            if w.endswith("нн") and len(w) - 1 >= rv:
                w = w[:-1]
    if w.endswith("ь") and len(w) - 1 >= rv:
        w = w[:-1]
    return w
