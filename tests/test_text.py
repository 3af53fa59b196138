"""Tokenizer contract tests (SURVEY.md §5.1): golden token streams for
charset folding, Cyrillic, blend chars, min-len, exact+stem duals."""

from __future__ import annotations

from hypothesis import given, strategies as st

from sphinxsearchengine_spark.text import (
    index_terms,
    mangle_category,
    sanitize_query,
    stem_token,
    tokenize,
)
from sphinxsearchengine_spark.text.stem_en import stem_en
from sphinxsearchengine_spark.text.stem_ru import stem_ru
from sphinxsearchengine_spark.text.tokenizer import is_blank_query


def flat(text):
    return [(p, f) for p, forms in tokenize(text) for f in forms]


class TestCharsetFold:
    def test_ascii_fold_and_split(self):
        assert flat("Hello, WORLD!") == [(1, "hello"), (2, "world")]

    def test_digits_are_token_chars(self):
        assert flat("utf8 v2") == [(1, "utf8"), (2, "v2")]

    def test_cyrillic_fold(self):
        # U+0410..U+042F folds to U+0430..U+044F (sphinx.conf:15)
        assert flat("Привет МИР") == [(1, "привет"), (2, "мир")]

    def test_yo_is_separator(self):
        # ё/Ё absent from charset_table → separator
        assert flat("ёлка") == [(1, "лка")]

    def test_min_word_len(self):
        # 1-char tokens dropped (sphinx.conf:18)
        assert flat("a bc d ef") == [(2, "bc"), (4, "ef")]

    def test_nfc_normalization(self):
        # T7: NFC and NFD spellings of the same word must produce
        # identical token streams (SphinxSearchUpdate.php:56 applies
        # MediaWiki normalizeForSearch before indexing)
        composed = "caf\u00e9 r\u00e9sum\u00e9"
        decomposed = "cafe\u0301 re\u0301sume\u0301"
        assert flat(composed) == flat(decomposed)
        from sphinxsearchengine_spark.text.tokenizer import index_terms

        assert index_terms(composed) == index_terms(decomposed)


class TestBlendChars:
    def test_underscore_blend(self):
        # foo_bar → parts at consecutive positions + blended at first
        assert flat("foo_bar baz") == [
            (1, "foo"),
            (1, "foo_bar"),
            (2, "bar"),
            (3, "baz"),
        ]

    def test_phrase_across_blend(self):
        # parts get consecutive positions so "foo bar" phrase matches
        positions = {f: p for p, f in flat("foo_bar")}
        assert positions["bar"] == positions["foo"] + 1

    def test_all_blend_chars(self):
        for ch in "_-&+@$":
            forms = [f for _, f in flat(f"aa{ch}bb")]
            assert f"aa{ch}bb" in forms and "aa" in forms and "bb" in forms

    def test_pure_blend_run_is_separator(self):
        assert flat("aa -- bb") == [(1, "aa"), (2, "bb")]

    def test_short_parts_blended_survives(self):
        # parts 'a','b' are sub-min-len; blended a_b survives
        assert flat("a_b") == [(1, "a_b")]

    def test_dollar_var(self):
        assert flat("$var") == [(1, "var"), (1, "$var")]


class TestStemming:
    def test_porter_basics(self):
        assert stem_en("caresses") == "caress"
        assert stem_en("ponies") == "poni"
        assert stem_en("running") == "run"
        assert stem_en("relational") == "relat"
        assert stem_en("hopefulness") == "hope"
        assert stem_en("generalization") == "gener"

    def test_russian_basics(self):
        assert stem_ru("книгами") == "книг"
        assert stem_ru("красивые") == "красив"
        assert stem_ru("делала") == "дела"

    def test_mixed_not_stemmed(self):
        assert stem_token("utf8") == "utf8"
        assert stem_token("foo_bar") == "foo_bar"

    def test_stem_dispatch(self):
        assert stem_token("running") == "run"
        assert stem_token("книгами") == "книг"

    @given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=20))
    def test_porter_total(self, w):
        s = stem_en(w)
        assert isinstance(s, str) and len(s) <= len(w)

    @given(st.text(alphabet="абвгдежзиклмнопрстуфхцчшщыьэюя", min_size=1, max_size=20))
    def test_russian_total(self, w):
        s = stem_ru(w)
        assert isinstance(s, str) and len(s) <= len(w)


class TestExactDual:
    def test_exact_and_stem_emitted(self):
        terms = index_terms("running")
        assert (1, "run") in terms and (1, "=running") in terms

    def test_dedup_same_position(self):
        terms = index_terms("run")
        # stem('run')=='run' and '=run' → exactly these two
        assert terms == [(1, "run"), (1, "=run")]


class TestMangleAndSanitize:
    def test_mangle_basic(self):
        assert mangle_category("My Category") == "__my_category__"

    def test_mangle_empty(self):
        assert mangle_category("") == "_empty_"
        assert mangle_category("  ") == "_empty_"

    def test_mangle_specials(self):
        assert mangle_category("C++ (lang)") == "__c_lang___"
        assert mangle_category("a/b") == "__a_b__"

    def test_sanitize_strips_specials(self):
        assert sanitize_query("foo! (bar) [baz]") == "foo bar baz"

    def test_sanitize_unbalanced_quotes(self):
        assert '"' not in sanitize_query('foo "bar')
        assert sanitize_query('"foo bar"') == '"foo bar"'

    def test_sanitize_lone_dash(self):
        assert sanitize_query("foo - bar") == "foo bar"
        assert sanitize_query("foo-bar") == "foo-bar"

    def test_blank_guard(self):
        assert is_blank_query("!!! ())")
        assert not is_blank_query("ok")
        assert not is_blank_query("привет")

    def test_mangle_col_parity(self, spark):
        """The native-column mangle twin used by the bulk build
        (corpus.derive_documents) must agree with the Python function on
        Latin/Cyrillic/digit/punct/whitespace inputs (NFC)."""
        from pyspark.sql import functions as F

        from sphinxsearchengine_spark.text.tokenizer import (
            mangle_category,
            mangle_category_col,
        )

        cases = [
            "My Category", "", "  ", "C++ (lang)", "a/b", "python",
            "org3/repo17", "Русский Язык", "ПОИСК-2024", "x", "_",
            "a  b\tc", " edge ", "MiXeD_КиРиЛл", "123", "!!!", "a|b&c",
            # Unicode whitespace: Python str.strip() is Unicode-aware,
            # so the native trim must be too ((?U) flag — round-5 review)
            "My Category ", " ", " pad ",
        ]
        df = spark.createDataFrame([(c,) for c in cases], "cat string")
        got = [
            r.m for r in df.select(
                mangle_category_col(F.col("cat")).alias("m")
            ).collect()
        ]
        assert got == [mangle_category(c) for c in cases]


class TestShortPrefixParse:
    """A prefix stub shorter than min_word_len must still parse: the
    expansion only ever yields full-length dict terms, so 'b*' is a
    legitimate star query (enable_star, SphinxSearchEngine.php:32)."""

    def test_single_char_prefix(self):
        from sphinxsearchengine_spark.query.parser import parse_query

        q = parse_query("b*")
        assert not q.blank
        assert len(q.groups) == 1
        assert q.groups[0].alts[0].kind == "prefix"
        assert q.groups[0].alts[0].words == ("b",)

    def test_blended_short_prefix_tail(self):
        from sphinxsearchengine_spark.query.parser import parse_query

        # 'foo_b*' → kw foo AND prefix b; the sub-min-len tail survives
        # as a prefix while a sub-min-len kw part would be dropped
        q = parse_query("foo_b*")
        kinds = [(g.alts[0].kind, g.alts[0].words) for g in q.groups]
        assert ("kw", ("foo",)) in kinds
        assert ("prefix", ("b",)) in kinds

    def test_conflicting_markers_exact_wins(self):
        """'=word*' carries both markers; '=' (the stronger, more
        specific request) wins — the pre-round-4 precedence, restored
        per ADVICE r4."""
        from sphinxsearchengine_spark.query.parser import parse_query

        q = parse_query("=word*")
        assert len(q.groups) == 1
        assert q.groups[0].alts[0].kind == "exact"
        assert q.groups[0].alts[0].words == ("word",)
        # plain markers still parse as themselves
        assert parse_query("=word").groups[0].alts[0].kind == "exact"
        assert parse_query("word*").groups[0].alts[0].kind == "prefix"
