"""Snippets (Q16), suggest (Q17), facets (Q13) feature tests."""

from __future__ import annotations

import pytest

from sphinxsearchengine_spark.config import EngineConfig
from sphinxsearchengine_spark.corpus import (
    PINNED_NOW,
    derive_documents,
    generate_corpus,
)
from sphinxsearchengine_spark.index.builder import build_index
from sphinxsearchengine_spark.query.executor import live_docs, search
from sphinxsearchengine_spark.query.facets import category_facet
from sphinxsearchengine_spark.query.parser import parse_query
from sphinxsearchengine_spark.query.snippets import (
    DEFAULTS,
    build_excerpt,
    _query_matchers,
    with_snippets,
)
from sphinxsearchengine_spark.query.suggest import did_you_mean, suggest_term


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("feat") / "idx")
    docs = derive_documents(generate_corpus(spark, 150, partitions=4))
    build_index(spark, docs, d, EngineConfig(term_buckets=8), salt_factor=2)
    return d


class TestSnippets:
    def test_build_excerpt_basic(self):
        q = parse_query("engine")
        st, ex, pf = _query_matchers(q)
        text = " ".join(["word"] * 40) + " the ENGINE runs " + " ".join(["pad"] * 40)
        out = build_excerpt(text, st, ex, pf, DEFAULTS)
        assert "<b>ENGINE</b>" in out
        assert len(out) <= DEFAULTS["limit"] + 20
        assert out.count("word") <= 16  # windowed, not the whole doc

    def test_stemmed_match_highlighted(self):
        q = parse_query("running")
        st, ex, pf = _query_matchers(q)
        out = build_excerpt("they were RUNS and runners", st, ex, pf, DEFAULTS)
        assert "<b>RUNS</b>" in out  # stem('runs')==stem('running')? run/run

    def test_no_match_returns_head(self):
        q = parse_query("zzz")
        st, ex, pf = _query_matchers(q)
        out = build_excerpt("alpha beta gamma", st, ex, pf, DEFAULTS)
        assert out.startswith("alpha")

    def test_html_escaped(self):
        """SphinxSearchEngine_class.php:252-266 — text is html-escaped,
        match markers are not (placeholder-trick equivalence)."""
        q = parse_query("spark")
        st, ex, pf = _query_matchers(q)
        text = 'safe <script>alert("x")</script> & spark <b>bold</b> end'
        out = build_excerpt(text, st, ex, pf, DEFAULTS)
        assert "<script>" not in out and "&lt;script&gt;" in out
        assert "&amp;" in out
        assert "<b>spark</b>" in out          # our marker survives
        assert "&lt;b&gt;bold&lt;/b&gt;" in out  # doc's own markup escaped

    def test_html_escape_off(self):
        q = parse_query("spark")
        st, ex, pf = _query_matchers(q)
        opts = {**DEFAULTS, "html_escape": False}
        out = build_excerpt("a & b spark", st, ex, pf, opts)
        assert "a & b <b>spark</b>" in out

    def test_with_snippets_df(self, spark, idx):
        res = search(spark, idx, "hotterm", limit=3, now_ts=PINNED_NOW)
        docs = live_docs(spark, idx).select("docid", "content")
        hyd = res.join(docs, "docid")
        out = with_snippets(hyd, "hotterm").select("docid", "snippet").collect()
        assert out and all("<b>hotterm</b>" in r.snippet for r in out)


class TestMatchOnly:
    def test_same_membership_as_scored(self, spark, idx):
        """Facet fast path (match_only) must keep the exact match set —
        AND and phrase semantics intact, scoring skipped."""
        from sphinxsearchengine_spark.query.executor import score_matches

        for q in ["index search", '"alpha beta"', "hotterm"]:
            full = {r.docid for r in
                    score_matches(spark, idx, q, now_ts=PINNED_NOW).collect()}
            memb = score_matches(
                spark, idx, q, now_ts=PINNED_NOW, match_only=True
            ).collect()
            assert {r.docid for r in memb} == full, q
            assert all(r.weight_raw == 0.0 for r in memb)


class TestSuggest:
    def test_suggest_typo(self, spark, idx):
        # 'hotterm' is frequent; a 1-edit typo should suggest it back
        assert suggest_term(spark, idx, "hottern") == "hotterm"

    def test_suggest_known_word_none(self, spark, idx):
        assert suggest_term(spark, idx, "hotterm") is None

    def test_did_you_mean(self, spark, idx):
        out = did_you_mean(spark, idx, "hottern index")
        assert out == "hotterm index"

    def test_did_you_mean_all_known(self, spark, idx):
        assert did_you_mean(spark, idx, "hotterm index") is None

    def test_multi_typo_batched_one_job(self, spark, idx):
        # three typos must cost exactly the same number of Spark jobs as
        # one typo (the round-2 path ran one job PER keyword — N+1);
        # absolute counts are AQE-stage-dependent, the ratio is not
        sc = spark.sparkContext

        def njobs(group, q):
            sc.setJobGroup(group, "suggest job-count probe")
            try:
                out = did_you_mean(spark, idx, q)
            finally:
                sc.setJobGroup(None, None)
            assert out is not None
            return len(sc.statusTracker().getJobIdsForGroup(group))

        one = njobs("dym_one", "hottern index")
        three = njobs("dym_three", "hottern parsr mergee")
        assert three <= one, f"3-typo query cost {three} jobs vs {one} for 1 typo"

    def test_searcher_suggest_zero_jobs(self, spark, idx):
        # pinned dictionary: the whole did-you-mean path runs driver-side
        from sphinxsearchengine_spark.engine import Searcher

        s = Searcher(spark, idx)
        sc = spark.sparkContext
        sc.setJobGroup("dym_pinned", "suggest job-count probe")
        try:
            out = s.suggest("hottern parsr")
        finally:
            sc.setJobGroup(None, None)
        assert out is not None and out.split()[0] == "hotterm"
        assert len(sc.statusTracker().getJobIdsForGroup("dym_pinned")) == 0


class TestPersonalDict:
    """Q18 — personal dictionary CRUD + suggest integration
    (SphinxSearch_PersonalDict.php:87-194, SphinxSearch_spell.php:51-99)."""

    def test_crud(self, tmp_path):
        from sphinxsearchengine_spark.query import personal_dict as pd_

        d = str(tmp_path)
        assert pd_.words(d, "u") == []
        assert pd_.add_word(d, "u", "Frobnicate") is True
        assert pd_.add_word(d, "u", "frobnicate") is False  # case-folded dup
        assert pd_.add_word(d, "u", "zzyzx") is True
        assert pd_.words(d, "u") == ["frobnicate", "zzyzx"]
        assert pd_.remove_word(d, "u", "zzyzx") is True
        assert pd_.remove_word(d, "u", "zzyzx") is False
        assert pd_.words(d, "u") == ["frobnicate"]

    def test_personal_word_not_flagged(self, spark, idx):
        from sphinxsearchengine_spark.query import personal_dict as pd_

        # 'qqfrobz' is unknown to the index: without a personal dict the
        # suggester rewrites or leaves it; with it, the word is known
        pd_.add_word(idx, "alice", "qqfrobz")
        out = did_you_mean(spark, idx, "hotterm qqfrobz", user="alice")
        assert out is None  # everything known → no suggestion offered

    def test_personal_word_suggested_first(self, spark, idx):
        from sphinxsearchengine_spark.query import personal_dict as pd_

        pd_.add_word(idx, "bob", "hotterq")  # 1 edit from the typo below
        out = did_you_mean(spark, idx, "hotterx", user="bob")
        # both 'hotterm' (index, huge df) and 'hotterq' (personal) are
        # distance 1; the personal word wins the tie-break
        assert out == "hotterq"
        assert did_you_mean(spark, idx, "hotterx") == "hotterm"


class TestFacets:
    def test_category_facet(self, spark, idx):
        rows = category_facet(spark, idx, "hotterm", now_ts=PINNED_NOW).collect()
        cats = [r.category for r in rows]
        assert cats == sorted(cats)
        # categories are [repo, lang]; langs present as facet values
        assert any(c in ("python", "go", "rust", "php", "java") for c in cats)
        total_lang_docs = sum(
            r.n_docs for r in rows if r.category in ("python", "go", "rust", "php", "java")
        )
        from sphinxsearchengine_spark.query.executor import score_matches

        n_matched = score_matches(spark, idx, "hotterm", now_ts=PINNED_NOW).count()
        assert total_lang_docs == n_matched
