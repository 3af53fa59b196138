"""Searcher facade: cached dictionary/docs must not change results."""

from __future__ import annotations

import math
import time

import pytest

from sphinxsearchengine_spark.config import EngineConfig
from sphinxsearchengine_spark.corpus import (
    PINNED_NOW,
    derive_documents,
    generate_corpus,
)
from sphinxsearchengine_spark.engine import Searcher
from sphinxsearchengine_spark.index.builder import build_index
from sphinxsearchengine_spark.query.executor import search


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("srch") / "idx")
    docs = derive_documents(generate_corpus(spark, 200, partitions=4))
    build_index(spark, docs, d, EngineConfig(term_buckets=8), salt_factor=2)
    return d


def test_searcher_matches_plain_search(spark, idx):
    s = Searcher(spark, idx, cache_docs=True)
    assert s._dict_pdf is not None  # small index → dict pinned in driver RAM
    for q in ["hotterm", "index search", '"alpha beta"', "pars*", "=running"]:
        a = s.search(q, limit=10, now_ts=PINNED_NOW).collect()
        b = search(spark, idx, q, limit=10, now_ts=PINNED_NOW).collect()
        assert [r.docid for r in a] == [r.docid for r in b], q
        for x, y in zip(a, b):
            assert math.isclose(x.score, y.score, rel_tol=1e-12)


def test_searcher_meta(spark, idx):
    s = Searcher(spark, idx)
    res, meta = s.search_with_meta("hotterm", limit=5, now_ts=PINNED_NOW)
    assert meta["total"] >= len(res.collect())
    assert meta["keywords"][0]["docs"] > 0
