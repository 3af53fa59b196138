"""Property-based rank-identity: random queries drawn from the corpus
vocabulary + operator grammar must rank identically in the distributed
engine and the pure-Python oracle (north-rule criterion, adversarial
coverage beyond the hand-picked query set)."""

from __future__ import annotations

import math
import random

import pytest

from sphinxsearchengine_spark.config import EngineConfig
from sphinxsearchengine_spark.corpus import (
    EN_WORDS,
    RU_WORDS,
    PINNED_NOW,
    derive_documents,
    generate_corpus,
)
from sphinxsearchengine_spark.index.builder import build_index
from sphinxsearchengine_spark.oracle import OracleEngine
from sphinxsearchengine_spark.query.executor import search

N_DOCS = 150
N_QUERIES = 25


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("prop") / "idx")
    docs = derive_documents(generate_corpus(spark, N_DOCS, partitions=4))
    build_index(spark, docs, idx, EngineConfig(term_buckets=8), salt_factor=2)
    return idx, OracleEngine(docs.toPandas())


def _random_queries(seed: int = 7) -> list[dict]:
    rng = random.Random(seed)
    vocab = EN_WORDS + RU_WORDS + ["hotterm", "alpha", "beta", "get_index", "nope_zz"]
    out = []
    for _ in range(N_QUERIES):
        n = rng.randint(1, 3)
        parts = []
        for _ in range(n):
            w = rng.choice(vocab)
            roll = rng.random()
            if roll < 0.12:
                parts.append(f"={w}")
            elif roll < 0.24:
                parts.append(w[: max(2, len(w) - 2)] + "*")
            elif roll < 0.34:
                parts.append(f"{w}|{rng.choice(vocab)}")
            elif roll < 0.44 and n == 1:
                parts.append(f'"{w} {rng.choice(vocab)}"')
            else:
                parts.append(w)
        kw: dict = {"query": " ".join(parts)}
        if rng.random() < 0.25:
            kw["langs"] = rng.sample(["python", "php", "rust", "go", "java"], 2)
        if rng.random() < 0.2:
            kw["order_by"] = rng.choice(["date_insert", "date_modify"])
            kw["sort"] = rng.choice(["asc", "desc"])
        if rng.random() < 0.2:
            kw["offset"] = rng.randint(1, 5)
        out.append(kw)
    return out


@pytest.mark.parametrize("q", _random_queries(), ids=[str(d) for d in _random_queries()])
def test_random_query_rank_identity(spark, env, q):
    idx, oracle = env
    kw = dict(q)
    query = kw.pop("query")
    kw.setdefault("limit", 15)
    kw.setdefault("now_ts", PINNED_NOW)
    got = search(spark, idx, query, **kw).collect()
    want = oracle.search(query, **kw)
    assert [r.docid for r in got] == [w["docid"] for w in want], query
    for r, w in zip(got, want):
        assert math.isclose(r.score, w["score"], rel_tol=1e-9, abs_tol=1e-12), (
            query, r.docid, r.score, w["score"])
