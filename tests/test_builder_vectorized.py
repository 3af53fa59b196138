"""Vectorized build tokenizer must emit the EXACT row set of the
reference-semantics twin (VERDICT r1 #3: bit-identical postings)."""

from __future__ import annotations

import pandas as pd
import pytest

from sphinxsearchengine_spark.index.builder import (
    _tokenize_batch,
    _tokenize_batch_ref,
)


def _canon(frames: list[pd.DataFrame]) -> pd.DataFrame:
    df = pd.concat(frames, ignore_index=True)
    df["pos_hex"] = df["pos_vb"].map(bytes.hex)
    df = df.drop(columns=["pos_vb"])
    return (
        df.sort_values(["docid", "field", "term"])
        .reset_index(drop=True)
    )


def _doc_batch(rows) -> pd.DataFrame:
    return pd.DataFrame(
        rows,
        columns=[
            "docid", "path", "lang", "content", "category_search",
            "date_insert", "date_modify",
        ],
    )


def test_vectorized_equals_reference_on_corpus(spark):
    from sphinxsearchengine_spark.corpus import derive_documents, generate_corpus

    docs = derive_documents(generate_corpus(spark, 250, partitions=2)).select(
        "docid", "path", "lang", "content", "category_search",
        "date_insert", "date_modify",
    )
    pdf = docs.toPandas()
    got = _canon(list(_tokenize_batch(iter([pdf]))))
    want = _canon(list(_tokenize_batch_ref(iter([pdf]))))
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.parametrize(
    "text",
    [
        "",                                  # empty field
        "x y z",                             # all sub-min-length
        "foo_bar baz -dash- a_b_c __cat__",  # blends incl. edge blends
        "Running Searches ПОИСК Запросы",    # stems + Cyrillic fold
        "foo_ba foo_ba foo-ba $x @y",        # repeats + short blends
        "a1-b2&c3+d4@e5$f6_g7",              # every blend char
        "café café résumé",  # T7: NFC + NFD spellings
    ],
)
def test_vectorized_equals_reference_edge_cases(text):
    rows = [
        (1, "src/p.py", "python", text, "__cat__ __python__", 100, 200),
        (2, "", "go", "plain words only here", "", 300, 400),
    ]
    pdf = _doc_batch(rows)
    got = _canon(list(_tokenize_batch(iter([pdf]))))
    want = _canon(list(_tokenize_batch_ref(iter([pdf]))))
    pd.testing.assert_frame_equal(got, want)


def test_vectorized_empty_batch():
    pdf = _doc_batch([])
    out = pd.concat(list(_tokenize_batch(iter([pdf]))), ignore_index=True)
    assert len(out) == 0
