"""Varbyte/delta codec round-trip, property-based (SURVEY.md §5.1)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, strategies as st

from sphinxsearchengine_spark import codec


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=200))
def test_vb_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(codec.vb_decode(codec.vb_encode(arr)), arr)


@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=0, max_size=200))
def test_delta_roundtrip(vals):
    arr = np.sort(np.array(vals, dtype=np.uint64))
    assert np.array_equal(codec.delta_decode(codec.delta_encode(arr)), arr)


@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=0, max_size=50))
def test_small_matches_numpy(vals):
    vals = sorted(vals)
    arr = np.array(vals, dtype=np.uint64)
    assert codec.delta_encode_small(vals) == codec.delta_encode(arr)
    assert codec.delta_decode_small(codec.delta_encode_small(vals)) == vals


def test_empty():
    assert codec.vb_encode(np.array([], dtype=np.uint64)) == b""
    assert codec.delta_decode(b"").size == 0


def test_compactness():
    # positions < 128 after delta → 1 byte each
    arr = np.arange(1, 101, dtype=np.uint64)
    assert len(codec.delta_encode(arr)) == 100
