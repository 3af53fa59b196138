"""npsort.int_order — packed-key argsort equivalence with np.lexsort."""

import numpy as np

from sphinxsearchengine_spark.npsort import int_order


def test_unique_keys_match_lexsort_exactly():
    rng = np.random.default_rng(7)
    n = 50_000
    # construct unique (a, b, c) triples: c strictly increasing within
    # each (a, b) by adding arange offsets
    a = rng.integers(0, 500, n)
    b = rng.integers(0, 300, n)
    c = np.arange(n)  # globally unique => triples unique
    got = int_order(c, b, a)
    want = np.lexsort((c, b, a))
    assert np.array_equal(got, want)


def test_tied_keys_same_ordering_of_key_tuples():
    rng = np.random.default_rng(8)
    n = 20_000
    a = rng.integers(0, 50, n)
    b = rng.integers(0, 40, n)
    o = int_order(b, a)
    # the sorted key SEQUENCE must match lexsort's even if tie rows
    # permute within a run
    ol = np.lexsort((b, a))
    assert np.array_equal(a[o], a[ol])
    assert np.array_equal(b[o], b[ol])


def test_fallback_wide_keys():
    # 40 + 40 bits > 64 -> np.lexsort fallback, still correct
    a = np.array([1 << 39, 5, 1 << 39, 0], dtype=np.int64)
    b = np.array([1 << 39, 7, 2, 9], dtype=np.int64)
    got = int_order(b, a)
    assert np.array_equal(got, np.lexsort((b, a)))


def test_fallback_negative_keys():
    a = np.array([3, -1, 2], dtype=np.int64)
    b = np.array([0, 0, 0], dtype=np.int64)
    got = int_order(b, a)
    assert np.array_equal(got, np.lexsort((b, a)))


def test_empty():
    assert int_order(np.empty(0, np.int64)).size == 0


def test_mixed_dtypes():
    a = np.array([2, 0, 1], dtype=np.uint8)
    b = np.array([9, 9, 9], dtype=np.int32)
    got = int_order(b, a)
    assert np.array_equal(got, np.lexsort((b, a)))
