"""Equality oracle for the r6 vectorized corpus generator.

The bench index_build cell regenerates the corpus inside the timed
region, so the generator was rewritten from ~210 scalar
RandomState.randint calls per doc to a batch-vectorized MT19937 +
masked-rejection draw machine (corpus.py).  The workload MUST stay
byte-identical — these tests pin the fast path to the kept
reference-semantics twin (`_gen_batch_ref` / `_doc_content_ref`) and
the underlying stream model to numpy itself.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from sphinxsearchengine_spark import corpus as C


def _run(gen, ids):
    return list(gen(iter([pd.DataFrame({"id": np.asarray(ids)})])))[0]


def test_raw_stream_matches_randomstate():
    # the vectorized MT19937 must reproduce RandomState's raw words
    # (init, twist chain, temper) bit-for-bit
    seeds = np.array([42, 43, 100042, 999999, 2**31 + 7], dtype=np.uint32)
    mt = C._mt_init(seeds)
    t1 = C._mt_twist(mt)
    t2 = C._mt_twist(t1)
    mine = np.concatenate([C._mt_temper(t1), C._mt_temper(t2)], axis=1)
    for j, s in enumerate(seeds):
        ref = np.random.RandomState(int(s)).randint(
            0, 1 << 32, size=2 * 624, dtype=np.uint32
        )
        assert np.array_equal(mine[j], ref), f"seed {s}"


def test_bounded_draw_consumption_model():
    # scalar randint(0, k) == one masked 32-bit word per rejection
    # attempt, for every bound the generator uses (incl. insert bounds)
    bounds = [160, 100, 48, 30, 6, 8, 7, 4, 9999, 256, 2, 41, 199]
    for seed in (42, 7, 123456):
        ref = np.random.RandomState(seed)
        want = [int(ref.randint(0, b)) for b in bounds]
        d = C._VecDraws(np.asarray([seed - C.SEED], dtype=np.int64))
        got = [d.draw1(0, b) for b in bounds]
        assert got == want, f"seed {seed}"


def test_batch_equality_including_planted_terms():
    # doc 0 carries needleuniq; equality must hold through the insert
    # draws and across non-contiguous id ranges
    ids = np.concatenate(
        [np.arange(0, 1500), np.arange(499_000, 500_000), [777_777]]
    )
    ref = _run(C._gen_batch_ref, ids)
    fast = _run(C._gen_batch, ids)
    pd.testing.assert_frame_equal(ref, fast)


def test_batch_equality_small_and_single():
    for ids in ([0], [1], [17, 18], list(range(63, 66))):
        ref = _run(C._gen_batch_ref, ids)
        fast = _run(C._gen_batch, ids)
        pd.testing.assert_frame_equal(ref, fast)
