#!/usr/bin/env python
"""Single-thread microbenchmark of the tokenizer hot path components
(guide §1): generates a 20k-doc batch in-process with the SAME
generator the build uses, then times nfc / findall / factorize /
emission / numpy tail separately.  Measurement-only — not a bench cell.

Usage: python scripts/micro_tok.py [N_DOCS]
"""
from __future__ import annotations

import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from sphinxsearchengine_spark.corpus import _gen_rows_fast
from sphinxsearchengine_spark.text import charset


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    rows = _gen_rows_fast(np.arange(n, dtype=np.int64))
    texts = [r[4] for r in rows]  # content column
    print(f"docs={n} total_chars={sum(len(t) for t in texts)}")

    t0 = time.time()
    normed = [charset.nfc(t) if t else t for t in texts]
    t_nfc = time.time() - t0

    findall = charset.PRIMARY_TOKEN_UNFOLDED_RE.findall
    t0 = time.time()
    tok_lists = [findall(t) if t else [] for t in normed]
    t_findall = time.time() - t0
    n_occ = sum(len(x) for x in tok_lists)

    from itertools import chain

    t0 = time.time()
    prim = np.asarray(list(chain.from_iterable(tok_lists)), dtype=object)
    t_flat = time.time() - t0

    t0 = time.time()
    inv, uniq = pd.factorize(prim, sort=False)
    t_fact = time.time() - t0

    from sphinxsearchengine_spark.index.builder import _emission_table

    t0 = time.time()
    _emission_table(uniq)
    t_emit = time.time() - t0

    print(
        f"n_occ={n_occ} uniq={len(uniq)} | nfc={t_nfc:.2f} "
        f"findall={t_findall:.2f} flatten={t_flat:.2f} "
        f"factorize={t_fact:.2f} emission={t_emit:.2f}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
