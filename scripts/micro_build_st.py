#!/usr/bin/env python
"""Single-thread microbenchmark of the full map-side build path per
20k-doc batch: derive_documents-equivalent columns -> postings columns
-> pack_batch.  Measurement-only (guide §1).

Usage: python scripts/micro_build_st.py [N_DOCS]
"""
from __future__ import annotations

import hashlib
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    from sphinxsearchengine_spark.corpus import _gen_rows_fast

    t0 = time.time()
    rows = _gen_rows_fast(np.arange(n, dtype=np.int64))
    t_gen = time.time() - t0
    pdf = pd.DataFrame(
        rows, columns=["repo", "path", "commit", "lang", "content"]
    )
    # derive_documents-equivalent attrs (values don't matter for timing)
    pdf["docid"] = np.arange(n, dtype=np.int64)
    pdf["date_insert"] = np.int64(1_600_000_000)
    pdf["date_modify"] = np.int64(1_600_000_000)
    pdf["category_search"] = "__cat_c" + (
        pd.Series(np.arange(n) % 7).astype(str)
    )

    from sphinxsearchengine_spark.index import builder

    t0 = time.time()
    cols = builder._batch_postings_columns(pdf)
    t_cols = time.time() - t0

    from sphinxsearchengine_spark.index import packed

    t0 = time.time()
    out = packed.pack_batch(cols, nb=32, salt_factor=4)
    t_pack = time.time() - t0
    print(
        f"docs={n} postings={len(cols['term'])} | gen={t_gen:.2f} "
        f"postings_cols={t_cols:.2f} pack={t_pack:.2f}"
    )

    # inner split of _field_postings on the content field alone
    texts = pdf["content"].tolist()
    docids = pdf["docid"].to_numpy(dtype=np.int64)
    langs = pdf["lang"].to_numpy(dtype=object)
    dis = pdf["date_insert"].to_numpy(dtype=np.int64)
    dms = pdf["date_modify"].to_numpy(dtype=np.int64)
    t0 = time.time()
    builder._field_postings(texts, docids, langs, dis, dms, 0)
    print(f"content-field _field_postings alone: {time.time() - t0:.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
