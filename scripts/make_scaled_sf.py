#!/usr/bin/env python
"""Generate a SCALED measurement dataset (default 10x sf0.1 ~ "sf1.0").

The driver's round-end bench may run at a driver-generated sf1.0 that we
do not have locally; this script fabricates a same-shape dataset purely
for optimization-round timing (bench_extra.py / bench.py dry runs).  It
is NEVER used for correctness gates — those stay on the read-only
driver-provided /root/testdata/sf{0.001,0.01,0.1}.

Construction (all deterministic, seed=4242):
- relational tables (customer/supplier/part/orders/lineitem/events):
  k shifted copies with consistent key offsets, preserving join
  fan-outs and value distributions; region/nation copied as-is.
- documents: regenerated word-soup in the fixture's style (same 31-word
  vocabulary, empirical length/lang/source mix resampled from sf0.1)
  with planted near-dup clusters at the fixture's observed rate
  (~9%% of docs share a long prefix with a sibling), so dedup cells see
  a comparable candidate/pair density per doc rather than a 10x-
  replicated degenerate one.
- embeddings: same dim/std as the fixture with planted near-dup pairs
  at the fixture's per-doc rate.

Usage: python scripts/make_scaled_sf.py [out_dir] [k]
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/sfscaled/sf1.0"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    rng = np.random.RandomState(4242)

    def w(name: str, df: pd.DataFrame) -> None:
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            os.path.join(out, f"{name}.parquet"),
        )
        print(f"{name}: {len(df)} rows")

    # --- dims copied verbatim ------------------------------------------
    for t in ("region", "nation"):
        w(t, pq.read_table(os.path.join(SRC, f"{t}.parquet")).to_pandas())

    # --- shifted replication for the relational star -------------------
    def rep(name: str, shifts: dict[str, int]) -> None:
        base = pq.read_table(os.path.join(SRC, f"{name}.parquet")).to_pandas()
        parts = []
        for i in range(k):
            c = base.copy()
            for col, off in shifts.items():
                c[col] = c[col] + i * off
            parts.append(c)
        w(name, pd.concat(parts, ignore_index=True))

    C, O, P, S, U, E = 15_000, 150_000, 20_000, 1_000, 1_500, 100_000
    rep("customer", {"c_custkey": C})
    rep("supplier", {"s_suppkey": S})
    rep("part", {"p_partkey": P})
    rep("orders", {"o_orderkey": O, "o_custkey": C})
    rep("lineitem", {"l_orderkey": O, "l_partkey": P, "l_suppkey": S})
    rep("events", {"event_id": E, "user_id": U})

    # --- documents: regenerated word soup ------------------------------
    src_docs = pq.read_table(os.path.join(SRC, "documents.parquet")).to_pandas()
    vocab = sorted({t for s in src_docs.text for t in s.split()})
    lens = src_docs.text.str.split().str.len().to_numpy()
    langs = src_docs.lang.to_numpy()
    n = len(src_docs) * k
    pick_len = lens[rng.randint(0, len(lens), n)]
    pick_lang = langs[rng.randint(0, len(langs), n)]
    total_words = int(pick_len.sum())
    words = np.asarray(vocab, dtype=object)[rng.randint(0, len(vocab), total_words)]
    bounds = np.cumsum(pick_len)
    texts = []
    prev = 0
    for b in bounds:
        texts.append(" ".join(words[prev:b]))
        prev = int(b)
    # plant near-dup clusters: fixture shows ~465/5000 docs sharing a
    # long prefix; emulate with ~4.5% of docs overwritten as a mutated
    # copy of another doc (1-2 word substitutions)
    n_dup = int(0.045 * n)
    dup_dst = rng.choice(n, size=n_dup, replace=False)
    dup_src = rng.randint(0, n, n_dup)
    for d, s in zip(dup_dst, dup_src):
        if d == s:
            continue
        toks = texts[s].split()
        if len(toks) > 4:
            for _ in range(rng.randint(1, 3)):
                toks[rng.randint(0, len(toks))] = vocab[rng.randint(0, len(vocab))]
        texts[d] = " ".join(toks)
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": pick_lang,
            "source": [f"src{i % 20}" for i in range(n)],
        }
    )
    docs["n_chars"] = docs.text.str.len().astype(np.int64)
    w("documents", docs)

    # --- embeddings ----------------------------------------------------
    src_emb = pq.read_table(os.path.join(SRC, "embeddings.parquet")).to_pandas()
    dim = len(src_emb.embedding.iloc[0])
    m = len(src_emb) * k
    E_ = rng.uniform(-0.2165, 0.2165, size=(m, dim))  # matches fixture std .125
    n_pair = int(920 / 2000 * m)  # fixture: 920 cos>=.4 pairs / 2000 vecs
    pdst = rng.choice(m, size=n_pair, replace=False)
    psrc = rng.randint(0, m, n_pair)
    E_[pdst] = E_[psrc] + rng.normal(0, 0.02, size=(n_pair, dim))
    emb = pd.DataFrame(
        {
            "vec_id": np.arange(m, dtype=np.int64),
            "embedding": [row.astype(np.float64) for row in E_],
            "label": rng.randint(0, 10, m).astype(np.int64),
        }
    )
    w("embeddings", emb)
    print(f"scaled dataset at {out} (k={k})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
