"""Canonical content-hash helper shared by the dedup signature family
and the packed postings exchange.

``md5_low64`` = low 8 bytes of md5, little-endian — bit-identical to
DuckDB's ``md5_number_lower(token)``, which is what makes every derived
artifact (minhash/simhash/shingle mixes, packed bucket/salt keys)
reproducible in the driver's SQL oracle.  ONE implementation with one
worker-lifetime cache, so the consumers can never drift apart.
"""

from __future__ import annotations

import hashlib

import numpy as np

# Worker-lifetime cache: token/term string -> 64-bit hash.  Bounded so a
# pathological vocabulary can't grow the worker heap without limit.
_CACHE: dict[str, int] = {}
_CAP = 1 << 20


def md5_low64_many(uniq_tokens) -> np.ndarray:
    """Hash a sequence of UNIQUE strings -> uint64 array (cached)."""
    out = np.empty(len(uniq_tokens), dtype=np.uint64)
    for i, t in enumerate(uniq_tokens):
        h = _CACHE.get(t)
        if h is None:
            h = int.from_bytes(hashlib.md5(t.encode()).digest()[8:16], "little")
            if len(_CACHE) < _CAP:
                _CACHE[t] = h
        out[i] = h
    return out
