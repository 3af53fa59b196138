"""Delta + varbyte posting codec (numpy-vectorized).

The reference's index keeps positional postings compressed (Sphinx RT
segments use delta+varbyte wordlists/doclists — public Sphinx docs; see
SURVEY.md §1.3).  We store per-(term,field,docid) position lists as
protobuf-style varints over deltas, encoded/decoded with numpy array ops
so the hot path never loops per element in Python.

Layout: values v_0, v_1-v_0, v_2-v_1, ... each emitted little-endian in
7-bit groups, high bit = continuation.
"""

from __future__ import annotations

import numpy as np

_THRESHOLDS = [np.uint64(1) << np.uint64(7 * k) for k in range(1, 10)]


def vb_encode(values: np.ndarray, return_lens: bool = False):
    """Varbyte-encode a uint64 array (no delta).

    With ``return_lens`` also returns the per-value encoded byte count
    (int64 array) — the builder needs it to slice per-group blobs and
    previously recomputed it with an identical threshold loop (r6)."""
    arr = np.ascontiguousarray(values, dtype=np.uint64)
    if arr.size == 0:
        return (b"", np.empty(0, dtype=np.int64)) if return_lens else b""
    nbytes = np.ones(arr.size, dtype=np.int64)
    mx = arr.max()
    for t in _THRESHOLDS:
        if mx < t:
            break
        nbytes += arr >= t
    ends = np.cumsum(nbytes)
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    starts = ends - nbytes
    for k in range(10):
        if k == 0:
            # first 7-bit group exists for EVERY value: skip the
            # all-true boolean mask and its three full-size gathers (r6
            # — this pass dominates when most deltas fit one byte)
            out[starts] = (arr & np.uint64(0x7F)).astype(np.uint8) | (
                (nbytes > 1).astype(np.uint8) << 7
            )
            continue
        mask = nbytes > k
        if not mask.any():
            break
        idx = starts[mask] + k
        group = (arr[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1 > k).astype(np.uint8) << 7
        out[idx] = group.astype(np.uint8) | cont
    if return_lens:
        return out.tobytes(), nbytes
    return out.tobytes()


def vb_decode(buf: bytes) -> np.ndarray:
    """Inverse of :func:`vb_encode`; returns uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    val_idx = np.zeros(b.size, dtype=np.int64)
    np.cumsum(is_last[:-1], out=val_idx[1:])
    n_vals = int(is_last.sum())
    last_pos = np.flatnonzero(is_last)
    starts = np.zeros(n_vals, dtype=np.int64)
    starts[1:] = last_pos[:-1] + 1
    within = (np.arange(b.size) - starts[val_idx]).astype(np.uint64)
    vals = np.zeros(n_vals, dtype=np.uint64)
    np.bitwise_or.at(
        vals, val_idx, (b & np.uint8(0x7F)).astype(np.uint64) << (within * np.uint64(7))
    )
    return vals


def delta_encode(sorted_values: np.ndarray) -> bytes:
    """Delta+varbyte encode a non-decreasing uint64 sequence."""
    arr = np.ascontiguousarray(sorted_values, dtype=np.uint64)
    if arr.size == 0:
        return b""
    deltas = np.empty_like(arr)
    deltas[0] = arr[0]
    np.subtract(arr[1:], arr[:-1], out=deltas[1:])
    return vb_encode(deltas)


def delta_decode(buf: bytes) -> np.ndarray:
    deltas = vb_decode(buf)
    return np.cumsum(deltas, dtype=np.uint64)


# --- small-list fast paths -------------------------------------------------
# Position lists are typically a handful of ints; per-call numpy setup
# (~10µs) dominates there, so the index builder and scorer use these pure
# Python variants (identical byte layout — property-tested against the
# numpy codec).  The numpy paths remain for bulk/block work.

def delta_encode_small(values) -> bytes:
    out = bytearray()
    prev = 0
    for v in values:
        d = v - prev
        prev = v
        while d >= 0x80:
            out.append((d & 0x7F) | 0x80)
            d >>= 7
        out.append(d)
    return bytes(out)


def delta_decode_small(buf: bytes) -> list[int]:
    out = []
    acc = 0
    cur = 0
    shift = 0
    for b in buf:
        cur |= (b & 0x7F) << shift
        if b & 0x80:
            shift += 7
        else:
            acc += cur
            out.append(acc)
            cur = 0
            shift = 0
    return out
