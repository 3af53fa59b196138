#!/usr/bin/env python
"""Measure this box's per-core throughput ceiling vs active process
count — pure CPU+memory work (numpy sort/cumsum/hash mix approximating
the build's hot loops), NO Spark, NO disk, NO shared state.

Any parallel job on this machine is bounded by this curve (turbo-clock
drop + shared memory bus as more cores activate); the engine's scaling
efficiency is meaningful relative to it.  Appends results to
BENCH/cpu_ceiling.json.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _work(q):
    import numpy as np

    rng = np.random.RandomState(7)
    a = rng.randint(0, 1 << 40, size=1_000_000).astype(np.uint64)
    t0 = time.time()
    iters = 0
    while time.time() - t0 < 8.0:
        b = (a * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(7)
        c = np.sort(b)
        d = np.cumsum(c)
        _ = np.unique(b >> np.uint64(32)).size
        a = d.astype(np.uint64) ^ b
        iters += 1
    q.put(iters / (time.time() - t0))


def measure(k: int) -> float:
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=_work, args=(q,)) for _ in range(k)]
    for p in ps:
        p.start()
    rates = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(rates) / len(rates)  # per-process iterations/sec


def main() -> int:
    levels = [int(x) for x in (sys.argv[1:] or ["1", "2", "4", "8", "32"])]
    out = {}
    for k in levels:
        r = measure(k)
        out[str(k)] = round(r, 3)
        print(f"procs={k}: {r:.2f} iter/s per process", flush=True)
    base = out[str(levels[0])]
    for k in levels:
        out[f"ceiling_{levels[0]}_to_{k}"] = round(out[str(k)] / base, 3)
    path = os.path.join(REPO, "BENCH", "cpu_ceiling.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
