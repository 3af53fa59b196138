#!/usr/bin/env python
"""Two-parallelism scaling bench (north-rule N→4N proxy, SURVEY.md §5.6).

Runs the SAME index-build job at local[8] and local[32] on the SAME
deterministic corpus and reports docs/sec at both plus the scaling
efficiency  eff = (T_8 / T_32) / 4.  Results land in BENCH/BASELINE.md.

Each run is a fresh JVM (subprocess) so executor-thread count is the
only variable.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUNNER = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from sphinxsearchengine_spark.config import EngineConfig
from sphinxsearchengine_spark.corpus import derive_documents, generate_corpus, PINNED_NOW
from sphinxsearchengine_spark.index.builder import build_index
from sphinxsearchengine_spark.query.executor import search

cores = int(sys.argv[1]); n_docs = int(sys.argv[2])
spark = (SparkSession.builder.master(f"local[{{cores}}]")
    .config("spark.sql.shuffle.partitions", str(cores))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.driver.memory", "32g")
    .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
idx = os.path.join(tempfile.mkdtemp(prefix="sse_scale_"), "idx")
docs = derive_documents(generate_corpus(spark, n_docs, partitions=cores * 2))
docs.count()  # warm input generation path fairly for both runs
t0 = time.time()
build_index(spark, docs, idx, EngineConfig(term_buckets=32), salt_factor=4)
build_s = time.time() - t0
t0 = time.time()
for q in ["index search", '"alpha beta"', "hotterm"]:
    search(spark, idx, q, limit=20, now_ts=PINNED_NOW).collect()
query_s = time.time() - t0
shutil.rmtree(os.path.dirname(idx), ignore_errors=True)
print("RESULT " + json.dumps({{"cores": cores, "build_s": build_s,
    "docs_per_sec": n_docs / build_s, "query_s": query_s}}))
"""


def _settle() -> None:
    """Damp host I/O noise between runs (dirty-page writeback on this
    sandbox's virtual disk showed multi-x jitter)."""
    os.system("sync")
    try:
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3")
    except OSError:
        pass
    import time

    time.sleep(3)


def run(cores: int, n_docs: int, repeats: int = 2) -> dict:
    """Best of `repeats` runs (fresh JVM each) — min damps host jitter."""
    code = _RUNNER.format(repo=REPO)
    best = None
    for _ in range(repeats):
        _settle()
        out = subprocess.run(
            [sys.executable, "-c", code, str(cores), str(n_docs)],
            capture_output=True, text=True, timeout=3600,
        )
        res = None
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                res = json.loads(line[7:])
        if res is None:
            raise RuntimeError(
                f"no RESULT from cores={cores}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
            )
        if best is None or res["build_s"] < best["build_s"]:
            best = res
    return best


def main() -> int:
    n_docs = int(os.environ.get("SSE_SCALE_DOCS", "200000"))
    r8 = run(8, n_docs)
    r32 = run(32, n_docs)
    eff = (r8["build_s"] / r32["build_s"]) / 4.0
    report = {
        "n_docs": n_docs,
        "local8": r8,
        "local32": r32,
        "speedup_8_to_32": round(r8["build_s"] / r32["build_s"], 3),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(report, indent=2))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md, "w") as f:
        f.write(
            "# BENCH/BASELINE — measured numbers\n\n"
            "Two-parallelism scaling run (sandbox proxy for the north rule's\n"
            "N → 4N executor criterion): identical index-build job on the\n"
            "same deterministic corpus, fresh JVM per run.\n\n"
            f"| metric | local[8] | local[32] |\n|---|---|---|\n"
            f"| build seconds ({n_docs} docs) | {r8['build_s']:.1f} | {r32['build_s']:.1f} |\n"
            f"| docs indexed/sec | {r8['docs_per_sec']:.0f} | {r32['docs_per_sec']:.0f} |\n"
            f"| 3-query latency total (s) | {r8['query_s']:.2f} | {r32['query_s']:.2f} |\n\n"
            f"**Speedup 8→32 threads: {report['speedup_8_to_32']}× — scaling "
            f"efficiency {report['scaling_efficiency']} (target ≥ 0.8).**\n\n"
            "Interpretation: 4× the worker threads on the same machine; disk\n"
            "and memory bandwidth are shared (unlike a real 4N-executor\n"
            "cluster), so this efficiency is a conservative lower bound for\n"
            "the shuffle-dominated build. See BENCH_r*.json for the per-round\n"
            "headline suite at sf0.1.\n"
        )
    print(f"wrote {md}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
