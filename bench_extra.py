#!/usr/bin/env python
"""Per-cell measurement harness for the optimization round (guide §1).

bench.py is FROZEN for the driver's measurement; this file exists so
optimization work can time individual cells in isolation (same session
config, same best-of-N methodology, sync+drop_caches settling), capture
``.explain("formatted")`` plans to a directory, and use the noop sink
to time computation without the collect-to-driver tail when wanted.

Usage:
    python bench_extra.py [options] cell [cell ...]

Options (env-style to keep argv simple):
    SPARK_GRAFT_SF_DIR   data dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS     local core count (default 32)
    SSE_BENCH_N          repeats per cell (default 3, best-of)
    SSE_PLANS_DIR        if set, write <cell>.txt explain output there
    SSE_SINK             'collect' (default, bench.py parity) or 'noop'

Cells: any queries() name, plus 'index_build' and the search_* engine
cells (which need a built index — index_build runs implicitly first
when a search cell is requested).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N = int(os.environ.get("SSE_BENCH_N", "3"))
PLANS_DIR = os.environ.get("SSE_PLANS_DIR")
SINK = os.environ.get("SSE_SINK", "collect")

ENGINE_QUERIES = {
    "search_and": "index search",
    "search_phrase": '"alpha beta"',
    "search_hotterm": "hotterm",
    "search_prefix": "pars*",
    "search_field": "@title file_2*",
    "search_selective": "needleuniq hotterm",
}


def _settle() -> None:
    os.system("sync")
    try:
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3")
    except OSError:
        pass


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as gate

    cells = sys.argv[1:]
    if not cells:
        print("usage: bench_extra.py cell [cell ...]", file=sys.stderr)
        return 2

    scratch_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    scratch = tempfile.mkdtemp(prefix="sse_bx_", dir=scratch_root)
    _settle()

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("sse-bench-extra")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SSE_DRIVER_MEM", "48g"))
        .config("spark.local.dir", os.path.join(scratch, "sparklocal"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    gate_queries = gate.queries()
    out: dict[str, object] = {}
    idx = None

    def ensure_index():
        nonlocal idx
        if idx is not None:
            return idx
        from sphinxsearchengine_spark.config import EngineConfig
        from sphinxsearchengine_spark.corpus import derive_documents, generate_corpus
        from sphinxsearchengine_spark.index.builder import build_index

        n_base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).count()
        docs = derive_documents(generate_corpus(spark, n_base * 10, partitions=CPUS))
        idx = os.path.join(scratch, "idx")
        t0 = time.time()
        build_index(spark, docs, idx, EngineConfig(term_buckets=CPUS), salt_factor=4)
        out["index_build_warm0"] = round(time.time() - t0, 3)
        return idx

    def save_plan(name, df):
        if PLANS_DIR:
            os.makedirs(PLANS_DIR, exist_ok=True)
            with open(os.path.join(PLANS_DIR, f"{name}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))

    for cell in cells:
        spark.sparkContext.setJobDescription(f"bx:{cell}")
        if cell == "index_build":
            from sphinxsearchengine_spark.config import EngineConfig
            from sphinxsearchengine_spark.corpus import derive_documents, generate_corpus
            from sphinxsearchengine_spark.index.builder import build_index

            n_base = spark.read.parquet(
                os.path.join(SF_DIR, "documents.parquet")).count()
            docs = derive_documents(
                generate_corpus(spark, n_base * 10, partitions=CPUS))
            runs = []
            for i in range(N):
                _settle()
                b_idx = os.path.join(scratch, f"idx{i}")
                t0 = time.time()
                build_index(spark, docs, b_idx,
                            EngineConfig(term_buckets=CPUS), salt_factor=4)
                runs.append(round(time.time() - t0, 3))
            idx = os.path.join(scratch, f"idx{N-1}")
            out[cell] = min(runs)
            out[f"{cell}_runs"] = runs
        elif cell in ENGINE_QUERIES:
            from sphinxsearchengine_spark.corpus import PINNED_NOW
            from sphinxsearchengine_spark.engine import Searcher

            ensure_index()
            if not hasattr(main, "_searcher"):
                main._searcher = Searcher(spark, idx, cache_docs=True)
                main._searcher.search("index", limit=20, now_ts=PINNED_NOW).collect()
            s = main._searcher
            runs = []
            for _ in range(max(N, 5)):
                t0 = time.time()
                df = s.search(ENGINE_QUERIES[cell], limit=20, now_ts=PINNED_NOW)
                df.collect()
                runs.append(round(time.time() - t0, 3))
            save_plan(cell, s.search(ENGINE_QUERIES[cell], limit=20,
                                     now_ts=PINNED_NOW))
            out[cell] = min(runs)
            out[f"{cell}_runs"] = runs
        elif cell in gate_queries:
            runs = []
            for _ in range(N):
                spark.catalog.clearCache()
                t0 = time.time()
                df = gate_queries[cell](spark, SF_DIR)
                if SINK == "noop":
                    df.write.format("noop").mode("overwrite").save()
                else:
                    df.collect()
                runs.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
            save_plan(cell, gate_queries[cell](spark, SF_DIR))
            out[cell] = min(runs)
            out[f"{cell}_runs"] = runs
        else:
            print(f"unknown cell: {cell}", file=sys.stderr)

    spark.stop()
    shutil.rmtree(scratch, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
