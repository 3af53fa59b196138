#!/usr/bin/env python
"""Warm-query phase breakdown for the engine search path (guide §1).

Splits each bench query's warm latency into: driver-side expansion +
block planning, the scored-set Spark job (noop sink), and the full
search (top-k + hydration + collect).  Usage:

    python scripts/profile_search.py INDEX_DIR [n_repeats]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = {
    "search_and": "index search",
    "search_phrase": '"alpha beta"',
    "search_hotterm": "hotterm",
    "search_prefix": "pars*",
    "search_field": "@title file_2*",
    "search_selective": "needleuniq hotterm",
}


def main() -> int:
    from pyspark.sql import SparkSession

    idx = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from sphinxsearchengine_spark.corpus import PINNED_NOW
    from sphinxsearchengine_spark.engine import Searcher
    from sphinxsearchengine_spark.index.layout import IndexLayout
    from sphinxsearchengine_spark.query import executor as X
    from sphinxsearchengine_spark.query.parser import parse_query

    searcher = Searcher(spark, idx, cache_docs=True)
    searcher.search("index", limit=20, now_ts=PINNED_NOW).collect()
    layout = IndexLayout(idx)
    out = {}
    for name, q in QUERIES.items():
        phases = {"expand": [], "plan": [], "score_noop": [], "full": []}
        for _ in range(n):
            qq = parse_query(q)
            t0 = time.time()
            mapping, stats, buckets = X._expand_groups(
                spark, layout, qq, searcher._dict_pdf
            )
            t1 = time.time()
            phases["expand"].append(t1 - t0)
            phase_alts = {}
            for gid, g in enumerate(qq.groups):
                pc = 0
                for a in g.alts:
                    if a.kind == "phrase":
                        phase_alts.setdefault(gid, {})[pc] = len(a.words)
                        pc += 1
            pdf, info = X._plan_blocks(
                spark, layout, None, mapping, stats, buckets,
                len(qq.groups), phase_alts, PINNED_NOW,
                bmx_pdf=searcher._blockmax_pdf,
            )
            t2 = time.time()
            phases["plan"].append(t2 - t1)
            scored = X.score_matches(
                spark, idx, qq, now_ts=PINNED_NOW,
                prune={"topn": 20, "order": "weight", "sort": "desc"},
                _ctx=searcher._ctx(),
            )
            scored.write.format("noop").mode("overwrite").save()
            t3 = time.time()
            phases["score_noop"].append(t3 - t2)
            t4 = time.time()
            searcher.search(q, limit=20, now_ts=PINNED_NOW).collect()
            phases["full"].append(time.time() - t4)
        out[name] = {
            k: round(min(v), 3) for k, v in phases.items()
        }
        if info:
            out[name]["n_blocks"] = info.get("n_blocks")
        out[name]["n_terms"] = len(mapping)
    print(json.dumps(out, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
