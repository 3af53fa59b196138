#!/usr/bin/env python
"""Demo driver: build an index from the synthetic corpus and search it.

Usage (the reference's rebuild-sphinx.php + searchText analog):

    spark-submit scripts/demo_search.py <index_dir> build [n_docs]
    spark-submit scripts/demo_search.py <index_dir> search 'query' [limit]
    spark-submit scripts/demo_search.py <index_dir> suggest 'query'
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from sphinxsearchengine_spark.config import EngineConfig
from sphinxsearchengine_spark.corpus import (
    PINNED_NOW,
    derive_documents,
    generate_corpus,
)
from sphinxsearchengine_spark.index.builder import build_index


def main() -> int:
    index_dir, cmd = sys.argv[1], sys.argv[2]
    spark = (
        SparkSession.builder.master(os.environ.get("SPARK_MASTER", "local[8]"))
        .appName("sse-demo")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if cmd == "build":
        n = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
        docs = derive_documents(generate_corpus(spark, n, partitions=8))
        meta = build_index(spark, docs, index_dir, EngineConfig())
        print(f"BUILT index at {index_dir}: {meta.n_docs} docs, "
              f"{meta.term_buckets} buckets, segments={[s['name'] for s in meta.segments]}")
    elif cmd == "search":
        from sphinxsearchengine_spark.engine import Searcher

        q = sys.argv[3]
        limit = int(sys.argv[4]) if len(sys.argv) > 4 else 10
        res, meta = Searcher(spark, index_dir).search_with_meta(
            q, limit=limit, now_ts=PINNED_NOW
        )
        rows = res.collect()
        print(f"QUERY {q!r}  total={meta['total']}  keywords={meta['keywords']}")
        for r in rows:
            print(f"  #{r.rank:<3} docid={r.docid:<21} score={r.score:.6f} "
                  f"{r.repo}:{r.path} [{r.lang}]")
        if not rows:
            print("  (no results)")
    elif cmd == "suggest":
        from sphinxsearchengine_spark.engine import Searcher

        q = sys.argv[3]
        out = Searcher(spark, index_dir).suggest(q)
        print(f"SUGGEST {q!r} -> {out!r}" if out else
              f"SUGGEST {q!r} -> (all keywords known)")
    else:
        print(f"unknown cmd {cmd}", file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
