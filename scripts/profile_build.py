#!/usr/bin/env python
"""Per-stage build timing at one parallelism level (scaling diagnosis).

Usage: python scripts/profile_build.py CORES [N_DOCS]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import SparkSession

    from sphinxsearchengine_spark.config import EngineConfig
    from sphinxsearchengine_spark.corpus import derive_documents, generate_corpus
    from sphinxsearchengine_spark.index.builder import build_index

    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix=f"prof_{cores}_", dir=root)
    try:
        spark = (
            SparkSession.builder.master(f"local[{cores}]")
            .config("spark.sql.shuffle.partitions", str(cores))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.driver.memory", "64g")
            .config("spark.local.dir", os.path.join(work, "sl"))
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        idx = os.path.join(work, "idx")
        docs = derive_documents(generate_corpus(spark, n_docs, partitions=cores * 2))
        docs.count()
        t0 = time.time()
        build_index(spark, docs, idx, EngineConfig(term_buckets=32), salt_factor=4)
        total = time.time() - t0
        man = json.load(open(os.path.join(idx, "manifests", "seg_00000.json")))
        prev = t0
        stages = {}
        for st in ["docs", "postings", "blockmax", "dict"]:
            ts = man["stages"][st]["ts"]
            stages[st] = round(ts - prev, 1)
            prev = ts
        print("STAGES " + json.dumps(
            {"cores": cores, "n_docs": n_docs, "total": round(total, 1), **stages}
        ))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
