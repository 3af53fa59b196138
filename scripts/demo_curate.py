#!/usr/bin/env python
"""Training-data curation demo CLI (spark-submit compatible).

    python scripts/demo_curate.py <documents.parquet|sf_dir> \\
        [--bench-frac 0.05] [--decontam-n 3] [--test-frac 0.1] \\
        [--quota lang=frac ...]

Runs the composed pipeline (quality filter -> exact-dedup keepers ->
benchmark decontamination -> per-stratum quota sample -> stable
train/test split) over a documents table and prints the per-stage
survivor counts and the final per-(lang, split) mix.  The benchmark
side is a deterministic hash sample of the same table, so the demo is
fully reproducible with no external data.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("source", help="documents.parquet path or an sf dir")
    ap.add_argument("--bench-frac", type=float, default=0.05)
    ap.add_argument("--decontam-n", type=int, default=3)
    ap.add_argument("--test-frac", type=float, default=0.1)
    ap.add_argument(
        "--quota", nargs="*", default=["en=0.5", "de=1.0", "zh=0.1"],
        help="stratum=fraction pairs (lang column)",
    )
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from sphinxsearchengine_spark.ops.pipeline import curate
    from sphinxsearchengine_spark.ops.sampling import hash_predicate
    from sphinxsearchengine_spark.ops.textstats import quality_flag

    src = args.source
    if os.path.isdir(src) and os.path.exists(
        os.path.join(src, "documents.parquet")
    ):
        src = os.path.join(src, "documents.parquet")
    fractions = dict(
        (k, float(v)) for k, v in (q.split("=", 1) for q in args.quota)
    )

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("curate-demo")
        .config("spark.sql.shuffle.partitions", str(args.cpus * 2))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    d = spark.read.parquet(src)
    keep = hash_predicate("doc_id", args.bench_frac, salt="bench")
    docs, bench = d.filter(~keep), d.filter(keep)
    n_docs, n_bench = docs.count(), bench.count()
    print(f"input: {n_docs} docs, {n_bench} benchmark docs "
          f"({args.bench_frac:.0%} hash sample, salt='bench')")
    n_quality = docs.filter(quality_flag("text")).count()
    print(f"quality pass: {n_quality} ({n_quality / max(n_docs, 1):.1%})")

    out = curate(
        docs, "doc_id", "text", "lang", fractions,
        bench=bench, decontam_n=args.decontam_n,
        test_fraction=args.test_frac,
    ).cache()
    n_out = out.count()
    print(f"curated: {n_out} ({n_out / max(n_docs, 1):.1%} of input; "
          f"quotas {fractions}, decontam n={args.decontam_n})")
    print("final training mix:")
    for r in (
        out.groupBy("lang", "split").count()
        .orderBy("lang", "split").collect()
    ):
        print(f"  {r.lang:>4} {r.split:>5}: {r['count']}")
    out.unpersist()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
