"""Scan-width guard for Python-boundary stages.

Spark bins small parquet files into few input splits
(``maxPartitionBytes`` + ``openCostInBytes``): a 15 MB documents table
scans as 2 tasks, so a ``mapInPandas`` stage over it uses 2 of 32 cores
(guide §6.1; this host's split-binning quirk is documented in
CLAUDE.md — the index builder has handled it with ``_split_hint`` since
round 1, but the LLM-pipeline operators did not).

``widen_scan`` repartitions the input up to the cluster's default
parallelism ONLY when the current partitioning is far below it.  At
production scale the input has many splits and this is a no-op; the
round-robin exchange it inserts on small inputs moves exactly the
columns the Python stage needs (callers select first) and buys a
near-linear speedup of the per-doc Python/numpy work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_scan(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to defaultParallelism when its current plan
    would run on less than half the cores; identity otherwise."""
    try:
        p = df.sparkSession.sparkContext.defaultParallelism
        cur = df.rdd.getNumPartitions()
    except Exception:
        return df
    if cur * 2 <= p:
        return df.repartition(p)
    return df
