"""Benchmark decontamination: flag training documents that share
n-grams with an evaluation/benchmark set.

The standard guard in LLM training-data pipelines (GPT-3 appendix C,
PaLM §7, Gopher §A1.2): any training document that overlaps an eval
benchmark by one or more n-grams is flagged (and usually dropped) so
downstream eval numbers aren't contaminated.

Scale shape (the 100-TB case): the benchmark side is SMALL (thousands
to millions of n-grams) while the corpus side is the full training
set.  So:

- benchmark n-grams -> distinct -> collected once and broadcast as a
  Python set (the manual broadcast-membership pattern of the
  optimization guide §3.2 — the big side is never shuffled, and unlike
  a Bloom filter the exact set has no false positives),
- the corpus side is ONE narrow Arrow-vectorized pass
  (``mapInPandas``): tokenize, build the doc's distinct n-gram set,
  probe the broadcast set — no explode, no join, no shuffle at all.
  (The r5 shape exploded every corpus n-gram into a broadcast-hash
  join + groupBy(id); the explode + interpreted higher-order gram
  construction dominated its cost — 47.8 s vs 4.2 s at sf1.0/local[32]
  for identical output.)

Determinism: pure token/string computation, no hashing, no RNG —
value-checkable row-for-row against an ANSI-SQL oracle.  The Python
tokenization (`re.split` on the shared TOKEN_SPLIT pattern + `lower`)
is the same one the dedup signature operators use, whose gates prove
it bit-compatible with the JVM/DuckDB tokenization on this corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textstats import TOKEN_SPLIT, _ngrams, _tokens
from .scanwidth import widen_scan


def _count_batches(n: int, bench_bc):
    """mapInPandas factory: (id, text) -> (id, n_ngrams, n_hits) via a
    per-task probe of the broadcast benchmark gram set."""
    import re

    import pandas as pd

    split = re.compile(TOKEN_SPLIT).split

    def gen(pdf_iter):
        s = bench_bc.value
        for pdf in pdf_iter:
            n_ngrams, n_hits = [], []
            for t in pdf["text"]:
                toks = (
                    [w for w in split(t.lower()) if w]
                    if isinstance(t, str) and t
                    else []
                )
                if len(toks) >= n:
                    grams = {
                        " ".join(toks[i:i + n])
                        for i in range(len(toks) - n + 1)
                    }
                    n_ngrams.append(len(grams))
                    n_hits.append(sum(1 for g in grams if g in s))
                else:
                    n_ngrams.append(0)
                    n_hits.append(0)
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(),
                    "n_ngrams": pd.array(n_ngrams, dtype="int64"),
                    "n_hits": pd.array(n_hits, dtype="int64"),
                }
            )

    return gen


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    bench_text_col: str | None = None,
) -> DataFrame:
    """(id, n_ngrams, n_hits, overlap_frac, contaminated) for EVERY row
    of ``docs``:

      n_ngrams      — distinct n-grams of the document,
      n_hits        — of those, how many also occur anywhere in
                      ``bench`` (distinct n-gram match),
      overlap_frac  — n_hits / n_ngrams (0.0 when the doc has no
                      n-grams), rounded to 6 decimals,
      contaminated  — 1 if n_hits > 0 else 0 (the usual drop rule;
                      callers wanting a threshold filter on
                      overlap_frac instead).

    ``bench`` is collected to a distinct n-gram set and broadcast —
    it must be the small side (true for every real benchmark suite).
    """
    bench_text = bench_text_col or text_col
    bench_grams = (
        widen_scan(bench.select(bench_text))  # the bench table is small
        # but its scan still bins to ~2 splits; the O(len²) HOF gram
        # build is the dominant per-row cost, so spread it
        .select(F.explode(_ngrams(_tokens(F.col(bench_text)), n)).alias("gram"))
        .distinct()
    )
    gram_set = frozenset(r[0] for r in bench_grams.collect())
    bench_bc = docs.sparkSession.sparkContext.broadcast(gram_set)

    out = widen_scan(
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    ).mapInPandas(
        _count_batches(n, bench_bc), schema="id long, n_ngrams long, n_hits long"
    )
    frac = F.round(
        F.when(
            F.col("n_ngrams") > 0,
            F.col("n_hits").cast("double") / F.col("n_ngrams"),
        ).otherwise(F.lit(0.0)),
        6,
    )
    return out.select(
        "id",
        "n_ngrams",
        F.col("n_hits").cast("long").alias("n_hits"),
        frac.alias("overlap_frac"),
        (F.col("n_hits") > 0).cast("int").alias("contaminated"),
    )
