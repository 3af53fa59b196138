"""Benchmark decontamination: flag training documents that share
n-grams with an evaluation/benchmark set.

The standard guard in LLM training-data pipelines (GPT-3 appendix C,
PaLM §7, Gopher §A1.2): any training document that overlaps an eval
benchmark by one or more n-grams is flagged (and usually dropped) so
downstream eval numbers aren't contaminated.

Scale shape (the 100-TB case): the benchmark side is SMALL (thousands
to millions of n-grams) while the corpus side is the full training
set.  So:

- benchmark n-grams -> distinct -> ``F.broadcast`` : the big side is
  never shuffled for the membership probe (map-side broadcast-hash
  semi join against the corpus's exploded n-grams),
- the only shuffle is the final groupBy(id) count — partial (map-side)
  aggregation reduces it to at most one row per (partition, doc), and
  the explode keeps every document's n-grams inside one input
  partition, so the exchange carries ~one row per document.

Determinism: pure token/string computation, no hashing, no RNG —
value-checkable row-for-row against an ANSI-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textstats import _ngrams, _tokens


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
        bench.select(
            F.explode(_ngrams(_tokens(F.col(bench_text)), n)).alias("gram")
        )
        .distinct()
    )
    # ONE corpus scan, and nothing but (id, gram) crosses the explode:
    # the grams are distinct per doc, so count(gram) after the explode
    # IS n_ngrams — carrying size(grams) as a sibling column instead
    # would leave the full n-gram expression in a Project ABOVE the
    # Generate, recomputed per exploded row (measured 50x slower).
    # explode_outer keeps gram-less documents (null gram -> count 0).
    grams = F.array_distinct(_ngrams(_tokens(F.col(text_col)), n))
    doc_grams = docs.select(
        F.col(id_col).alias("id"),
        F.explode_outer(grams).alias("gram"),
    )
    out = (
        doc_grams.join(
            F.broadcast(bench_grams.withColumn("hit", F.lit(1))),
            "gram",
            "left",
        )
        .groupBy("id")
        .agg(
            F.count("gram").alias("n_ngrams"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hits"),
        )
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
