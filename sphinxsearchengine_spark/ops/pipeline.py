"""End-to-end training-data curation: the composition the individual
ops exist FOR, as one operator.

    quality filter -> exact dedup (keeper per digest)
      -> [benchmark decontamination] -> stratified quota sample
      -> stable train/test split

Every stage is one of the already-tested primitives; this module only
sequences them, so the 100-TB cost model is the sum of its parts:

- quality filter: in-row boolean (zero shuffle),
- exact dedup: ONE shuffle on md5(text) (window row_number keeper —
  no groupBy + join-back, no second corpus scan),
- decontamination (optional): broadcast bench n-grams, one corpus
  scan, one one-row-per-doc shuffle, semi join on id,
- stratified sample + split: in-row hash predicates (zero shuffle).

Deterministic end to end (content hashes only — no RNG, no wall
clock): the same corpus always curates to the same training mix, and a
grown corpus keeps every previously-selected row's fate stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .decontam import decontaminate
from .sampling import stratified_sample, train_test_split
from .textstats import quality_flag


def curate(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    strata_col: str,
    fractions: dict[str, float],
    bench: DataFrame | None = None,
    decontam_n: int = 8,
    default_fraction: float = 0.0,
    test_fraction: float = 0.05,
    salt: str = "s42",
) -> DataFrame:
    """Curated training rows: all of ``docs``'s columns plus ``split``
    ('train' | 'test').  A row survives iff it passes the quality
    heuristics, is the keeper (min id) of its exact-content group, has
    no ``decontam_n``-gram in common with ``bench`` (when given), and
    falls inside its stratum's quota."""
    survivors = docs.filter(quality_flag(text_col))
    # keeper (min id) per exact-content group via ONE window exchange —
    # same semantics as exact_duplicates + semi join back, but without
    # the second corpus scan and join shuffle that shape would cost
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    survivors = (
        survivors.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if bench is not None:
        clean = (
            decontaminate(survivors, bench, id_col, text_col, n=decontam_n)
            .filter(F.col("contaminated") == 0)
            .select(F.col("id").alias(id_col))
        )
        survivors = survivors.join(clean, id_col, "left_semi")
    sampled = stratified_sample(
        survivors, id_col, strata_col, fractions,
        default=default_fraction, salt=salt,
    )
    return train_test_split(sampled, id_col, test_fraction)
