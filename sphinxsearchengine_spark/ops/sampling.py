"""Deterministic sampling operators for training-data pipelines.

A 100-TB corpus pipeline needs REPRODUCIBLE sampling: per-language
quotas for a training mix, a stable train/held-out split, a fixed-rate
subsample for evaluation — all independent of partitioning, executor
count, row order and Spark version.  ``rand()``/``TABLESAMPLE`` give
none of that, so everything here derives from a content hash of the
row id:

    keep  <=>  md5_low64(concat(id, ':', salt)) < fraction * 2^64

- **Pure JVM column expressions** (md5 + substring shuffle + conv):
  narrow plan, zero shuffle, whole-stage codegen, no Python in the hot
  path — the filter costs one hash per row at any scale.
- **Exactly reproducible in SQL**: the same predicate is expressible
  with DuckDB's ``md5_number_lower`` (the driver oracle value-checks
  the sampled ROW SET, not just its size).
- Distinct ``salt`` values give independent samples; the same salt
  always returns the same rows, so a split is stable across reruns
  and incremental loads (a new doc lands on the same side forever).

The hash is the same md5-low64 used by the dedup signatures and the
packed exchange (see hashing.py) — bytes [8:16] of md5,
little-endian.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_TWO64 = 1 << 64


def threshold_of(fraction: float) -> int:
    """fraction in [0,1] -> inclusive-exclusive uint64 threshold.  Both
    the Spark predicate and the SQL oracle must inline THIS integer so
    the two sides can never disagree on float rounding."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return min(int(fraction * _TWO64), _TWO64 - 1) if fraction < 1.0 else _TWO64


def md5_low64_col(key: Column) -> Column:
    """md5-low64 of a string column as decimal(20,0) — JVM-side twin of
    hashing.md5_low64_many / DuckDB md5_number_lower: bytes [8:16] of
    the digest, little-endian, i.e. hex chars 31-32, 29-30, ... 17-18
    of the hex digest re-read big-endian (parity pytest-enforced)."""
    hexs = F.md5(key)
    le = F.concat(*[F.substring(hexs, 31 - 2 * i, 2) for i in range(8)])
    return F.conv(le, 16, 10).cast("decimal(20,0)")


def _thr_lit(fraction: float) -> Column:
    """Threshold as a decimal literal — 2^64-scale ints overflow a
    LongType literal, so route through a string cast (21-digit max
    fits decimal(21,0))."""
    return F.lit(str(threshold_of(fraction))).cast("decimal(21,0)")


def _key(id_col: str, salt: str) -> Column:
    return F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))


def hash_predicate(id_col: str, fraction: float, salt: str = "s42") -> Column:
    """The keep-predicate behind hash_sample, exposed so callers can
    negate it (``~hash_predicate(...)``) for the exact complement —
    e.g. benchmark vs training sides of a decontamination check."""
    return md5_low64_col(_key(id_col, salt)) < _thr_lit(fraction)


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = "s42"
) -> DataFrame:
    """Deterministic ~``fraction`` subsample: keeps exactly the rows
    whose id-hash falls under the threshold — same rows every run, on
    every cluster, at every partitioning."""
    return df.filter(hash_predicate(id_col, fraction, salt))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
    salt: str = "s42",
) -> DataFrame:
    """Per-stratum deterministic sampling — the training-mix quota
    operator (e.g. keep 100% of 'rust', 5% of 'en' boilerplate).
    ``fractions`` maps stratum value -> fraction; unlisted strata get
    ``default``.  Still a narrow plan: the per-row threshold is a CASE
    over the (small, bounded) fractions dict."""
    thr = _thr_lit(default)
    for value, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == value, _thr_lit(frac)).otherwise(thr)
    return df.filter(md5_low64_col(_key(id_col, salt)) < thr)


def train_test_split(
    df: DataFrame, id_col: str, test_fraction: float, salt: str = "split"
) -> DataFrame:
    """Adds a stable ``split`` column ('test' under the threshold,
    'train' otherwise).  Content-hash based, so a document keeps its
    side across reruns and incremental corpus growth — the property
    that prevents eval contamination when the corpus is rebuilt."""
    return df.withColumn(
        "split",
        F.when(
            md5_low64_col(_key(id_col, salt)) < _thr_lit(test_fraction),
            F.lit("test"),
        ).otherwise(F.lit("train")),
    )


def oracle_hash_expr(id_expr: str, salt: str) -> str:
    """DuckDB-side twin predicate builder used by the driver oracle:
    md5_number_lower(concat(id, ':', salt)) — identical value to
    md5_low64_col by the shared hash contract."""
    return f"md5_number_lower(concat(CAST({id_expr} AS VARCHAR), ':{salt}'))"
