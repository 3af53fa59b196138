"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: JVM-side `aggregate`/`zip_with` dot product,
  `TakeOrderedAndProject` top-k — the exact baseline.
- LSH (random hyperplane) bucketing: the scale path — candidates from a
  sign-bit bucket join (Hamming-probe multi-bucket), reranked exactly.
  Hyperplanes are seeded+deterministic; no wall clock, no randomness at
  query time.

At 10^12 rows the brute-force path is a full scan per query (fine for
batch scoring of few queries — it's one pass, no shuffle); the LSH path
prunes to matching buckets via a co-partitioned join on bucket id.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    df: DataFrame, id_col: str, vec_col: str, query_vec: list[float], k: int = 10,
    exclude_id: int | None = None,
) -> DataFrame:
    """Exact brute-force cosine top-k against one query vector.

    Returns (id, cosine) — cosine rounded to 6dp for cross-engine
    comparability; ties broken by id.
    """
    from .scanwidth import widen_scan

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.sqrt(np.dot(query_vec, query_vec)))
    out = widen_scan(df.select(id_col, vec_col)).select(
        F.col(id_col).alias("id"),
        (_dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn))).alias("_c"),
    )
    if exclude_id is not None:
        out = out.filter(F.col("id") != exclude_id)
    return (
        out.orderBy(F.col("_c").desc(), F.col("id").asc())
        .limit(k)
        .select("id", F.round("_c", 6).alias("cosine"))
    )


def _flip_masks(n_planes: int, radius: int) -> list[int]:
    """All XOR masks with <= `radius` bits set over `n_planes` bits
    (0 first, then ascending popcount) — the multi-probe key set shared
    by the pair and top-k paths."""
    from itertools import combinations

    masks = [0]
    for r in range(1, radius + 1):
        for bits in combinations(range(n_planes), r):
            m = 0
            for b in bits:
                m |= 1 << b
            masks.append(m)
    return masks


def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    bucket_col: str | None = None,
    n_planes: int = 8,
    probe_hamming: int = 1,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS: all (id_a < id_b) with
    cosine(vec_a, vec_b) >= threshold — the vector-space member of the
    dedup family (exact digest / n-gram Jaccard / MinHash / SimHash /
    this).

    Two modes:

    - ``bucket_col=None`` (exact): an O(n²) non-equi self-join — the
      small-corpus / within-partition baseline and the correctness
      oracle.  Do NOT run this at 10^12 rows.
    - ``bucket_col='lsh_bucket'`` (scale path): candidates are blocked
      on a PERSISTED hyperplane sign-bucket column (materialized once by
      :func:`with_lsh_buckets` with the same ``n_planes``/seed).  Each
      row additionally probes every bucket within ``probe_hamming`` bit
      flips (all C(n_planes, r) masks for r <= probe_hamming, not just
      single bits — ADVICE r4), so any pair whose buckets differ by
      <= 2·probe_hamming bits meets in some key — near-dup pairs (tiny
      angle => tiny expected bit difference) are recovered with high
      recall while the join fans out ~sum_r C(n_planes, r)·n rows
      (n_planes+1 per row at the default radius 1).  Every candidate is
      verified with the exact cosine, so precision is always 1; recall
      is < 1 by design (pytest asserts >= 0.9 on the seeded fixture).

    Cosine is computed as dot/(norm·norm) in BOTH modes — the identical
    expression shape the DuckDB oracle uses, so the gate compares
    bit-comparable doubles.
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _norm(F.col(vec_col)).alias("nrm"),
        *([F.col(bucket_col).alias("bkt")] if bucket_col else []),
    )

    def sides(src, extra=()):
        a = src.select(
            F.col("id").alias("id_a"), F.col("v").alias("va"),
            F.col("nrm").alias("na"), *extra,
        )
        b = src.select(
            F.col("id").alias("id_b"), F.col("v").alias("vb"),
            F.col("nrm").alias("nb"), *extra,
        )
        return a, b

    if bucket_col is None:
        a, b = sides(base)
        cand = a.join(b, F.col("id_a") < F.col("id_b"))
    else:
        if not 0 <= probe_hamming <= n_planes:
            raise ValueError(
                f"probe_hamming must be in [0, n_planes={n_planes}], "
                f"got {probe_hamming}"
            )
        probes = F.array(
            *[
                F.col("bkt").bitwiseXOR(F.lit(m))
                for m in _flip_masks(n_planes, probe_hamming)
            ]
        )
        keyed = base.select("id", "v", "nrm", F.explode(probes).alias("key"))
        a, b = sides(keyed, extra=(F.col("key"),))
        cand = (
            a.join(b, ["key"])
            .filter(F.col("id_a") < F.col("id_b"))
            .drop("key")
            .dropDuplicates(["id_a", "id_b"])
        )
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        cand.withColumn("_c", cos)
        .filter(F.col("_c") >= threshold)
        .select("id_a", "id_b", F.round("_c", 6).alias("cosine"))
    )


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim)


def lsh_bucket_col(vec_col, planes: np.ndarray):
    """Sign-bit bucket id as a native column expression (no UDF):
    bit i = 1 if dot(vec, plane_i) > 0."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bits.append(
            F.when(_dot(vec_col, plane) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def with_lsh_buckets(
    df: DataFrame, vec_col: str, n_planes: int = 12, seed: int = 42,
    bucket_col: str = "lsh_bucket",
) -> DataFrame:
    """Attach the persistent sign-bucket column — the ANN *index build*
    step.  Write the result to parquet once; every query then prunes its
    scan with a pushed ``bucket IN (probes)`` filter instead of
    recomputing signatures over the full table (at 10^12 rows the
    on-the-fly path is a full scan per query — the round-2 scale hole).

    The planes are a pure function of (dim, n_planes, seed), so queries
    reconstruct them without reading the stored vectors."""
    dim = len(df.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    return df.withColumn(bucket_col, lsh_bucket_col(F.col(vec_col), planes))


def _probe_buckets(query_vec, planes, probe_hamming: int) -> list[int]:
    """Query signature + all buckets within the given Hamming radius."""
    n_planes = len(planes)
    qsig = 0
    for i, p in enumerate(planes):
        if float(np.dot(p, query_vec)) > 0:
            qsig |= 1 << i
    return sorted({qsig ^ m for m in _flip_masks(n_planes, probe_hamming)})


def ivf_centroids(df: DataFrame, id_col: str, vec_col: str, k: int = 8) -> np.ndarray:
    """Deterministic IVF training: the k smallest-id vectors, L2
    normalized — the sampled-seed variant of IVF-flat (at scale swap in
    a KMeans fit; the serving path below is unchanged).  Determinism
    keeps the cell assignment reproducible by the SQL oracle."""
    rows = df.select(id_col, vec_col).orderBy(F.col(id_col).asc()).limit(k).collect()
    c = np.asarray([list(r[1]) for r in rows], dtype=np.float64)
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def ivf_centroids_kmeans(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 10,
    sample_rows: int = 100_000,
    sample_fraction: float | None = None,
) -> np.ndarray:
    """Spherical-KMeans IVF training (the quality upgrade over the
    smallest-id seed centroids of :func:`ivf_centroids`; both feed the
    SAME serving path — `with_ivf_cells` + `ivf_topk`).

    Deterministic end to end: the training sample is the `sample_rows`
    smallest-id vectors (a content-independent, reproducible subset —
    no RNG, no wall clock), init is the k smallest-id sample vectors,
    then Lloyd iterations with cosine assignment run in numpy on the
    driver.  At 10^12 rows the sample collect is the only driver-side
    step (bounded by sample_rows), cell assignment stays a distributed
    column expression.

    If ids are NOT uniform over their space (sequential ids with
    time-clustered content), pass ``sample_fraction``: the sample then
    comes from a seeded Bernoulli ``df.sample`` (TABLESAMPLE) over the
    whole table instead of the smallest-id prefix — deterministic for a
    fixed dataset+partitioning, and the collected rows are sorted by id
    so the KMeans init does not depend on arrival order.

    Empty cells re-seed to the farthest sample vector (standard KMeans
    repair, deterministic tie-break by index)."""
    if sample_fraction is not None:
        rows = (
            df.select(id_col, vec_col)
            .sample(withReplacement=False, fraction=sample_fraction, seed=42)
            .limit(sample_rows)
            .collect()
        )
        rows.sort(key=lambda r: r[0])
    else:
        rows = (
            df.select(id_col, vec_col)
            .orderBy(F.col(id_col).asc())
            .limit(sample_rows)
            .collect()
        )
    x = np.asarray([list(r[1]) for r in rows], dtype=np.float64)
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    k = min(k, len(xn))
    cents = xn[:k].copy()
    for _ in range(iters):
        sims = xn @ cents.T                       # (n, k) cosine
        assign = np.argmax(sims, axis=1)
        new = np.zeros_like(cents)
        np.add.at(new, assign, xn)
        counts = np.bincount(assign, minlength=k)
        empty = counts == 0
        if empty.any():
            # farthest-point re-seed for empty cells, deterministic
            far = np.argsort(sims.max(axis=1), kind="stable")
            for j, e in zip(far, np.flatnonzero(empty)):
                new[e] = xn[j]
        cents = new / np.maximum(
            np.linalg.norm(new, axis=1, keepdims=True), 1e-12
        )
    return cents


def ivf_cell_col(vec_col, centroids: np.ndarray):
    """argmax_j dot(vec, centroid_j) as a native column expression
    (centroids pre-normalized, so this ranks by cosine); ties take the
    lowest cell id."""
    cands = []
    for j, c in enumerate(centroids):
        plane = F.array(*[F.lit(float(x)) for x in c])
        cands.append(
            F.struct(_dot(vec_col, plane).alias("c"), F.lit(-j).alias("nj"))
        )
    return (-F.array_max(F.array(*cands))["nj"]).cast("int")


def with_ivf_cells(
    df: DataFrame, vec_col: str, centroids: np.ndarray,
    cell_col: str = "ivf_cell",
) -> DataFrame:
    """Attach the persistent IVF cell column — the ANN index build step
    (write once; queries prune their scan with a pushed cell IN (probes)
    filter, reading ~nprobe/k of the table)."""
    return df.withColumn(cell_col, ivf_cell_col(F.col(vec_col), centroids))


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 2,
    exclude_id: int | None = None,
    cell_col: str = "ivf_cell",
) -> DataFrame:
    """IVF-flat approximate top-k: rank cells by centroid cosine against
    the query, scan the nprobe best cells only, rerank exactly."""
    sims = centroids @ np.asarray(query_vec, dtype=np.float64)
    probes = [int(j) for j in np.argsort(-sims, kind="stable")[:nprobe]]
    cand = df.filter(F.col(cell_col).isin(probes))
    return cosine_topk(cand, id_col, vec_col, query_vec, k, exclude_id)


def lsh_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 12,
    probe_hamming: int = 1,
    exclude_id: int | None = None,
    bucket_col: str | None = None,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: restrict to vectors whose hyperplane
    sign-bucket is within `probe_hamming` bits of the query's bucket,
    then rerank exactly.

    ``bucket_col``: name of a PERSISTED bucket column previously
    materialized by :func:`with_lsh_buckets` (with the same n_planes and
    seed).  The probe filter is then an ``IN`` predicate on a stored
    column — pushed into the parquet scan, so only probe buckets' row
    groups are read.  Without it the bucket is derived on the fly (full
    scan; fine for one-off batch queries, wrong as the steady-state
    serving path)."""
    planes = hyperplanes(len(query_vec), n_planes, seed)
    probes = _probe_buckets(query_vec, planes, probe_hamming)
    if bucket_col is not None:
        cand = df.filter(F.col(bucket_col).isin(probes))
    else:
        bucketed = df.withColumn("_bucket", lsh_bucket_col(F.col(vec_col), planes))
        cand = bucketed.filter(F.col("_bucket").isin(probes))
    return cosine_topk(cand, id_col, vec_col, query_vec, k, exclude_id)
