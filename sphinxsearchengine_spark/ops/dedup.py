"""Deduplication operators for large-scale training-data pipelines.

All operators work on a (id, text) DataFrame and scale via standard
Spark primitives:

- exact:        hash-groupBy — one shuffle on the digest
- n-gram Jaccard: shingle explode + self-join on shingle (the join key
  IS the blocking key; no all-pairs blowup)
- MinHash+LSH:  vectorized signature UDF → band-bucket join → verify
- SimHash:      64-bit signature, banded by 16-bit chunks for candidate
  generation, Hamming-verified

At 100 TB the shingle/band joins shuffle on content-derived keys that
are naturally well-distributed; stop-shingle removal (drop shingles with
document frequency above a cap) bounds the worst-case join fan-out.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

TOKEN_SPLIT = "[^a-z0-9]+"

# deterministic 64-bit MinHash parameters (fixed seed — no wall clock)
_MERSENNE = (1 << 61) - 1


def _minhash_params(num_hashes: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_hashes, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_hashes, dtype=np.int64).astype(np.uint64)
    return a, b


def _tokens(col):
    return F.split(F.lower(col), TOKEN_SPLIT)


def shingles_df(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Explode k-token shingles: (id, shingle). Distinct per doc."""
    toks = F.filter(_tokens(F.col(text_col)), lambda x: F.length(x) > 0)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0)))
    sh = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(sh).alias("shingle"))
        .filter(F.size(F.split("shingle", " ")) == k)
        .distinct()
    )


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup via content digest: one row per duplicate group with
    the keeper (min id) and copy count."""
    return (
        df.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(F.min("id").alias("keeper_id"), F.count(F.lit(1)).alias("copies"))
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, threshold: float = 0.5,
    stop_shingle_df: int | None = None,
) -> DataFrame:
    """All pairs (a < b) with k-shingle Jaccard >= threshold.

    Shingle self-join as the blocking step; `stop_shingle_df` drops
    ultra-common shingles to bound join fan-out at scale.
    """
    sh = shingles_df(df, id_col, text_col, k)
    if stop_shingle_df:
        hot = sh.groupBy("shingle").count().filter(F.col("count") > stop_shingle_df)
        sh = sh.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, "shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    out = (
        common.join(sizes.withColumnsRenamed({"id": "id_a", "n": "na"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n": "nb"}), "id_b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("na") + F.col("nb") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 64, k: int = 3
) -> DataFrame:
    """(id, sig: array<long>) MinHash signatures, Arrow-vectorized."""
    a_param, b_param = _minhash_params(num_hashes)

    def sig_batch(pdf_iter):
        import hashlib

        for pdf in pdf_iter:
            ids, sigs = [], []
            for _id, text in zip(pdf["id"], pdf["text"]):
                toks = [t for t in __import__("re").split(TOKEN_SPLIT, str(text).lower()) if t]
                sh = {
                    " ".join(toks[i : i + k]) for i in range(max(len(toks) - k + 1, 0))
                }
                if not sh:
                    sigs.append(np.full(num_hashes, _MERSENNE, dtype=np.uint64))
                    ids.append(_id)
                    continue
                hv = np.array(
                    [
                        int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")
                        for s in sh
                    ],
                    dtype=np.uint64,
                )
                # sig_i = min over shingles of (a_i*h + b_i) mod p
                prod = (hv[None, :] * a_param[:, None] + b_param[:, None]) % np.uint64(_MERSENNE)
                sigs.append(prod.min(axis=1))
                ids.append(_id)
            yield pd.DataFrame(
                {"id": ids, "sig": [s.astype(np.int64) for s in sigs]}
            )

    src = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    return src.mapInPandas(sig_batch, schema="id long, sig array<long>")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash+LSH near-dup pairs: band-bucket join for candidates, then
    signature-estimated Jaccard filter."""
    rows_per_band = num_hashes // bands
    # drop shingle-less docs (empty/too-short): they carry the sentinel
    # signature and would otherwise all collide as "perfect duplicates"
    sig = (
        minhash_signatures(df, id_col, text_col, num_hashes, k)
        .filter(F.expr(f"sig[0] <> {_MERSENNE}L"))
        .cache()
    )
    band_cols = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda bnd: F.struct(
                bnd.alias("band"),
                F.xxhash64(
                    F.slice(F.col("sig"), bnd * rows_per_band + 1, rows_per_band)
                ).alias("bucket"),
            ),
        )
    )
    buckets = sig.select("id", band_cols.alias("bb")).select(
        "id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sa = sig.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    # estimated Jaccard = fraction of equal signature slots (JVM-side expr)
    eq = F.expr(
        "aggregate(zip_with(sig_a, sig_b, (x, y) -> if(x = y, 1, 0)), 0, (acc, v) -> acc + v)"
    )
    est = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("est_jaccard", eq / F.lit(num_hashes))
        .drop("sig_a", "sig_b")
    )
    return est.filter(F.col("est_jaccard") >= threshold).select(
        "id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard")
    )


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash: long) 64-bit SimHash over unigram token hashes."""

    def sim_batch(pdf_iter):
        import hashlib
        import re as _re

        for pdf in pdf_iter:
            ids, hs = [], []
            for _id, text in zip(pdf["id"], pdf["text"]):
                toks = [t for t in _re.split(TOKEN_SPLIT, str(text).lower()) if t]
                acc = np.zeros(64, dtype=np.int64)
                for t in toks:
                    h = int.from_bytes(
                        hashlib.blake2b(t.encode(), digest_size=8).digest(), "big"
                    )
                    bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                    acc += np.where(bits == 1, 1, -1)
                sh = np.uint64(0)
                for i in range(64):
                    if acc[i] > 0:
                        sh |= np.uint64(1) << np.uint64(i)
                ids.append(_id)
                hs.append(np.int64(sh.astype(np.int64)))
            yield pd.DataFrame({"id": ids, "simhash": pd.array(hs, dtype="int64")})

    src = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    return src.mapInPandas(sim_batch, schema="id long, simhash long")


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming, blocked by
    16-bit chunks (a pair within distance 3 shares ≥1 of 4 chunks)."""
    sig = simhash_signatures(df, id_col, text_col).cache()
    chunk_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk"),
                F.shiftright(F.col("simhash"), i * 16)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("val"),
            )
            for i in range(4)
        ]
    )
    chunks = sig.select(
        "id", "simhash", F.explode(chunk_structs).alias("c")
    ).select("id", "simhash", F.col("c.chunk").alias("chunk"), F.col("c.val").alias("val"))
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (
        a.join(b, ["chunk", "val"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
