"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Generates the input table of exactly the shape mandated by
``BASELINE.json input_hint``: ``(repo, path, commit, lang, content)``, then
derives the engine's document columns (SURVEY.md §1.1 mapping of the
reference schema at sphinx.conf:4-21):

- ``docid = md5_low64(repo, path, commit)``  (analog of RT BIGINT id,
  SphinxSearchEngine_class.php:377,524; md5 so the DuckDB oracle can
  recompute it in SQL)
- ``content_sha = sha256(content)``          (per-row invariant)
- ``category = [repo, lang]``                (ArrayType, replaces the
  '|'-joined string of SphinxSearchEngine_class.php:371-372)
- ``category_search``                        (mangled tokens, :348-359)
- ``date_insert <= date_modify``             (sphinx.conf:13-14), pinned
  deterministic timestamps (no wall clock)

Content is seeded token soup per doc id, mixing English/Russian words,
blend-char identifiers, 1-char droppables, plus planted terms:
- ``needleuniq``      in exactly one doc  (rare-term tests)
- ``hotterm``         in ~50% of docs     (skew/salting tests)
- ``alpha beta``      adjacent pair       (phrase tests)
Generation is distributed (mapInPandas over spark.range) and depends
only on doc index, never on partitioning — identical at any parallelism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from sphinxsearchengine_spark.config import FIELD_SIZE_CAP
from sphinxsearchengine_spark.text.tokenizer import mangle_category_col

SEED = 42

EN_WORDS = (
    "query engine index search token document ranking score field weight "
    "partition shuffle broadcast column vector batch stream window merge "
    "join filter group order limit offset parse plan optimize execute "
    "running searches indexed matching relational generalization caching "
    "buffer memory disk segment compress encode decode posting dictionary "
    "checkpoint lineage manifest resume cluster executor driver task stage"
).split()

RU_WORDS = (
    "поиск запрос индекс слово документ база данные система машина книга "
    "страница категория заголовок текст число время работа файл строка "
    "таблица функция модуль процесс память диск сеть узел кластер задача"
).split()

IDENT_HEADS = ["get", "set", "build", "parse", "read", "write", "merge", "scan"]
IDENT_TAILS = ["index", "config", "buffer", "token", "field", "stats", "batch"]
BLENDS = "_-&+@$"

LANGS = ["python", "php", "rust", "go", "java"]

CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"


def _doc_content(rng: np.random.RandomState, i: int) -> str:
    n = 40 + int(rng.randint(0, 160))
    words = []
    for _ in range(n):
        r = rng.randint(0, 100)
        if r < 55:
            words.append(EN_WORDS[rng.randint(0, len(EN_WORDS))])
        elif r < 70:
            words.append(RU_WORDS[rng.randint(0, len(RU_WORDS))])
        elif r < 85:
            blend = BLENDS[rng.randint(0, len(BLENDS))]
            words.append(
                IDENT_HEADS[rng.randint(0, len(IDENT_HEADS))]
                + blend
                + IDENT_TAILS[rng.randint(0, len(IDENT_TAILS))]
            )
        elif r < 92:
            words.append("xyzq"[rng.randint(0, 4)])  # 1-char droppables
        else:
            words.append(str(rng.randint(0, 9999)))
    if i == 0:
        words.insert(int(rng.randint(0, len(words))), "needleuniq")
    if rng.randint(0, 2) == 0:
        words.insert(int(rng.randint(0, len(words))), "hotterm")
    if rng.randint(0, 4) == 0:
        k = int(rng.randint(0, len(words)))
        words[k:k] = ["alpha", "beta"]
    return " ".join(words)


def _gen_batch(pdf_iter):
    for pdf in pdf_iter:
        rows = []
        for i in pdf["id"].to_numpy():
            rng = np.random.RandomState(SEED + int(i))
            repo = f"org{i % 7}/repo{i % 50}"
            lang = LANGS[int(i) % len(LANGS)]
            path = f"src/mod{i % 13}/file_{i}.{lang[:2]}"
            commit = "".join("0123456789abcdef"[b % 16] for b in rng.randint(0, 256, 40))
            rows.append((repo, path, commit, lang, _doc_content(rng, int(i))))
        yield pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def generate_corpus(spark: SparkSession, n_docs: int, partitions: int = 8) -> DataFrame:
    """Distributed deterministic corpus of `n_docs` files."""
    return spark.range(0, n_docs, numPartitions=partitions).mapInPandas(
        _gen_batch, schema=CORPUS_SCHEMA
    )


# Pinned epoch window for deterministic timestamps (no wall clock):
# date_insert in [2020-09-13, +3y), date_modify in [insert, insert+1y).
_TS_BASE = 1_600_000_000
_TS_SPAN = 94_608_000  # 3 years
_TS_MOD_SPAN = 31_536_000  # 1 year

# Pinned "query time" used by tests/bench for the freshness ranker term
# (the reference's now() at SphinxSearchEngine_class.php:113 — pinned for
# determinism per SURVEY.md §7 hard-part (c)).
PINNED_NOW = _TS_BASE + _TS_SPAN + _TS_MOD_SPAN


def _md5_i64(col, lo: bool = True):
    """Signed-int64 view of the low (or high) 64 bits of md5(col).

    Chosen over xxhash64 so the driver's DuckDB oracle can recompute
    docids and date attributes in SQL — ('0x' || substr(md5(k), 17, 16))
    ::UBIGINT gives the identical unsigned value; dispersion is
    equivalent (uniform over the 64-bit space)."""
    h = F.md5(col)
    part = F.substring(h, 17, 16) if lo else F.substring(h, 1, 16)
    d = F.conv(part, 16, 10).cast("decimal(20,0)")
    wrap = F.lit("18446744073709551616").cast("decimal(38,0)")
    half = F.lit("9223372036854775808").cast("decimal(38,0)")
    return (
        F.when(d >= half, (d.cast("decimal(38,0)") - wrap)).otherwise(d)
    ).cast("long")


def derive_documents(corpus: DataFrame) -> DataFrame:
    """Corpus table -> engine document table (all native column fns).

    docid and the date attributes are md5-derived (one digest: docid =
    low 64 bits, date entropy = high 64 bits) so the DuckDB correctness
    oracle can reproduce attribute-dependent outputs (ordering,
    freshness-ranked scores) value-for-value in SQL.

    Everything here is native column functions — the category mangling
    runs through mangle_category_col (translate+regexp_replace), not a
    Python UDF, so the whole derivation stays inside whole-stage codegen
    (plan-tested: no BatchEvalPython, tests/test_plans.py)."""
    key = F.concat_ws("\x1f", "repo", "path", "commit")
    return (
        corpus.withColumn("docid", _md5_i64(key, lo=True))
        .withColumn("_dateseed", _md5_i64(key, lo=False))
        .withColumn("content", F.substring("content", 1, FIELD_SIZE_CAP))
        .withColumn("content_sha", F.sha2(F.col("content"), 256))
        .withColumn("category", F.array("repo", "lang"))
        .withColumn(
            "category_search",
            F.concat_ws(
                " ",
                mangle_category_col(F.col("repo")),
                mangle_category_col(F.col("lang")),
            ),
        )
        .withColumn(
            "date_insert",
            F.lit(_TS_BASE) + F.pmod("_dateseed", F.lit(_TS_SPAN)),
        )
        .withColumn(
            "date_modify",
            F.col("date_insert") + F.pmod("docid", F.lit(_TS_MOD_SPAN)),
        )
        .drop("_dateseed")
    )
