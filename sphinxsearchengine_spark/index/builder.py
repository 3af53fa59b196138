"""Bulk inverted-index build (SURVEY.md §3.3, reference S1/S2).

The reference's bulk path (`build_index`,
SphinxSearchEngine_class.php:397-453) streams a SQL join through batched
``REPLACE INTO`` statements into searchd.  Spark-first redesign:

    documents DF
      → mapInPandas tokenize (Arrow batches; unique-token stem cache —
        the vectorized analog of the reference's per-row PHP loop)
      → postings rows (term, field, docid, tf, varbyte positions, attrs)
      → repartition on (term-bucket, docid-salt)       [the ONE shuffle]
      → sortWithinPartitions(term, field, docid)
      → write parquet partitioned by bucket
    dictionary = re-read postings → two-level agg (docid-exact df/hits)
    docs table = hash-partitioned + docid-sorted files (row-group
        min/max pruning for hydration joins, no sampling pass)

Salting: the docid-salt spreads every term — hot or not — across
``salt_factor`` reducers per bucket, so a term occurring in 50% of all
docs (see FIXTURES.md planted ``hotterm``) cannot pin a single reducer;
readers treat each bucket as `salt_factor` sorted runs.  This is the
explicit skew defusal mandated by the north rule; AQE remains enabled as
backstop.

Resume: each build writes a per-stage lineage manifest
(manifests/<seg>.json) recording stage → output path + row count +
config; a re-run with the same manifest skips completed stages
(checkpointed segment state, north rule).
"""

from __future__ import annotations

import json
import os
import time

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from sphinxsearchengine_spark import codec
from sphinxsearchengine_spark.config import EngineConfig, FIELD_NAMES, FIELDS
from sphinxsearchengine_spark.index.layout import (
    IndexLayout,
    IndexMeta,
    POSTINGS_SCHEMA,
)

# Document columns fed to the tokenizer, in field order (SURVEY.md §1.5):
# content -> text(0), path -> title(1), category_search -> category_search(2).
_FIELD_SOURCE = {"text": "content", "title": "path", "category_search": "category_search"}


def _tokenize_batch(pdf_iter):
    """Arrow-batch tokenizer: documents -> postings rows.

    Exact-word dual indexing (sphinx.conf:19) is row-merged: a surface
    form whose stem equals itself increments the stem row's ``exact_tf``
    instead of emitting a second '=surface' row; only stem-changing
    surfaces get their own '=surface' row.  This cuts postings volume
    ~25-40% with identical query semantics.

    Python-level work is bounded by *unique tokens* per batch (stemming is
    lru-cached); the per-doc loop only builds postings dicts.
    """
    from sphinxsearchengine_spark.text.tokenizer import tokenize, stem_token
    from sphinxsearchengine_spark.config import EXACT_PREFIX

    for pdf in pdf_iter:
        out_term, out_field, out_docid, out_tf, out_etf = [], [], [], [], []
        out_pos, out_lang, out_di, out_dm = [], [], [], []
        for row in pdf.itertuples(index=False):
            for fname in FIELD_NAMES:
                text = getattr(row, _FIELD_SOURCE[fname])
                if not text:
                    continue
                fid = FIELDS[fname]
                acc: dict[str, list] = {}  # term -> [positions, exact_tf]
                for pos, forms in tokenize(text):
                    seen: set[str] = set()
                    for raw in forms:
                        stem = stem_token(raw)
                        if stem not in seen:
                            seen.add(stem)
                            slot = acc.setdefault(stem, [[], 0])
                            slot[0].append(pos)
                            if raw == stem:
                                slot[1] += 1
                        if stem != raw:
                            ex = EXACT_PREFIX + raw
                            if ex not in seen:
                                seen.add(ex)
                                slot = acc.setdefault(ex, [[], 0])
                                slot[0].append(pos)
                                slot[1] += 1
                for term, (positions, etf) in acc.items():
                    out_term.append(term)
                    out_field.append(fid)
                    out_docid.append(row.docid)
                    out_tf.append(len(positions))
                    out_etf.append(etf)
                    out_pos.append(codec.delta_encode_small(positions))
                    out_lang.append(row.lang)
                    out_di.append(row.date_insert)
                    out_dm.append(row.date_modify)
        yield pd.DataFrame(
            {
                "term": out_term,
                "field": pd.array(out_field, dtype="int32"),
                "docid": pd.array(out_docid, dtype="int64"),
                "tf": pd.array(out_tf, dtype="int32"),
                "exact_tf": pd.array(out_etf, dtype="int32"),
                "pos_vb": out_pos,
                "lang": out_lang,
                "date_insert": pd.array(out_di, dtype="int64"),
                "date_modify": pd.array(out_dm, dtype="int64"),
            }
        )


class _split_hint:
    """Temporarily size parquet input splits so a stage reaches the
    cluster's full parallelism.  Spark bins small files into splits of
    maxPartitionBytes (+4 MB open cost each): a small test corpus would
    otherwise tokenize on ~4 tasks no matter how many cores exist.  At
    production scale (>=128 MB files) the defaults already split fine
    and this becomes a no-op."""

    def __init__(self, spark, path: str, parallelism: int):
        self.spark = spark
        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                total += os.path.getsize(os.path.join(root, f))
        self.target = max(total // max(parallelism, 1) + 1, 1 << 20)

    def __enter__(self):
        conf = self.spark.conf
        self.old_mpb = conf.get("spark.sql.files.maxPartitionBytes")
        self.old_open = conf.get("spark.sql.files.openCostInBytes")
        if self.target < 128 * 1024 * 1024:
            conf.set("spark.sql.files.maxPartitionBytes", str(self.target))
            conf.set("spark.sql.files.openCostInBytes", "0")
        return self

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.files.maxPartitionBytes", self.old_mpb)
        self.spark.conf.set("spark.sql.files.openCostInBytes", self.old_open)


def _manifest_load(path: str) -> dict:
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {"stages": {}}


def _manifest_save(path: str, manifest: dict) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    os.replace(tmp, path)


def build_segment(
    spark: SparkSession,
    documents: DataFrame,
    index_dir: str,
    seg: str,
    cfg: EngineConfig,
    salt_factor: int = 4,
    preprocess=None,
) -> dict:
    """Tokenize + write one immutable segment; resumable per stage.

    ``preprocess``: optional Column-expression hook ``f(content_col) ->
    Column`` applied to the text field before indexing — the analog of
    the reference's ``SearchUpdate`` extension hook that lets plugins
    rewrite indexed text (SphinxSearchEngine_class.php:426,
    SphinxSearchUpdate.php:58), kept declarative so Catalyst still
    pipelines it into the scan."""
    layout = IndexLayout(index_dir)
    man_path = layout.manifest(seg)
    manifest = _manifest_load(man_path)
    stages = manifest["stages"]
    nb = cfg.term_buckets

    def done(stage: str) -> bool:
        return stage in stages and stages[stage].get("ok")

    def mark(stage: str, **info) -> None:
        stages[stage] = {"ok": True, "ts": time.time(), **info}
        _manifest_save(man_path, manifest)

    doc_cols = [
        "docid", "repo", "path", "commit", "lang", "content", "content_sha",
        "category", "category_search", "date_insert", "date_modify",
    ]

    if not done("docs"):
        # Hash-partition + per-file docid sort: files are docid-sorted so
        # parquet row-group min/max stats prune hydration lookups at
        # production row-group counts, WITHOUT repartitionByRange's
        # sampling pass (which would execute the upstream input twice —
        # the source may be an expensive derivation).
        (
            documents.select(*doc_cols)
            .repartition(max(spark.sparkContext.defaultParallelism, nb // 2), "docid")
            .sortWithinPartitions("docid")
            .write.mode("overwrite")
            .parquet(layout.docs(seg))
        )
        n_docs = spark.read.parquet(layout.docs(seg)).count()
        mark("docs", path=layout.docs(seg), n_docs=n_docs)

    parallelism = spark.sparkContext.defaultParallelism

    if not done("postings"):
        with _split_hint(spark, layout.docs(seg), parallelism * 2):
            tok_src = spark.read.parquet(layout.docs(seg)).select(
                "docid", "path", "lang", "content", "category_search",
                "date_insert", "date_modify",
            )
            if preprocess is not None:
                # rewrite only the INDEXED text; the stored docs table —
                # and with it the content_sha invariant — is untouched,
                # matching the reference hook's semantics
                tok_src = tok_src.withColumn(
                    "content", preprocess(F.col("content"))
                )
            tok = tok_src.mapInPandas(_tokenize_batch, schema=POSTINGS_SCHEMA)
            tok = tok.withColumn(
                "bucket", F.pmod(F.xxhash64("term"), F.lit(nb)).cast("int")
            ).withColumn(
                "salt", F.pmod(F.xxhash64("docid"), F.lit(salt_factor)).cast("int")
            )
            # bucket leads the sort so the dynamic-partition writer sees its
            # required ordering (no second sort) and files stay
            # (term, field, docid)-sorted inside each bucket — the sorted
            # runs the WAND/merge readers rely on.
            (
                tok.repartition(nb * salt_factor, "bucket", "salt")
                .drop("salt")
                .sortWithinPartitions("bucket", "term", "field", "docid")
                .write.mode("overwrite")
                .partitionBy("bucket")
                .parquet(layout.postings(seg))
            )
        mark("postings", path=layout.postings(seg), salt_factor=salt_factor)

    if not done("dict"):
        with _split_hint(spark, layout.postings(seg), parallelism * 2):
            post = spark.read.parquet(layout.postings(seg))
            # Two-level agg: exact per-doc tf first, then per-term stats —
            # df counts documents (not doc×field pairs), max_tf bounds the
            # whole-doc tf for MaxScore/WAND pruning.
            per_doc = post.groupBy("bucket", "term", "docid").agg(
                F.sum("tf").alias("tfd"), F.sum("exact_tf").alias("etfd")
            )
            dic = per_doc.groupBy("bucket", "term").agg(
                F.count(F.lit(1)).alias("df"),
                F.sum("tfd").alias("hits"),
                F.max("tfd").alias("max_tf"),
                F.count_if(F.col("etfd") > 0).alias("exact_df"),
                F.sum("etfd").alias("exact_hits"),
            )
            (
                dic.repartition(nb, "bucket")
                .sortWithinPartitions("bucket", "term")
                .write.mode("overwrite")
                .partitionBy("bucket")
                .parquet(layout.dict(seg))
            )
        mark("dict", path=layout.dict(seg))

    return stages


def build_index(
    spark: SparkSession,
    documents: DataFrame,
    index_dir: str,
    cfg: EngineConfig | None = None,
    salt_factor: int = 4,
    preprocess=None,
) -> IndexMeta:
    """Full bulk build: one base segment + fresh meta (reference S1/S2,
    auto-bootstrap analog of init_index, SphinxSearchEngine_class.php:484-535).
    """
    cfg = cfg or EngineConfig()
    os.makedirs(index_dir, exist_ok=True)
    layout = IndexLayout(index_dir)
    seg = "seg_00000"
    stages = build_segment(
        spark, documents, index_dir, seg, cfg, salt_factor, preprocess
    )
    meta = IndexMeta(
        n_docs=stages["docs"]["n_docs"],
        term_buckets=cfg.term_buckets,
        segments=[{"name": seg, "seq": 0, "n_docs": stages["docs"]["n_docs"]}],
        next_seq=1,
    )
    meta.save(index_dir)
    # empty tombstones
    spark.createDataFrame([], "docid long, asof_seq int").write.mode(
        "overwrite"
    ).parquet(layout.tombstones())
    return meta
