"""SearchUpdate-hook analog: pluggable preprocessing rewrites only the
indexed text; stored content/sha are untouched."""

from __future__ import annotations

from pyspark.sql import functions as F

from sphinxsearchengine_spark.config import EngineConfig
from sphinxsearchengine_spark.corpus import PINNED_NOW, derive_documents, generate_corpus
from sphinxsearchengine_spark.index.builder import build_index
from sphinxsearchengine_spark.query.executor import score_matches, search


def test_preprocess_hook(spark, tmp_path):
    idx = str(tmp_path / "idx")
    docs = derive_documents(generate_corpus(spark, 60, partitions=2))
    build_index(
        spark, docs, idx, EngineConfig(term_buckets=8), salt_factor=2,
        preprocess=lambda c: F.concat(c, F.lit(" hookplanted")),
    )
    # the injected token is searchable…
    hits = score_matches(spark, idx, "hookplanted", now_ts=PINNED_NOW).count()
    assert hits == 60
    # …but stored content/sha are the originals
    row = search(spark, idx, "hookplanted", limit=1, now_ts=PINNED_NOW).collect()[0]
    orig = {r.docid: r.content_sha for r in docs.collect()}
    assert row.content_sha == orig[row.docid]
