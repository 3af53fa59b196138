"""Structured-Streaming micro-batch indexing test (SURVEY.md §3.2)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sphinxsearchengine_spark.config import EngineConfig
from sphinxsearchengine_spark.corpus import (
    PINNED_NOW,
    derive_documents,
    generate_corpus,
)
from sphinxsearchengine_spark.index.builder import build_index
from sphinxsearchengine_spark.query.executor import score_matches
from sphinxsearchengine_spark.streaming import EDIT_SCHEMA, start_update_stream

CFG = EngineConfig(term_buckets=8)


def test_stream_updates_index(spark, tmp_path):
    idx = str(tmp_path / "idx")
    docs = derive_documents(generate_corpus(spark, 80, partitions=2))
    build_index(spark, docs, idx, CFG, salt_factor=2)

    edits = str(tmp_path / "edits")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(edits)

    # batch 1: a replace introducing a new token + a brand-new doc
    target = docs.orderBy("docid").limit(1).collect()[0]
    batch1 = spark.createDataFrame(
        [
            ("replace", target.repo, target.path, target.commit, target.lang,
             "streamedtoken body of the replaced doc"),
            ("replace", "org9/streamrepo", "src/new.py", "f" * 40, "python",
             "brand new streamed document streamedtoken"),
        ],
        EDIT_SCHEMA,
    )
    batch1.write.mode("append").parquet(edits)

    q = start_update_stream(spark, idx, edits, ckpt, CFG)
    q.awaitTermination(300)

    got = {
        r.docid
        for r in score_matches(spark, idx, "streamedtoken", now_ts=PINNED_NOW).collect()
    }
    assert target.docid in got and len(got) == 2

    # batch 2: delete the replaced doc; restart stream from checkpoint —
    # already-applied batch 1 must not re-apply
    batch2 = spark.createDataFrame(
        [("delete", target.repo, target.path, target.commit, target.lang, "")],
        EDIT_SCHEMA,
    )
    batch2.write.mode("append").parquet(edits)
    q2 = start_update_stream(spark, idx, edits, ckpt, CFG)
    q2.awaitTermination(300)

    got2 = {
        r.docid
        for r in score_matches(spark, idx, "streamedtoken", now_ts=PINNED_NOW).collect()
    }
    assert target.docid not in got2 and len(got2) == 1
