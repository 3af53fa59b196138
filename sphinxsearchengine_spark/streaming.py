"""Structured-Streaming incremental indexing (SURVEY.md §3.2).

The reference applies edits synchronously per page save
(SphinxSearchUpdate.php:21-65 → REPLACE INTO / DELETE).  At cluster
scale the idiomatic Spark shape is a micro-batch stream: edit events
land as files (or Kafka in production), `readStream` picks them up, and
`foreachBatch` applies each batch transactionally to the index via the
lifecycle ops — upserts become a delta segment, deletes become
tombstones, both visible to the next query.

Edit-event schema (op: 'replace' | 'delete' + the corpus columns):

    op string, repo string, path string, commit string, lang string,
    content string
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from sphinxsearchengine_spark.config import EngineConfig
from sphinxsearchengine_spark.corpus import derive_documents

EDIT_SCHEMA = (
    "op string, repo string, path string, commit string, lang string, "
    "content string"
)


def apply_edit_batch(
    spark: SparkSession, index_dir: str, batch: DataFrame,
    cfg: EngineConfig | None = None,
) -> dict:
    """Apply one micro-batch of edit events (idempotent per batch):
    'replace' rows → delta-segment upsert; 'delete' rows → tombstones."""
    from sphinxsearchengine_spark.index.lifecycle import delete, upsert

    batch = batch.cache()
    try:
        replaces = batch.filter(F.col("op") == "replace").drop("op")
        n_rep = replaces.count()
        stats = {"replaced": n_rep, "deleted": 0}
        if n_rep:
            upsert(spark, index_dir, derive_documents(replaces), cfg)
        deletes = batch.filter(F.col("op") == "delete")
        n_del = deletes.count()
        if n_del:
            dead = derive_documents(deletes.drop("op")).select("docid")
            delete(spark, index_dir, dead)
            stats["deleted"] = n_del
        return stats
    finally:
        batch.unpersist()


def start_update_stream(
    spark: SparkSession,
    index_dir: str,
    edits_path: str,
    checkpoint_path: str,
    cfg: EngineConfig | None = None,
    trigger_seconds: int | None = None,
):
    """readStream over an edit-event directory → foreachBatch lifecycle
    apply.  The checkpoint gives exactly-once batch application across
    restarts (Spark's streaming offset log + our idempotent manifests).
    """
    stream = (
        spark.readStream.schema(EDIT_SCHEMA).format("parquet").load(edits_path)
    )

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        apply_edit_batch(spark, index_dir, batch_df, cfg)

    writer = stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()
