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


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window aggregation — the streaming twin of
    the `rel_events_window` batch gate (identical agg columns, so
    stream/batch parity is testable).  Works on a `readStream` source
    (append mode emits each window once, when the watermark passes its
    end; rows later than ``watermark`` behind the max seen event time
    are dropped) and on a batch DataFrame (watermark is a no-op).

    At 100 TB/day this is the shape that holds up: state is bounded by
    (windows in watermark horizon × event types), partial aggregation
    happens map-side per micro-batch, and the shuffle key
    (window, event_type) is low-cardinality."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


SESSION_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long"
)
_SESSION_STATE_SCHEMA = "start double, last double, n long"


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based sessionization as a custom STATEFUL streaming operator
    (`applyInPandasWithState`, event-time timeout) — the streaming twin
    of the `rel_sessionize` batch gate's session derivation.

    One state cell per user holds only the OPEN session (start, last
    event time, count).  Each micro-batch extends or closes it: a new
    event within ``gap_seconds`` of the last extends the session; a
    larger gap closes the old session (emitted) and opens a new one.
    When the watermark passes last+gap the event-time timeout fires and
    the final session is emitted — so every session is emitted exactly
    once, sessions never straddle the output.

    Ordering contract (same as Spark's own sessionization example):
    events are sorted within a batch; cross-batch ordering is the
    source's responsibility up to the watermark (later-than-watermark
    rows are dropped by Spark before reaching the operator).

    Scale shape: state per key is three scalars — memory is O(active
    users in the gap horizon), not O(events); the only shuffle is the
    groupBy(user_id) into the stateful operator, Arrow-batched.
    """
    import pandas as pd  # noqa: PLC0415 — Arrow path only

    from pyspark.sql.streaming.state import GroupStateTimeout

    # integer MICROSECONDS throughout: float epoch-seconds leave
    # nonzero sub-microsecond nanos after the ns->s division, and the
    # Arrow writer rejects the resulting ns->us cast as unsafe on any
    # real (sub-second-precision) timestamp.  Epoch-us (~1.7e15) is
    # exactly representable in the double state columns (< 2^53).
    gap = int(gap_seconds) * 1_000_000

    def _emit(user_id, sessions):
        return pd.DataFrame(
            {
                "user_id": [user_id] * len(sessions),
                "session_start": [
                    pd.Timestamp(int(s), unit="us") for s, _, _ in sessions
                ],
                "session_end": [
                    pd.Timestamp(int(e), unit="us") for _, e, _ in sessions
                ],
                "n_events": [c for _, _, c in sessions],
            }
        )

    def fn(key, pdf_iter, state):
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield _emit(user_id, [(start, last, n)])
            return
        ts = []
        for pdf in pdf_iter:
            # int64 ns -> epoch us: tz-independent, unlike
            # Timestamp.timestamp() whose naive handling varies
            ts.extend(pdf["ts"].astype("int64") // 1000)
        ts.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        closed = []
        for t in ts:
            if last is None:
                start, last, n = t, t, 1
            elif t - last > gap:
                closed.append((start, last, n))
                start, last, n = t, t, 1
            elif t <= last:
                # allowed-late row (admitted by the watermark) older than
                # the open session's last event: clamp instead of
                # rewinding `last` — a rewound `last` could spuriously
                # split the session or emit a wrong session_end on the
                # next batch (ADVICE r5)
                start, n = min(start, t), n + 1
            else:
                last, n = t, n + 1
        if last is not None:
            # plain Python floats: numpy int64 into the double state
            # columns is rejected by the Arrow state serializer
            state.update((float(start), float(last), int(n)))
            # fire when the watermark passes the open session's close
            # point (clamped above the current watermark — a session
            # fed entirely by allowed-late rows could otherwise compute
            # a timeout Spark rejects as already passed)
            state.setTimeoutTimestamp(
                max(
                    int(last + gap) // 1000 + 1,
                    state.getCurrentWatermarkMs() + 1,
                )
            )
        if closed:
            yield _emit(user_id, closed)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            SESSION_OUT_SCHEMA,
            _SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


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
