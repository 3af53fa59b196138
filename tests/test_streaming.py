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


# ---- watermarked windowed agg + stateful sessionization -----------------

def _write_event_file(path: str, rows, mtime: float):
    """One parquet FILE per micro-batch (maxFilesPerTrigger=1), mtime
    forced so the file source processes batches in our order."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ids, ts, users, types, vals = zip(*rows)
    table = pa.table(
        {
            "event_id": pa.array(ids, pa.int64()),
            "ts": pa.array(
                [int(t * 1_000_000) for t in ts], pa.timestamp("us", tz="UTC")
            ),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(types, pa.string()),
            "value": pa.array(vals, pa.float64()),
        }
    )
    pq.write_table(table, path)
    os.utime(path, (mtime, mtime))


EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double"
)

H = 3600.0
T0 = 1_700_000_000 - (1_700_000_000 % H)  # aligned to an hour boundary


def _run_stream(spark, src_dir, transform, sink_name):
    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(src_dir)
    )
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(f"SELECT * FROM {sink_name}")


def test_windowed_event_counts_stream(spark, tmp_path):
    """Append-mode watermarked windows: each window emits exactly once
    (when the watermark passes its end) and a row later than the
    watermark is DROPPED — the two semantics batch mode can't show."""
    from sphinxsearchengine_spark.streaming import windowed_event_counts

    src = tmp_path / "events_src"
    src.mkdir()
    # batch 1: A@10:00(v=1), A@10:10(v=2), B@10:20(v=4), A@11:45(v=3)
    #   -> watermark = 11:45 - 30min = 11:15 > 11:00, so the hour-10
    #      windows CLOSE (and emit) at the end of this batch
    _write_event_file(
        str(src / "b1.parquet"),
        [
            (1, T0 + 0, 1, "A", 1.0),
            (2, T0 + 600, 1, "A", 2.0),
            (3, T0 + 1200, 2, "B", 4.0),
            (4, T0 + H + 2700, 1, "A", 3.0),
        ],
        1e9,
    )
    # batch 2: A@12:40(v=5) -> watermark 12:10: hour 11 emits
    _write_event_file(
        str(src / "b2.parquet"), [(6, T0 + 2 * H + 2400, 1, "A", 5.0)],
        1e9 + 10,
    )
    # batch 3 sentinel: Z@15:00 -> watermark 14:30: hour 12 emits
    _write_event_file(
        str(src / "b3.parquet"), [(7, T0 + 5 * H, 9, "Z", 0.0)], 1e9 + 20
    )
    # batch 4: LATE A@10:05 into the long-closed hour-10 window ->
    # dropped (numRowsDroppedByWatermark).  NB the drop watermark lags
    # one batch behind the progress watermark, so the late row must
    # arrive >=2 batches after its window's data to demonstrate this.
    _write_event_file(
        str(src / "b4.parquet"), [(5, T0 + 300, 1, "A", 9.0)], 1e9 + 30
    )
    # batch 5 sentinel: flushes any window the late row might have
    # (wrongly) re-opened, so the assertion below would catch it
    _write_event_file(
        str(src / "b5.parquet"), [(8, T0 + 8 * H, 9, "Z", 0.0)], 1e9 + 40
    )

    out = _run_stream(
        spark,
        str(src),
        lambda s: windowed_event_counts(s, "1 hour", "30 minutes"),
        "win_sink",
    )
    got = {
        (int(r.window_start.timestamp()), r.event_type, r.n, r.total_value)
        for r in out.collect()
        if r.event_type != "Z"  # sentinels' own windows are irrelevant
    }
    assert got == {
        (int(T0), "A", 2, 3.0),          # late v=9.0 row NOT counted
        (int(T0), "B", 1, 4.0),
        (int(T0 + H), "A", 1, 3.0),
        (int(T0 + 2 * H), "A", 1, 5.0),
    }


def test_sessionize_stream_matches_batch_semantics(spark, tmp_path):
    """applyInPandasWithState gap sessionization: sessions close either
    by an explicit gap within the data or by event-time TIMEOUT when
    the watermark passes last+gap; each closed session emits once."""
    from sphinxsearchengine_spark.streaming import sessionize_stream

    src = tmp_path / "sess_src"
    src.mkdir()
    # user1: 10:00, 10:10 (one session); user2: 10:05 (lone event)
    _write_event_file(
        str(src / "b1.parquet"),
        [
            (1, T0 + 0, 1, "A", 0.0),
            (2, T0 + 600, 1, "A", 0.0),
            (3, T0 + 300, 2, "A", 0.0),
        ],
        1e9,
    )
    # user1 again at 11:30 -> 80min > 30min gap closes session 1 inline
    _write_event_file(
        str(src / "b2.parquet"), [(4, T0 + 5400, 1, "A", 0.0)], 1e9 + 10
    )
    # sentinels advance the watermark so both open sessions time out
    _write_event_file(
        str(src / "b3.parquet"), [(5, T0 + 3 * H, 99, "A", 0.0)], 1e9 + 20
    )
    _write_event_file(
        str(src / "b4.parquet"), [(6, T0 + 6 * H, 99, "A", 0.0)], 1e9 + 30
    )

    out = _run_stream(
        spark,
        str(src),
        lambda s: sessionize_stream(s, gap_seconds=1800,
                                    watermark="30 minutes"),
        "sess_sink",
    )
    got = {
        (
            r.user_id,
            int(r.session_start.timestamp()),
            int(r.session_end.timestamp()),
            r.n_events,
        )
        for r in out.collect()
        if r.user_id != 99  # sentinel user's sessions are irrelevant
    }
    assert got == {
        (1, int(T0), int(T0 + 600), 2),        # closed by in-data gap
        (1, int(T0 + 5400), int(T0 + 5400), 1),  # closed by timeout
        (2, int(T0 + 300), int(T0 + 300), 1),    # closed by timeout
    }


def test_windowed_event_counts_batch_parity(spark):
    """The same transform on a BATCH DataFrame equals a plain window
    agg (watermark is a no-op) — stream/batch unification."""
    from sphinxsearchengine_spark.streaming import windowed_event_counts

    rows = [
        (1, T0 + 0, 1, "A", 1.0),
        (2, T0 + 600, 1, "A", 2.0),
        (3, T0 + 1200, 2, "B", 4.0),
        (4, T0 + H + 300, 1, "A", 3.0),
    ]
    df = spark.createDataFrame(
        [(i, __import__("datetime").datetime.fromtimestamp(
            t, __import__("datetime").timezone.utc), u, e, v)
         for i, t, u, e, v in rows],
        EV_SCHEMA,
    )
    got = {
        (int(r.window_start.timestamp()), r.event_type, r.n, r.total_value)
        for r in windowed_event_counts(df, "1 hour", "30 minutes").collect()
    }
    assert got == {
        (int(T0), "A", 2, 3.0),
        (int(T0), "B", 1, 4.0),
        (int(T0 + H), "A", 1, 3.0),
    }


def test_sessionize_stream_parity_on_real_events(spark, tmp_path):
    """Cross-validation on the driver's events table (sf0.001, ~3k
    rows): streaming gap-sessionization (single data batch + sentinel
    flush) must yield exactly the batch window-lag session set."""
    import shutil

    from pyspark.sql import Window
    from sphinxsearchengine_spark.streaming import sessionize_stream

    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    src_file = os.path.join(sf, "events.parquet")
    if not os.path.exists(src_file):
        import pytest
        pytest.skip("driver testdata not present")

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    # batch reference: session id by gap > 1800s within user
    ev = spark.read.schema(schema).parquet(src_file)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    batch = (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev_ts").isNull()
                | (F.col("ts").cast("long") - F.col("prev_ts").cast("long")
                   > 1800),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "sess_id",
            F.sum("new_sess").over(
                Window.partitionBy("user_id").orderBy("ts", "event_id")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "sess_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    expect = sorted(
        (r.user_id, r.n_events) for r in batch.collect()
    )

    # streaming side: the whole table is ONE micro-batch (every user's
    # events arrive together, so in-batch sorting covers ordering); a
    # far-future sentinel then advances the watermark past every open
    # session's timeout
    src = tmp_path / "real_events"
    src.mkdir()
    shutil.copyfile(src_file, src / "b1.parquet")
    os.utime(src / "b1.parquet", (1e9, 1e9))
    max_ts = ev.agg(F.max(F.col("ts").cast("long"))).collect()[0][0]
    _write_event_file(
        str(src / "b2.parquet"),
        [(10**9, max_ts + 10 * 24 * 3600, 999_999_999, "SENTINEL", 0.0)],
        1e9 + 10,
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(src))
    )
    q = (
        sessionize_stream(stream, gap_seconds=1800, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("sess_real")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted(
        (r.user_id, r.n_events)
        for r in spark.sql("SELECT * FROM sess_real").collect()
        if r.user_id != 999_999_999
    )
    assert got == expect
