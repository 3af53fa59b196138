"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery — schema, batching, partition sizing, UDF
signatures — is real and tested; the actual media decode is STUBBED
(this container has no image/audio libraries).  `decode_stub=True`
swaps the decoder for a deterministic fake (hash-derived features) so
pipelines remain end-to-end testable; wiring a real decoder means
replacing `_decode_image_stub` only.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "duration_ms int"
)

FEATURE_DIM = 16


def synth_media(spark, n: int, partitions: int = 4) -> DataFrame:
    """Deterministic fake media table (binary payload = seeded bytes)."""

    def gen(pdf_iter):
        for pdf in pdf_iter:
            rows = []
            for i in pdf["id"]:
                rng = np.random.RandomState(1000 + int(i))
                kind = ["image", "audio", "video"][int(i) % 3]
                payload = rng.bytes(64 + int(rng.randint(0, 192)))
                rows.append(
                    (
                        int(i), kind, payload,
                        int(rng.randint(16, 4096)), int(rng.randint(16, 4096)),
                        int(rng.randint(100, 600000)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "payload", "width", "height", "duration_ms"],
            )

    return spark.range(0, n, numPartitions=partitions).mapInPandas(
        gen, schema=MEDIA_SCHEMA
    )


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """Deterministic fake 'decode + feature extract': FEATURE_DIM floats
    derived from a content hash.  Replace with a real decoder
    (PIL/torchvision) in production."""
    h = hashlib.blake2b(payload, digest_size=FEATURE_DIM * 4).digest()
    return (
        np.frombuffer(h, dtype=np.uint32).astype(np.float64) / np.float64(2**32)
    ).astype(np.float32)


def extract_features(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """media table -> (media_id, kind, feature: array<float>).

    mapInPandas keeps Arrow batches bounded by bytes not rows (media
    payloads are fat); at scale pair with
    spark.sql.execution.arrow.maxRecordsPerBatch and input splits sized
    so a batch of payloads fits executor memory.
    """
    if not decode_stub:
        raise NotImplementedError(
            "real media decoding requires image/audio libs not present "
            "in this environment; run with decode_stub=True"
        )

    def feat_batch(pdf_iter):
        for pdf in pdf_iter:
            feats = [
                _decode_image_stub(bytes(p)) for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(
        feat_batch, schema="media_id long, kind string, feature array<float>"
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: (media_id, frame_ts_ms) rows — the
    distributed exploding/batching part of frame extraction, with the
    actual frame decode left to the stubbed decoder."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
