"""Multimodal columns for a training-data pipeline.

Media ride as opaque ``binary`` columns with typed metadata structs —
the schema/partitioning/UDF plumbing is real and tested; the actual
codec calls (image decode, audio resample, video frame extraction) are
STUBBED: the container has no PIL/ffmpeg, so `deterministic_fake=True`
derives features from the bytes themselves (stable, testable), and
`deterministic_fake=False` raises NotImplementedError where the codec
library call would go.

Batch shape matters at 100 TB: media bytes dominate row size, so the
extractors run via ``mapInPandas`` with a small
``arrow.maxRecordsPerBatch`` (set in session.py) and emit ONLY
metadata/features, never re-emitting the payload — column pruning then
keeps the binary out of every downstream shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha1 string, "
    "feature array<float>, ok boolean"
)

_FEATURE_DIM = 8


def _fake_decode_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for decode+embed: 8 floats derived from
    the sha1 of the bytes. Replace with the real decoder on a cluster
    with codec libraries installed."""
    h = hashlib.sha1(payload).digest()
    raw = np.frombuffer(h[: _FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
    return raw / 65535.0


def extract_features(
    media: DataFrame, deterministic_fake: bool = True
) -> DataFrame:
    """media (MEDIA_SCHEMA) -> per-item features, payload dropped."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "real media decode needs PIL/torchaudio/ffmpeg — not in this container"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "sha1": payloads.map(lambda b: hashlib.sha1(b).hexdigest()),
                    "feature": payloads.map(lambda b: _fake_decode_features(b).tolist()),
                    "ok": True,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def synth_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media corpus for the plumbing tests."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for mid in pdf["id"].tolist():
                rng = np.random.default_rng(seed + mid)
                kind = kinds[mid % 3]
                payload = rng.integers(0, 256, size=64 + (mid % 5) * 32, dtype=np.uint8).tobytes()
                rows.append(
                    (
                        mid,
                        kind,
                        payload,
                        ("application/octet-stream", 64, 64, 1000 if kind != "image" else None),
                    )
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return spark.range(0, n, numPartitions=2).mapInPandas(gen, MEDIA_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame to decode
    — the shuffle-light pattern where frame extraction fans out AFTER
    pruning to the sampled timestamps (decode itself is the stub)."""
    v = media.filter(F.col("kind") == "video").select(
        "media_id", F.col("meta.duration_ms").alias("duration_ms")
    )
    return v.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
