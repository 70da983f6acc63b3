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


def audio_chunk_plan(media: DataFrame, window_ms: int = 1000, hop_ms: int = 500) -> DataFrame:
    """Audio windowing *plan*: one row per (overlapping) chunk to
    decode — same shuffle-light pattern as frame_sample_plan: the
    fan-out happens on metadata only, the payload stays in place until
    a decoder actually needs the chunk."""
    a = media.filter(F.col("kind") == "audio").select(
        "media_id", F.col("meta.duration_ms").alias("duration_ms")
    )
    return a.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(hop_ms))
        ).alias("chunk_start_ms"),
    ).select(
        "media_id",
        "chunk_start_ms",
        (F.col("chunk_start_ms") + F.lit(window_ms)).alias("chunk_end_ms"),
    )


def resize_plan(
    media: DataFrame, max_side: int = 224, deterministic_fake: bool = True
) -> DataFrame:
    """Image resize: metadata math (target dims, aspect-preserving) is
    real JVM SQL; the pixel work is the stubbed decode. Output drops
    the payload (the resized bytes would be written straight to the
    sink on a real cluster, never shuffled)."""
    imgs = media.filter(F.col("kind") == "image")
    w = F.col("meta.width").cast("double")
    h = F.col("meta.height").cast("double")
    scale = F.least(F.lit(1.0), F.lit(float(max_side)) / F.greatest(w, h))
    planned = imgs.select(
        "media_id",
        "payload",
        F.round(w * scale).cast("int").alias("out_w"),
        F.round(h * scale).cast("int").alias("out_h"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "real image resize needs PIL — not in this container"
                )
            # fake: "resized" byte count derived deterministically
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_w": pdf["out_w"],
                    "out_h": pdf["out_h"],
                    "n_bytes_out": (
                        pdf["out_w"].astype("int64") * pdf["out_h"].astype("int64") * 3
                    ),
                    "ok": True,
                }
            )

    return planned.mapInPandas(
        run, "media_id long, out_w int, out_h int, n_bytes_out long, ok boolean"
    )


def media_exact_dups(media: DataFrame) -> DataFrame:
    """(sha1, n_items, min_media_id) — exact payload dedup, entirely
    JVM-side (F.sha1 over the binary column; the payload never reaches
    Python)."""
    return (
        media.groupBy(F.sha1("payload").alias("sha1"))
        .agg(F.count("*").alias("n_items"), F.min("media_id").alias("min_media_id"))
        .orderBy("sha1")
    )
