"""Multimodal columns for a training-data pipeline.

Media ride as opaque ``binary`` columns with typed metadata structs —
the schema/partitioning/UDF plumbing is real and tested. Codec choice
is a ``codec`` argument:

- ``"fake"`` (CI default): features derived deterministically from the
  payload bytes — stable and testable with no media libraries.
- ``"real"``: PIL for images, soundfile for audio; a missing library
  raises NotImplementedError (loudly, on the executor that lacks it),
  a payload that fails to decode yields an ``ok=False`` row (corrupt
  media is routine at 100 TB, it must not kill the job). Video needs
  ffmpeg, which has no in-container probe target — always
  NotImplementedError under "real".
- ``"auto"``: resolved ONCE on the driver — "real" when every probed
  library is present there, else "fake". Executors never re-probe for
  the mode decision, so one job can never silently mix real and fake
  feature semantics in the same output column (heterogeneous clusters
  fail loudly under "real" instead).

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


def _codec_modules():
    """Probe the optional real codec libraries. Called inside the
    Arrow kernels so each executor probes its own environment."""
    try:
        from PIL import Image  # noqa: N811
    except Exception:
        Image = None
    try:
        import soundfile
    except Exception:
        soundfile = None
    return Image, soundfile


def codecs_available() -> bool:
    image, sound = _codec_modules()
    return image is not None and sound is not None


def _resolve_codec(codec: str) -> str:
    if codec not in ("fake", "real", "auto"):
        raise ValueError(f"codec must be fake|real|auto, got {codec!r}")
    if codec == "auto":
        return "real" if codecs_available() else "fake"
    return codec


def _real_features(kind: str, payload: bytes, image_mod, sound_mod) -> np.ndarray | None:
    """Decode + featurize with the real libraries; None on decode
    failure (-> ok=False row). Raises NotImplementedError when the
    library for the kind is absent."""
    import io

    if kind == "image":
        if image_mod is None:
            raise NotImplementedError("real image decode needs PIL — not installed")
        try:
            img = image_mod.open(io.BytesIO(payload)).convert("RGB")
            a = np.asarray(img, dtype=np.float32)
        except Exception:
            return None
        return np.array(
            [
                img.width, img.height,
                a[..., 0].mean(), a[..., 1].mean(), a[..., 2].mean(),
                a.std(), img.width / max(img.height, 1), a.size,
            ],
            dtype=np.float32,
        )
    if kind == "audio":
        if sound_mod is None:
            raise NotImplementedError("real audio decode needs soundfile — not installed")
        try:
            data, sr = sound_mod.read(io.BytesIO(payload))
        except Exception:
            return None
        a = np.asarray(data, dtype=np.float64)
        if a.size == 0:  # zero-frame file: decodes, but is not usable media
            return None
        frames = a.shape[0]
        channels = a.shape[1] if a.ndim > 1 else 1
        return np.array(
            [sr, frames, a.mean(), a.std(), a.min(), a.max(), channels,
             frames / max(sr, 1)],
            dtype=np.float32,
        )
    raise NotImplementedError("real video frame decode needs ffmpeg — not installed")


def _fake_decode_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for decode+embed: 8 floats derived from
    the sha1 of the bytes. Replace with the real decoder on a cluster
    with codec libraries installed."""
    h = hashlib.sha1(payload).digest()
    raw = np.frombuffer(h[: _FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
    return raw / 65535.0


def extract_features(
    media: DataFrame, deterministic_fake: bool = True, codec: str | None = None
) -> DataFrame:
    """media (MEDIA_SCHEMA) -> per-item features, payload dropped.

    ``codec``: fake | real | auto (see module docstring). The legacy
    ``deterministic_fake`` flag maps to fake/real when ``codec`` is not
    given."""
    if codec is None:
        codec = "fake" if deterministic_fake else "real"
    # resolve 'auto' ONCE, driver-side: on a cluster where only some
    # executors have PIL/soundfile, a per-executor probe would silently
    # mix 'real' and 'fake' feature semantics in one output column.
    # Executors see a concrete mode; under 'real' a missing library
    # fails loudly (NotImplementedError in _real_features).
    mode = _resolve_codec(codec)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        image_mod, sound_mod = _codec_modules() if mode == "real" else (None, None)
        for pdf in batches:
            payloads = pdf["payload"]
            if mode == "fake":
                feats = payloads.map(lambda b: _fake_decode_features(b).tolist())
                ok = pd.Series(True, index=pdf.index)
            else:
                decoded = [
                    _real_features(k, b, image_mod, sound_mod)
                    for k, b in zip(pdf["kind"], payloads)
                ]
                feats = pd.Series(
                    [None if d is None else d.tolist() for d in decoded], index=pdf.index
                )
                ok = pd.Series([d is not None for d in decoded], index=pdf.index)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "sha1": payloads.map(lambda b: hashlib.sha1(b).hexdigest()),
                    "feature": feats,
                    "ok": ok,
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
    media: DataFrame,
    max_side: int = 224,
    deterministic_fake: bool = True,
    codec: str | None = None,
) -> DataFrame:
    """Image resize: metadata math (target dims, aspect-preserving) is
    real JVM SQL; the pixel work follows the ``codec`` contract (fake:
    byte count derived from the planned dims; real: PIL decode +
    resize, ok=False on corrupt payloads). Output drops the payload
    (the resized bytes would be written straight to the sink on a real
    cluster, never shuffled)."""
    if codec is None:
        codec = "fake" if deterministic_fake else "real"
    # driver-side 'auto' resolution — same rationale as extract_features
    mode = _resolve_codec(codec)
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
        image_mod, _ = _codec_modules() if mode == "real" else (None, None)
        if mode == "real" and image_mod is None:
            raise NotImplementedError("real image resize needs PIL — not installed")
        for pdf in batches:
            if mode == "fake":
                # fake: "resized" byte count derived deterministically
                n_out = pdf["out_w"].astype("int64") * pdf["out_h"].astype("int64") * 3
                ok = pd.Series(True, index=pdf.index)
            else:
                import io

                n_list, ok_list = [], []
                for payload, ow, oh in zip(pdf["payload"], pdf["out_w"], pdf["out_h"]):
                    try:
                        img = image_mod.open(io.BytesIO(payload)).convert("RGB")
                        out = io.BytesIO()
                        img.resize((int(ow), int(oh))).save(out, format="PNG")
                        n_list.append(out.getbuffer().nbytes)
                        ok_list.append(True)
                    except Exception:
                        n_list.append(0)
                        ok_list.append(False)
                n_out = pd.Series(n_list, index=pdf.index, dtype="int64")
                ok = pd.Series(ok_list, index=pdf.index)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_w": pdf["out_w"],
                    "out_h": pdf["out_h"],
                    "n_bytes_out": n_out,
                    "ok": ok,
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
