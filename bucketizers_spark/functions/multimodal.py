"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` kernels.

The Spark-side plumbing (schemas, batch iteration, partition sizing,
deterministic fake features) is real and tested; the actual codec calls
(PIL/ffmpeg/torchaudio) are NOT available in this container and are
isolated behind ``_decode_*`` seams that raise ``NotImplementedError``
unless ``fake=True`` — the deterministic fake derives features from the
bytes themselves (sha256-seeded), so pipelines are end-to-end testable.

Design notes for 100 TB:
- binary payloads stay in the executor JVM until the Arrow transfer of the
  exact column subset the kernel asks for (column pruning applies to
  binary columns like any other);
- ``mapInPandas`` (not a scalar UDF) so one Python worker call handles an
  Arrow batch and can drop/expand rows (e.g. frame sampling);
- batch memory is bounded by spark.sql.execution.arrow.maxRecordsPerBatch
  — with ~1 MB payloads set it to ~64 for decode stages (knob, not code);
- the output schema is fixed and narrow (features, not pixels) so shuffles
  after extraction move small rows.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id string, width int, height int, n_channels int, "
    "mean_luma double, phash string"
)

AUDIO_FEATURES_SCHEMA = (
    "media_id string, duration_ms int, rms double, zero_crossings int"
)

FRAME_SAMPLE_SCHEMA = "media_id string, frame_idx int, frame_phash string"


def _fake_rng(payload: bytes) -> np.random.Generator:
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    return np.random.default_rng(seed)


def _decode_image(payload: bytes, fake: bool):
    if not fake:
        raise NotImplementedError(
            "image codec not available in this environment; run with "
            "fake=True or install PIL on the cluster"
        )
    rng = _fake_rng(payload)
    w, h = int(rng.integers(16, 512)), int(rng.integers(16, 512))
    return w, h, 3, float(rng.random()), rng.bytes(8).hex()


def _decode_audio(payload: bytes, fake: bool):
    if not fake:
        raise NotImplementedError(
            "audio codec not available in this environment; run with "
            "fake=True or install soundfile/ffmpeg on the cluster"
        )
    rng = _fake_rng(payload)
    return int(rng.integers(100, 60_000)), float(rng.random()), int(
        rng.integers(0, 10_000)
    )


def image_features(df: DataFrame, *, fake: bool = False) -> DataFrame:
    """Decode + feature-extract an image binary column via mapInPandas."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (mid, *_decode_image(payload, fake))
                for mid, payload in zip(pdf["media_id"], pdf["payload"])
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "n_channels",
                    "mean_luma", "phash",
                ],
            )

    return df.select("media_id", "payload").mapInPandas(
        kernel, IMAGE_FEATURES_SCHEMA
    )


def audio_features(df: DataFrame, *, fake: bool = False) -> DataFrame:
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (mid, *_decode_audio(payload, fake))
                for mid, payload in zip(pdf["media_id"], pdf["payload"])
            ]
            yield pd.DataFrame(
                rows, columns=["media_id", "duration_ms", "rms", "zero_crossings"]
            )

    return df.select("media_id", "payload").mapInPandas(
        kernel, AUDIO_FEATURES_SCHEMA
    )


def sample_frames(
    df: DataFrame, *, every_ms: int = 1000, fake: bool = False
) -> DataFrame:
    """Video frame sampling: expands each video row into one row per sampled
    frame (demonstrates the row-expanding mapInPandas shape)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if not fake:
                    raise NotImplementedError(
                        "video codec not available; run with fake=True"
                    )
                rng = _fake_rng(payload)
                duration = int(rng.integers(1000, 20_000))
                for k in range(duration // every_ms):
                    out.append((mid, k, rng.bytes(8).hex()))
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "frame_phash"]
            )

    return df.select("media_id", "payload").mapInPandas(
        kernel, FRAME_SAMPLE_SCHEMA
    )
