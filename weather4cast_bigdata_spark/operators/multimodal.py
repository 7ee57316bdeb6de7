"""Multimodal (image/audio/video) column operators.

Extension layer for training-data pipelines: media ride as opaque
``binary`` columns with typed metadata, and decode / feature-extract
/ resize / frame-sample run as Arrow-batched ``mapInPandas`` stages.
The media libraries (PIL/librosa/cv2) are NOT in this container, so
the codec step is import-gated with a deterministic fake; the
Spark-side contract — schemas, batch shapes, partitioning, UDF
signatures — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # pragma: no cover
    from PIL import Image  # type: ignore

    HAVE_PIL = True
except ImportError:
    Image = None
    HAVE_PIL = False

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_luma", FloatType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _fake_pixels(content: bytes, h: int, w: int) -> np.ndarray:
    """Deterministic stand-in decode: uint8 HxW luma seeded by content
    hash. Replace with ``PIL.Image.open(io.BytesIO(content))`` when
    the codec library is present."""
    seed = int.from_bytes(hashlib.md5(content).digest()[:8], "little")
    return np.random.default_rng(seed).integers(0, 256, size=(h, w), dtype=np.uint8)


def decode_image_features(
    media: DataFrame, resize_to: tuple[int, int] = (16, 16), n_features: int = 8
) -> DataFrame:
    """decode → resize → feature-extract in ONE Python stage (no
    intermediate materialization of pixel arrays across the JVM
    boundary — only the small feature vector comes back)."""
    h, w = resize_to

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "image":
                    continue
                if HAVE_PIL:  # pragma: no cover
                    raise NotImplementedError(
                        "real PIL decode path: Image.open + convert('L') + resize"
                    )
                px = _fake_pixels(bytes(r.content), h, w).astype(np.float32)
                # Row-mean pooling as the feature stub — the contract
                # (fixed-length float vector per media row) is what
                # downstream similarity search consumes.
                feats = px.mean(axis=1)[:n_features] / 255.0
                rows.append(
                    {
                        "media_id": r.media_id,
                        "width": w,
                        "height": h,
                        "mean_luma": float(px.mean() / 255.0),
                        "features": feats.tolist(),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA]
            )

    return media.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: explode each video row into frame
    timestamps on the JVM side (sequence + explode — no Python), so
    the expensive per-frame decode inherits a row per frame and
    parallelizes across the cluster."""
    frames = F.explode(
        F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
    ).alias("frame_ms")
    return media.where(F.col("kind") == "video").select(
        "media_id", "content", "mime", frames
    )


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_samples", IntegerType()),
        StructField("rms", FloatType()),
        StructField("zero_crossing_rate", FloatType()),
    ]
)

try:  # pragma: no cover - not installed in the build container
    import soundfile  # type: ignore

    HAVE_SOUNDFILE = True
except ImportError:
    soundfile = None
    HAVE_SOUNDFILE = False


def _fake_waveform(content: bytes, n_samples: int) -> np.ndarray:
    """Deterministic stand-in decode: float32 waveform in [-1, 1]
    seeded by content hash. Replace with ``soundfile.read`` when the
    codec library is present."""
    seed = int.from_bytes(hashlib.md5(content).digest()[:8], "little")
    return np.random.default_rng(seed).uniform(-1, 1, size=n_samples).astype(np.float32)


def decode_audio_features(media: DataFrame, sample_rate: int = 16_000) -> DataFrame:
    """decode → waveform-feature-extract in one Arrow stage: RMS
    energy and zero-crossing rate per audio row. Only the tiny feature
    record crosses back to the JVM — never the waveform."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                # NULL content/duration (a malformed media row) must
                # not kill the Arrow stage — skip, don't crash.
                if r.kind != "audio" or r.content is None:
                    continue
                dur = 0 if pd.isna(r.duration_ms) else int(r.duration_ms)
                n = max(dur * sample_rate // 1000, 1)
                if HAVE_SOUNDFILE:  # pragma: no cover
                    raise NotImplementedError(
                        "real decode path: soundfile.read(io.BytesIO(content))"
                    )
                wav = _fake_waveform(bytes(r.content), n)
                rows.append(
                    {
                        "media_id": r.media_id,
                        "n_samples": n,
                        "rms": float(np.sqrt(np.mean(wav**2))),
                        "zero_crossing_rate": float(
                            np.mean(np.signbit(wav[1:]) != np.signbit(wav[:-1]))
                        ),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA])

    return media.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)
