"""Multimodal (image/audio/video) column operators.

Extension layer for training-data pipelines: media ride as opaque
``binary`` columns with typed metadata, and decode / feature-extract
/ resize / frame-sample run as Arrow-batched ``mapInPandas`` stages.
The codec step is import-gated: when PIL / soundfile is importable
the REAL decode runs (``Image.open``+convert+resize;
``soundfile.read``+mono downmix, corrupt bytes skipped row-wise);
otherwise a deterministic content-hash fake stands in so the build
container (which has neither library) still executes the full plan.
The Spark-side contract — schemas, batch shapes, partitioning, UDF
signatures — is identical on both branches and tested.
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
    """Deterministic stand-in decode, SQL-RESTATABLE: pixel (y, x) is
    ``md5(md5hex(content)|y|x) % 256`` — a DuckDB oracle recomputes
    every pixel from the same text bytes, which is what lets the
    codec-gated image query carry a driver hash row. The no-codec
    fallback for :func:`_image_pixels`."""
    key = hashlib.md5(content).hexdigest()
    flat = np.fromiter(
        (
            int(hashlib.md5(f"{key}|{y}|{x}".encode()).hexdigest()[:8], 16) % 256
            for y in range(h)
            for x in range(w)
        ),
        dtype=np.int64,
        count=h * w,
    )
    return flat.astype(np.uint8).reshape(h, w)


def _image_pixels(content: bytes, h: int, w: int) -> np.ndarray | None:
    """Decode + grayscale + resize one image to a uint8 HxW array.

    Real branch when PIL is importable (``Image.open`` on the raw
    bytes, luma convert, resize); deterministic fake otherwise, so the
    container without codec libraries still runs the full plan.
    Corrupt bytes return None — one bad image in a billion must skip,
    never kill the Arrow stage.
    """
    if HAVE_PIL:
        import io

        try:
            img = Image.open(io.BytesIO(content)).convert("L").resize((w, h))
            return np.asarray(img, dtype=np.uint8)
        except Exception:
            return None
    return _fake_pixels(content, h, w)


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
                if r.kind != "image" or r.content is None:
                    continue
                px = _image_pixels(bytes(r.content), h, w)
                if px is None:  # corrupt image bytes: skip, don't crash
                    continue
                px = px.astype(np.float32)
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
    """Deterministic stand-in decode, SQL-RESTATABLE: sample i is
    byte (i % 16) of ``md5(md5hex(content)|i//16)``, mapped to the
    integers −3..3 (``% 7 − 3``) — one md5 per 16 samples, and a
    DuckDB oracle recomputes every sample, so the codec-gated audio
    features carry a driver hash row. The no-codec fallback for
    :func:`_audio_waveform`."""
    key = hashlib.md5(content).hexdigest()
    out = np.empty(n_samples, dtype=np.int64)
    for b in range((n_samples + 15) // 16):
        block = hashlib.md5(f"{key}|{b}".encode()).hexdigest()
        lo = b * 16
        for j in range(min(16, n_samples - lo)):
            out[lo + j] = int(block[2 * j : 2 * j + 2], 16) % 7 - 3
    return out.astype(np.float32)


def _audio_waveform(content: bytes, n_fallback: int) -> np.ndarray | None:
    """Decode one audio blob to a mono float32 waveform.

    Real branch when soundfile is importable (``soundfile.read`` on
    the raw bytes, multi-channel downmixed to mono); deterministic
    fake of ``n_fallback`` samples otherwise. Corrupt bytes return
    None — skip, never a stage kill.
    """
    if HAVE_SOUNDFILE:
        import io

        try:
            data, _sr = soundfile.read(io.BytesIO(content), dtype="float32")
        except Exception:
            return None
        data = np.asarray(data, dtype=np.float32)
        if data.ndim > 1:
            data = data.mean(axis=1)
        return data
    return _fake_waveform(content, n_fallback)


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
                wav = _audio_waveform(bytes(r.content), n)
                if wav is None or not len(wav):  # corrupt audio: skip
                    continue
                n = int(wav.shape[0])
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
