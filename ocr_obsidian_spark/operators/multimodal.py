"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
metadata struct; decode / feature-extraction / resize / frame-sampling are
Arrow-batched ``mapInPandas`` stages. The actual codec step is STUBBED in
this container (no PIL/ffmpeg available — see ``decode_image``): the Spark
plumbing — schema, batch shape, partition behavior, UDF signature — is real
and tested; a deterministic fake feature extractor stands in for the codec so
the distributed path is exercised end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Any, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

MEDIA_FEATURES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("content_sha256", T.StringType(), False),
        T.StructField("feature_vec", T.ArrayType(T.FloatType(), False), False),
    ]
)


def decode_image(payload: bytes) -> "Any":
    """Decode an image payload. REAL decode requires an image codec library
    that is not installed in this container; the pipeline uses
    ``fake_features`` instead (deterministic, content-derived)."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "image decode requires an image codec (PIL/opencv) not present in "
            "this environment; pipeline uses the deterministic stub features"
        ) from exc
    raise NotImplementedError("real decode path intentionally unimplemented in round 1")


def fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic content-derived pseudo-features (codec stand-in):
    dim floats from the sha256 digest, scaled to [0, 1)."""
    digest = hashlib.sha256(payload).digest()
    vals = np.frombuffer(digest[: dim * 4], dtype="<u4").astype("float64")
    return [float(v % 10_000) / 10_000.0 for v in vals]


def extract_media_features(
    df: DataFrame, *, payload_col: str = "payload", meta_col: str = "media_meta", dim: int = 8
) -> DataFrame:
    """(url, payload, meta) → feature rows via an Arrow-batched map stage.

    The batch shape and partitioning are exactly what a real decoder would
    see; swapping ``fake_features`` for a codec is a one-line change.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict[str, Any]] = []
            for url, payload, meta in zip(pdf["url"], pdf[payload_col], pdf[meta_col]):
                data = bytes(payload) if payload is not None else b""
                out.append(
                    {
                        "url": url,
                        "media_type": (meta or {}).get("media_type", "image"),
                        "n_bytes": len(data),
                        "content_sha256": hashlib.sha256(data).hexdigest(),
                        "feature_vec": fake_features(data, dim),
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in MEDIA_FEATURES.fields])

    return df.select("url", payload_col, meta_col).mapInPandas(run, schema=MEDIA_FEATURES)


RESIZED = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("out_width", T.IntegerType(), False),
        T.StructField("out_height", T.IntegerType(), False),
        T.StructField("scale", T.DoubleType(), False),
        T.StructField("payload_sha256", T.StringType(), False),
    ]
)


def resize_images(
    df: DataFrame,
    *,
    max_side: int = 512,
    payload_col: str = "payload",
    meta_col: str = "media_meta",
) -> DataFrame:
    """Resize plumbing for image payloads: aspect-preserving target-dimension
    math + Arrow batch shape are real; the pixel resample itself is the same
    stubbed codec boundary as ``decode_image`` (the output row carries the
    input content hash in place of resized bytes). Pages without known
    dimensions pass through at scale 1.0."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict[str, Any]] = []
            for url, payload, meta in zip(pdf["url"], pdf[payload_col], pdf[meta_col]):
                meta = meta or {}
                w = meta.get("width")
                h = meta.get("height")
                if w and h and max(int(w), int(h)) > max_side:
                    scale = max_side / float(max(int(w), int(h)))
                    ow = max(1, int(round(int(w) * scale)))
                    oh = max(1, int(round(int(h) * scale)))
                else:
                    scale, ow, oh = 1.0, int(w or 0), int(h or 0)
                data = bytes(payload) if payload is not None else b""
                out.append(
                    {
                        "url": url,
                        "out_width": ow,
                        "out_height": oh,
                        "scale": float(scale),
                        "payload_sha256": hashlib.sha256(data).hexdigest(),
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in RESIZED.fields])

    return (
        df.filter(F.col(f"{meta_col}.media_type") == "image")
        .select("url", payload_col, meta_col)
        .mapInPandas(run, schema=RESIZED)
    )


def sample_frames(
    df: DataFrame, *, every_ms: int = 1000, payload_col: str = "payload",
    meta_col: str = "media_meta",
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: explodes one row per
    sampled timestamp (metadata-driven; the frame decode itself is the same
    stubbed codec boundary as ``decode_image``)."""
    ts = F.sequence(
        F.lit(0).cast("long"),
        F.greatest(F.coalesce(F.col(f"{meta_col}.duration_ms"), F.lit(0)) - 1, F.lit(0)),
        F.lit(int(every_ms)).cast("long"),
    )
    return (
        df.filter(F.col(f"{meta_col}.media_type") == "video")
        .select("url", payload_col, meta_col, F.explode(ts).alias("frame_ts_ms"))
    )
