"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with Arrow-batched decode/transform plumbing.

The container has no image/audio codecs, so the decode kernels are
STUBBED — ``decoder="fake"`` produces deterministic synthetic pixels
(so the Spark-side plumbing — schema, batching, partitioning — is real
and testable), ``decoder="pillow"`` raises NotImplementedError until a
codec library is present. Everything around the kernel (mapInPandas
iterator shape, schema contracts, batch sizing) is production-form.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Canonical multimodal asset schema: opaque payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("format", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode(content: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for an image codec: bytes -> uint8 HxW
    luma plane derived from a rolling hash of the payload."""
    seed = np.frombuffer(content[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
    rng = np.random.default_rng(int(seed) % (2**32))
    return rng.integers(0, 256, size=(height, width), dtype=np.uint8)


def extract_image_features(
    media: DataFrame,
    decoder: str = "fake",
    feature_dim: int = 8,
    batch_hint: int = 256,
) -> DataFrame:
    """Decode images and emit per-asset features via ``mapInPandas``.

    Arrow streams binary payloads in batches; the decode kernel runs
    per-batch in Python (this is the genuinely-Python path — a codec is
    not expressible in Catalyst). Output schema is fixed and narrow so
    downstream joins don't carry pixels.
    """
    if decoder not in {"fake", "pillow"}:
        raise ValueError(f"unknown decoder {decoder!r}")
    if decoder == "pillow":
        raise NotImplementedError(
            "No image codec in this environment; use decoder='fake' "
            "(deterministic synthetic pixels) — plumbing is identical."
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                meta = r["meta"]
                w = int(meta["width"] or 16)
                h = int(meta["height"] or 16)
                img = _fake_decode(r["content"], w, h)
                # feature: row-band mean intensities, fixed dim
                bands = np.array_split(img, feature_dim, axis=0)
                feat = [float(b.mean()) for b in bands]
                rows.append(
                    {
                        "asset_id": r["asset_id"],
                        "width": w,
                        "height": h,
                        "mean_intensity": float(img.mean()),
                        "feature": np.array(feat, dtype=np.float32),
                    }
                )
            yield pd.DataFrame(rows)

    imgs = media.filter(F.col("media_type") == "image")
    return imgs.mapInPandas(kernel, FEATURE_SCHEMA)


def resize_plan(media: DataFrame, max_side: int = 512) -> DataFrame:
    """Plan-side resize bookkeeping: computes target dimensions with
    native expressions; the pixel transform itself would ride the same
    mapInPandas kernel as :func:`extract_image_features`."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.when(
        F.greatest(w, h) > max_side, max_side / F.greatest(w, h)
    ).otherwise(F.lit(1.0))
    return media.withColumns(
        {
            "target_width": F.round(w * scale).cast("int"),
            "target_height": F.round(h * scale).cast("int"),
        }
    )


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plan for videos: one output row per sampled frame
    index (sequence+explode — the decode of each frame is the stubbed
    kernel's job)."""
    vids = media.filter(F.col("media_type") == "video")
    frames = F.sequence(
        F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_n)
    )
    return vids.select(
        "asset_id", F.explode(frames).alias("frame_idx"), "meta"
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests/demos."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        w, h = 16 + (i % 5) * 8, 16 + (i % 3) * 8
        rows.append(
            (
                i,
                kind,
                bytes([i % 256] * 32),
                (w, h, 90 if kind == "video" else 1,
                 16000 if kind == "audio" else None, "synthetic"),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
