"""Multimodal-column operators: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schemas, partitioning, UDF signatures, batch
shapes — is real and tested. The codec layer (actual JPEG/WAV decode) is
stubbed: the container ships no image/audio libraries, so ``decode_image``
raises ``NotImplementedError`` unless ``fake=True`` selects the
deterministic fake decoder (byte-statistics pseudo-decode) that exercises
the identical dataflow.

Scale design: media rows are large (MBs) → keep payloads OUT of shuffles.
Every operator here is a mapInPandas projection (no shuffle); derived
features (small) are what downstream joins/groupBys touch. Batch size is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` — set it low
(e.g. 64) for media tables so a batch of payloads fits executor memory.
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
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("mean_byte", T.DoubleType(), True),
        T.StructField("std_byte", T.DoubleType(), True),
        T.StructField("histogram", T.ArrayType(T.LongType()), True),  # 16 bins
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_bytes", T.BinaryType(), True),
    ]
)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Codec boundary: the real path uses PIL when importable (grayscale
    float32 via convert("L")); without PIL, REAL netpbm P5/P6 and
    uncompressed BMP payloads decode through the dependency-free
    ``sources/img_micro.py`` (same ITU-R 601-2 luma, integer-truncated, so
    the two backends produce identical arrays — pinned in tests). Only a
    payload neither backend recognizes raises the documented
    NotImplementedError. ``fake=True`` selects the deterministic
    pseudo-decoder (byte statistics reshaped into a tiny image) for
    synthetic opaque-blob fixtures."""
    if not fake:
        try:
            from PIL import Image
        except ImportError:
            from ..sources import img_micro

            if img_micro.sniff(payload) is not None:
                return img_micro.decode_to_gray(payload)
            raise NotImplementedError(
                "image decode: payload is not netpbm/BMP (img_micro) and no "
                "imaging library (PIL/cv2) is installed; run with fake=True "
                "for the deterministic pseudo-decoder"
            ) from None
        import io

        return np.asarray(Image.open(io.BytesIO(payload)).convert("L"), dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    if len(arr) == 0:
        return np.zeros((1, 1), dtype=np.float32)
    # side <= sqrt(len)/4 (or 1), so side*side <= len always holds — the
    # slice below never needs padding
    side = max(int(len(arr) ** 0.5) // 4, 1)
    return arr[: side * side].reshape(side, side).astype(np.float32)


def extract_image_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Per-image features via mapInPandas: byte stats + 16-bin histogram +
    sha256. Arrow-batched; payloads never shuffled (narrow projection)."""

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((mid, 0, "", None, None, None))
                    continue
                img = decode_image(bytes(payload), fake=fake)
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(arr // 16, minlength=16)[:16]
                rows.append(
                    (
                        mid,
                        len(payload),
                        hashlib.sha256(bytes(payload)).hexdigest(),
                        float(img.mean()),
                        float(img.std()),
                        hist.astype(np.int64).tolist(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_bytes", "sha256", "mean_byte", "std_byte", "histogram"],
            )

    return media.select("media_id", "payload").mapInPandas(_features, IMAGE_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8) -> DataFrame:
    """Frame-sampling plumbing: explode each video payload into up to
    ``max_frames`` byte-slices ("frames" for the stub codec). Row-local
    generate — the big payload column is read once and never shuffled."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                b = bytes(payload)
                for k in range(min(max_frames, max(len(b) // every_n_bytes, 1))):
                    out.append((mid, k, b[k * every_n_bytes : (k + 1) * every_n_bytes]))
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "frame_bytes"])

    return media.select("media_id", "payload").mapInPandas(_frames, FRAME_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: marks intended dims; payload passthrough (stub codec
    can't resample). Schema/partitioning identical to a real resize."""
    return media.withColumn("width", F.lit(width)).withColumn("height", F.lit(height))


def make_media_fixture(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload bytes from a seeded RNG."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        size = int(rng.integers(256, 4096))
        payload = bytes(rng.integers(0, 256, size, dtype=np.uint8))
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                int(rng.integers(16, 256)) if kind == "image" else None,
                int(rng.integers(16, 256)) if kind == "image" else None,
                int(rng.integers(1000, 60000)) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def media_dedup(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Exact dedup over opaque binary payloads: canonical digest (md5 over
    hex — portable across engines, see q_media_stats) → keep the lowest id
    per digest. Payload bytes never shuffle: the exchange carries
    (digest, id) pairs only, then winners re-join nothing (all needed
    columns ride the digest projection).

    Output: (media_id, kind, digest, n_copies) — one row per distinct
    payload, id = the keeper.
    """
    from pyspark.sql import Window

    digested = media.select(
        F.col(id_col), F.col("kind"), F.md5(F.hex("payload")).alias("digest")
    )
    w = Window.partitionBy("digest").orderBy(id_col)
    return (
        digested.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_copies", F.count("*").over(Window.partitionBy("digest")))
        .where(F.col("_rn") == 1)
        .select(id_col, "kind", "digest", "n_copies")
    )
