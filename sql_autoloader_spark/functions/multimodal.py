"""Multimodal (image/audio/video) column handling.

Media assets are opaque ``binary`` columns travelling with typed
metadata — the Spark-native layout for heterogeneous 100 TB corpora:

- content: ``BinaryType`` (parquet keeps it out of dictionary encoding)
- metadata: plain typed columns (``media_type``, ``width``, ...) so
  Catalyst can prune/filter *without touching the bytes*

Heavy per-asset work (decode, resize, feature extraction, frame
sampling) runs as Arrow-batched ``mapInPandas`` — the schema, batch
shape, and partitioning here are production-real; only the innermost
codec call is stubbed (``_decode_image_bytes``), because no image/audio
library ships in this container.  Swap the stub for PIL/ffmpeg and
nothing else changes.

Scale notes:
- ``mapInPandas`` keeps the pipeline streaming per Arrow batch —
  bounded memory regardless of asset count; tune
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` for large assets.
- Decode is embarrassingly parallel: no shuffle anywhere in this
  module; repartition upstream only to balance asset-size skew
  (``df.repartitionByRange("n_bytes")`` is the usual fix).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

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

if TYPE_CHECKING:
    import pandas as pd

#: canonical media-table schema: opaque bytes + typed, prunable metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("mime", StringType(), True),
        StructField("content", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_DIM = 16

_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)

_FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_index", IntegerType(), False),
        StructField("frame", BinaryType(), True),
    ]
)


try:  # real codec when the environment ships one (import-gated)
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover - container has no PIL
    _PILImage = None


def _decode_image_bytes(content: bytes) -> list[float]:
    """Decode image bytes into a fixed-dim feature vector.

    With PIL available, this is a real decode: the image is opened,
    converted to grayscale, and summarized as a normalized 16-bin pixel
    histogram.  Without a codec library (this container ships none),
    a deterministic byte-histogram stands in — the signature
    (bytes → fixed-dim float vector) is the real contract either way,
    and the Spark-side plumbing (Arrow batches, schema, partitioning)
    is identical.
    """
    if content is None:
        raise NotImplementedError(
            "no media codec available in this environment; "
            "content=None cannot be decoded"
        )
    if _PILImage is not None:
        import io

        try:
            with _PILImage.open(io.BytesIO(content)) as img:
                pixels = list(img.convert("L").getdata())
            histogram = [0] * FEATURE_DIM
            for p in pixels:
                histogram[p * FEATURE_DIM // 256] += 1
            total = max(len(pixels), 1)
            return [count / total for count in histogram]
        except Exception:  # noqa: BLE001 - undecodable bytes fall through
            pass  # not an image PIL understands: byte-histogram fallback
    histogram = [0] * FEATURE_DIM
    for byte in content:
        histogram[byte % FEATURE_DIM] += 1
    total = max(len(content), 1)
    return [count / total for count in histogram]


def attach_byte_stats(df: DataFrame) -> DataFrame:
    """Cheap metadata columns computed JVM-side (no Python): byte length
    and a content hash for exact dedup of assets."""
    return df.withColumns(
        {
            "n_bytes": F.octet_length("content").cast("long"),
            "content_hash": F.sha2(F.col("content"), 256),
        }
    )


def extract_features(df: DataFrame, *, id_col: str = "media_id") -> DataFrame:
    """Per-asset feature vectors via Arrow-batched ``mapInPandas``.

    Output: ``(media_id, feature array<float>)`` — feeds the similarity
    operators (:mod:`sql_autoloader_spark.functions.similarity`) for
    near-duplicate detection over media.
    """
    import pandas as pd  # noqa: PLC0415 — executor-side import

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "feature": [
                        _decode_image_bytes(c) if c is not None else None
                        for c in pdf["content"]
                    ],
                }
            )

    return df.select(id_col, "content").mapInPandas(
        batches, schema=_FEATURES_SCHEMA
    )


def resize_images(
    df: DataFrame,
    *,
    width: int = 224,
    height: int = 224,
    id_col: str = "media_id",
) -> DataFrame:
    """Resize assets to a fixed shape via Arrow-batched ``mapInPandas`` —
    the standard pre-training normalization stage (decode → scale →
    re-encode).  The codec call is STUBBED (no image libs in this
    container): the fake "resized" payload is a deterministic function of
    the input bytes and target shape, but the Spark-side plumbing —
    schema ``(media_id, width, height, resized binary)``, per-batch
    streaming, null passthrough — is the production shape.  Swap the
    body of ``_fake_resize`` for PIL/libvips on a real cluster.
    """
    import pandas as pd  # noqa: PLC0415 — executor-side import

    def _fake_resize(content: bytes) -> bytes:
        # deterministic stand-in: tile/truncate the payload to w*h bytes
        target = max(width * height // 64, 1)
        reps = (target // max(len(content), 1)) + 1
        return (content * reps)[:target]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "width": width,
                    "height": height,
                    "resized": [
                        _fake_resize(c) if c is not None else None
                        for c in pdf["content"]
                    ],
                }
            )

    return df.select(id_col, "content").mapInPandas(
        batches,
        schema=(
            "media_id long, width int, height int, resized binary"
        ),
    )


def sample_frames(
    df: DataFrame,
    *,
    every_n_bytes: int = 1024,
    max_frames: int = 8,
    id_col: str = "media_id",
) -> DataFrame:
    """Frame sampling for video assets (STUB codec).

    The real implementation seeks keyframes via the container index;
    the stub slices the byte stream at fixed strides — the *plumbing*
    (one input row → up to ``max_frames`` output rows, streamed per
    Arrow batch) is the production shape for a frame-explosion stage.
    """
    import pandas as pd  # noqa: PLC0415

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            indexes: list[int] = []
            frames: list[bytes | None] = []
            for media_id, content in zip(pdf[id_col], pdf["content"]):
                if content is None:
                    continue
                for i in range(min(max_frames, max(len(content) // every_n_bytes, 1))):
                    ids.append(media_id)
                    indexes.append(i)
                    frames.append(
                        bytes(content[i * every_n_bytes : (i + 1) * every_n_bytes])
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": indexes, "frame": frames}
            )

    return df.select(id_col, "content").mapInPandas(
        batches, schema=_FRAMES_SCHEMA
    )


def media_neardup_pairs(
    df: DataFrame,
    *,
    threshold: float = 0.95,
    max_bucket_size: int | None = 256,
) -> DataFrame:
    """Near-duplicate media pairs: extract features, then reuse the
    embedding LSH machinery (decode once, bucket, verify).

    ``max_bucket_size`` defaults ON here (unlike the raw embedding
    variant): low-entropy feature spaces — byte histograms, thumbnails,
    the stub codec — concentrate giant near-identical clusters into
    single LSH buckets, and an uncapped bucket self-join is quadratic
    in cluster size.  Oversized buckets pair members with the bucket
    representative only (linear)."""
    from sql_autoloader_spark.functions.similarity import (
        embedding_neardup_pairs,
    )

    feats = extract_features(df)
    return embedding_neardup_pairs(
        feats,
        id_col="media_id",
        vec_col="feature",
        dim=FEATURE_DIM,
        threshold=threshold,
        max_bucket_size=max_bucket_size,
    )
