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

import functools as _functools
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


try:  # preferred codec when the environment ships one (import-gated)
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover - container has no PIL
    _PILImage = None

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png(content: bytes) -> tuple[int, int, int, bytes]:
    """Stdlib-only PNG decode: 8-bit gray / gray+alpha / RGB / RGBA,
    non-interlaced.

    A real decode with zero dependencies beyond ``zlib``/``struct``
    (numpy only vectorizes the unfilter): chunk walk → concatenated
    IDAT inflate → per-scanline unfilter for all five PNG filter types
    (None/Sub/Up/Average/Paeth, spec §9).  Returns ``(width, height,
    channels, pixels)`` with pixels row-major, channel-interleaved.
    Raises ``ValueError`` for non-PNG bytes or unsupported variants
    (16-bit, palette, interlaced) — callers fall back.
    """
    import struct
    import zlib

    import numpy as np  # noqa: PLC0415 — executor-side import

    if not content.startswith(_PNG_SIG):
        msg = "not a PNG signature"
        raise ValueError(msg)
    pos = 8
    width = height = channels = None
    idat = bytearray()
    while pos + 8 <= len(content):
        length, ctype = struct.unpack(">I4s", content[pos : pos + 8])
        data = content[pos + 8 : pos + 8 + length]
        pos += 12 + length  # chunk header + payload + CRC
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if depth != 8 or interlace != 0:
                msg = f"unsupported PNG (depth={depth}, interlace={interlace})"
                raise ValueError(msg)
            channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
            if channels is None:
                msg = f"unsupported PNG color type {color}"
                raise ValueError(msg)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        msg = "truncated PNG (missing IHDR or IDAT)"
        raise ValueError(msg)
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        msg = "PNG payload size mismatch"
        raise ValueError(msg)
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    bpp = channels
    for y in range(height):
        fbyte = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if fbyte == 0:  # None
            cur = line
        elif fbyte == 2:  # Up — vectorized
            cur = (line + prev) & 0xFF
        elif fbyte in (1, 3, 4):  # Sub/Average/Paeth need the left pixel
            cur = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                if fbyte == 1:
                    pred = a
                elif fbyte == 3:
                    pred = (a + b) >> 1
                else:
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = (
                        a
                        if pa <= pb and pa <= pc
                        else (b if pb <= pc else c)
                    )
                cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            msg = f"bad PNG filter byte {fbyte}"
            raise ValueError(msg)
        out[y] = cur
        prev = cur
    return width, height, channels, out.tobytes()


def _luma_plane(pixels: bytes, channels: int) -> "np.ndarray":
    """Grayscale plane (ITU-R 601 luma, PIL ``convert('L')``-compatible)
    from row-major channel-interleaved 8-bit samples.

    PIL's fixed-point conversion TRUNCATES (ImagingConvert.c: ``L24(in)
    >> 16``, no rounding term) — matching it bit-for-bit keeps feature
    vectors identical between PIL-present and PIL-absent environments
    at histogram-bin edges."""
    import numpy as np  # noqa: PLC0415 — executor-side import

    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(-1, channels)
    if channels <= 2:  # gray / gray+alpha: first channel IS luma
        return arr[:, 0].astype(np.int64)
    a = arr.astype(np.int64)
    return (a[:, 0] * 19595 + a[:, 1] * 38470 + a[:, 2] * 7471) >> 16


def _png_luma(content: bytes) -> list[int]:
    """Luma pixel values of a decoded PNG (see :func:`_luma_plane`)."""
    _w, _h, channels, pixels = decode_png(content)
    return [int(v) for v in _luma_plane(pixels, channels)]


def encode_png(
    width: int,
    height: int,
    channels: int,
    pixels: list[int] | bytes,
    *,
    filter_type: int = 0,
    compress_level: int = -1,
) -> bytes:
    """Stdlib-only PNG encode (8-bit gray/gray+alpha/RGB/RGBA,
    non-interlaced) — the re-encode half of :func:`decode_png`.

    *filter_type* selects ONE per-row filter for the whole image
    (0=None … 4=Paeth, spec §9); a production encoder would pick
    per-row, but a fixed choice keeps output deterministic — what the
    synthetic media fixtures need — while still exercising every
    unfilter path of the decoder.  Round-trip property:
    ``decode_png(encode_png(w, h, c, p, filter_type=f)) == (w, h, c,
    bytes(p))`` for every ``f``.

    *compress_level* is passed to ``zlib.compress``; level 0 emits
    stored (uncompressed) DEFLATE blocks, making the total PNG size a
    pure arithmetic function of the dimensions — for payloads under
    64 KiB exactly ``height*(1 + width*channels) + 68`` bytes (8 sig
    + 25 IHDR + 12 IDAT framing + 11 zlib/stored-block overhead +
    payload + 12 IEND).  The synthetic fixtures use this so a SQL
    oracle can recompute ``n_bytes`` without running a codec.
    """
    import struct
    import zlib

    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    stride = width * channels
    raw = bytearray()
    prev = [0] * stride
    for y in range(height):
        row = list(pixels[y * stride : (y + 1) * stride])
        raw.append(filter_type)
        for x in range(stride):
            a = row[x - channels] if x >= channels else 0
            b = prev[x]
            c = prev[x - channels] if x >= channels else 0
            if filter_type == 0:
                pred = 0
            elif filter_type == 1:
                pred = a
            elif filter_type == 2:
                pred = b
            elif filter_type == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = (
                    a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                )
            raw.append((row[x] - pred) & 0xFF)
        prev = row
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), compress_level))
        + chunk(b"IEND", b"")
    )


@_functools.lru_cache(maxsize=512)
def synthesize_png(seed: int) -> bytes:
    """Deterministic synthetic PNG for a content key *seed* — the media
    fixture generator.  Every parameter is a pure arithmetic function
    of ``seed`` so a SQL oracle (DuckDB) can recompute byte sizes and
    pixel statistics without any codec:

    - ``channels = 1 + seed % 4`` (gray / gray+alpha / RGB / RGBA)
    - ``width  = 16 + seed % 9``, ``height = 16 + (seed // 3) % 7``
    - ``filter_type = seed % 5`` (the registered path exercises every
      PNG unfilter branch of :func:`decode_png`)
    - sample ``j``: ``value = (seed*7 + j*13) % m`` with
      ``m = 32 + seed % 224`` (the seed-dependent modulus spreads the
      luma histograms apart so near-dup detection stays selective)
    - stored-block zlib (``compress_level=0``) ⇒ total size is exactly
      ``height*(1 + width*channels) + 68`` bytes

    Cached per worker process: fixtures draw seeds from a small
    modulus, so each of the ≤512 distinct images encodes once.
    """
    channels = 1 + seed % 4
    width = 16 + seed % 9
    height = 16 + (seed // 3) % 7
    m = 32 + seed % 224
    n = width * height * channels
    pixels = bytes((seed * 7 + j * 13) % m for j in range(n))
    return encode_png(
        width,
        height,
        channels,
        pixels,
        filter_type=seed % 5,
        compress_level=0,
    )


def synthetic_png_media(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    modulus: int = 384,
) -> DataFrame:
    """Attach deterministic real-PNG ``content`` to an id column —
    ``(media_id, content)`` with ``content = synthesize_png(id %
    modulus)``.

    ``modulus`` below the corpus size deliberately injects exact
    duplicate assets (ids congruent mod ``modulus`` share bytes), so
    content-hash dedup has real work and a SQL oracle can predict the
    duplicate groups.  Ids must be non-negative (Python and SQL ``%``
    disagree on negatives).

    Execution: the ≤``modulus`` distinct PNGs are generated ONCE on
    the driver and broadcast-joined to the ids as a JVM
    ``LocalRelation`` (``ops.local_frame`` — a plain ``createDataFrame``
    would pin a Python-RDD scan into every broadcast build) — the
    per-row plan is pure JVM (no Python stage, no per-row Arrow
    transfer of repeated bytes); NULL ids get NULL content through the
    left join.  The decode-side operators (resize, pixel_stats,
    features) still run their real Arrow ``mapInPandas`` stages over
    the content.
    """
    from sql_autoloader_spark.ops.dataframe_ops import local_frame

    spark = df.sparkSession
    mapping = local_frame(
        spark,
        [(k, synthesize_png(k)) for k in range(modulus)],
        "__k long, content binary",
    )
    return (
        df.select(F.col(id_col).cast("long").alias("media_id"))
        .join(
            F.broadcast(mapping),
            F.pmod(F.col("media_id"), F.lit(modulus)) == F.col("__k"),
            "left",
        )
        .select("media_id", "content")
    )


def _decode_image_bytes(content: bytes) -> list[float]:
    """Decode image bytes into a fixed-dim feature vector.

    Codec ladder: PIL when installed (any format) → the stdlib PNG
    decoder (:func:`decode_png` — real pixels, in-container, no
    dependencies) → a deterministic byte-histogram stand-in for formats
    neither path reads (JPEG etc. without PIL).  The signature
    (bytes → fixed-dim float vector) and the Spark-side plumbing
    (Arrow batches, schema, partitioning) are identical on every rung.
    """
    if content is None:
        raise NotImplementedError(
            "no media codec available in this environment; "
            "content=None cannot be decoded"
        )
    pixels: list[int] | None = None
    if _PILImage is not None:
        import io

        try:
            with _PILImage.open(io.BytesIO(content)) as img:
                pixels = list(img.convert("L").getdata())
        except Exception:  # noqa: BLE001 - undecodable by PIL
            pixels = None
    if pixels is None:
        try:
            pixels = _png_luma(content)
        except Exception:  # noqa: BLE001 — any undecodable bytes fall
            # back: corrupt PNGs raise zlib.error / struct.error, not
            # just the decoder's own ValueError, and a malformed asset
            # must degrade to the byte histogram, never fail the job
            pixels = None
    if pixels is not None:
        histogram = [0] * FEATURE_DIM
        for p in pixels:
            histogram[p * FEATURE_DIM // 256] += 1
        total = max(len(pixels), 1)
        return [count / total for count in histogram]
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


def _resize_luma(content: bytes, width: int, height: int) -> bytes:
    """Decode → grayscale → nearest-neighbor resample to a fixed shape.

    Real pixels whenever a codec on the ladder reads the bytes (PIL, or
    the stdlib PNG decoder — so PNGs resize for real in-container);
    output is the raw ``width*height`` luma plane, the tensor-feed
    layout a training pipeline wants (re-encoding to PNG is
    :func:`encode_png` if a portable artifact is needed).  Undecodable
    bytes degrade to a deterministic tile/truncate of the payload at
    the SAME output size — schema and sizing identical on every rung.
    """
    import numpy as np  # noqa: PLC0415 — executor-side import

    pixels: "np.ndarray | None" = None
    src_w = src_h = 0
    if _PILImage is not None:
        import io

        try:
            with _PILImage.open(io.BytesIO(content)) as img:
                gray = img.convert("L")
                src_w, src_h = gray.size
                pixels = np.asarray(gray.getdata(), dtype=np.int64)
        except Exception:  # noqa: BLE001 — not PIL-readable
            pixels = None
    if pixels is None:
        try:
            src_w, src_h, channels, raw = decode_png(content)
            pixels = _luma_plane(raw, channels)
        except Exception:  # noqa: BLE001 — no codec reads these bytes
            pixels = None
    if pixels is not None and src_w > 0 and src_h > 0:
        # nearest-neighbor gather, fully vectorized: one fancy-index
        # per asset instead of width*height Python iterations
        rows = np.arange(height, dtype=np.int64) * src_h // height
        cols = np.arange(width, dtype=np.int64) * src_w // width
        plane = pixels.reshape(src_h, src_w)
        return plane[rows[:, None], cols[None, :]].astype(np.uint8).tobytes()
    # deterministic stand-in at the same output size
    target = max(width * height, 1)
    reps = (target // max(len(content), 1)) + 1
    return (content * reps)[:target]


def resize_images(
    df: DataFrame,
    *,
    width: int = 224,
    height: int = 224,
    id_col: str = "media_id",
) -> DataFrame:
    """Resize assets to a fixed shape via Arrow-batched ``mapInPandas`` —
    the standard pre-training normalization stage (decode → grayscale →
    nearest-neighbor scale), REAL for any asset a codec on the ladder
    decodes (PIL when installed; the stdlib PNG decoder always).  The
    Spark-side plumbing — schema ``(media_id, width, height, resized
    binary)``, per-batch streaming, null passthrough — is the
    production shape; ``resized`` is the raw ``width*height`` luma
    plane (see :func:`_resize_luma`).
    """
    import pandas as pd  # noqa: PLC0415 — executor-side import

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "width": width,
                    "height": height,
                    "resized": [
                        _resize_luma(bytes(c), width, height)
                        if c is not None
                        else None
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


def pixel_stats(df: DataFrame, *, id_col: str = "media_id") -> DataFrame:
    """Per-asset decoded-pixel statistics via Arrow-batched
    ``mapInPandas``: ``(<id_col>, n_pixels, min_luma, max_luma,
    sum_luma, avg_luma)`` — the id column keeps its input name AND
    type.

    This is the REAL-decode audit operator: luma comes from the codec
    ladder (PIL → stdlib PNG decoder) and there is deliberately NO
    byte-histogram fallback — an asset nothing decodes yields NULL
    stats, so a corpus whose stats are non-null is *proven* to have
    gone through a real pixel decode (the property the oracle checks).
    ``sum_luma`` is the exact integer pixel sum, so oracles can verify
    without any float-division ambiguity.
    """
    import pandas as pd  # noqa: PLC0415 — executor-side import

    id_type = df.schema[id_col].dataType.simpleString()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                id_col: [],
                "n_pixels": [],
                "min_luma": [],
                "max_luma": [],
                "sum_luma": [],
                "avg_luma": [],
            }
            for mid, content in zip(pdf[id_col], pdf["content"]):
                out[id_col].append(mid)
                luma: list[int] | None = None
                if content is not None:
                    if _PILImage is not None:
                        import io

                        try:
                            with _PILImage.open(
                                io.BytesIO(bytes(content))
                            ) as img:
                                luma = list(img.convert("L").getdata())
                        except Exception:  # noqa: BLE001
                            luma = None
                    if luma is None:
                        try:
                            luma = _png_luma(bytes(content))
                        except Exception:  # noqa: BLE001
                            luma = None
                if luma:
                    total = sum(luma)
                    out["n_pixels"].append(len(luma))
                    out["min_luma"].append(min(luma))
                    out["max_luma"].append(max(luma))
                    out["sum_luma"].append(total)
                    out["avg_luma"].append(total / len(luma))
                else:
                    out["n_pixels"].append(None)
                    out["min_luma"].append(None)
                    out["max_luma"].append(None)
                    out["sum_luma"].append(None)
                    out["avg_luma"].append(None)
            yield pd.DataFrame(out)

    return df.select(id_col, "content").mapInPandas(
        batches,
        schema=(
            f"{id_col} {id_type}, n_pixels bigint, min_luma bigint, "
            "max_luma bigint, sum_luma bigint, avg_luma double"
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
    """Near-duplicate media pairs: extract features, compress exact
    duplicates, then reuse the embedding LSH machinery on the distinct
    vectors (decode once, group exactly, bucket, verify).

    Two-level structure (round 12 — the old single-level LSH pass
    provably SPLIT byte-identical duplicate groups once the bucket cap
    bound, because the star representative of a capped bucket need not
    resemble every exact-dup group inside it):

    1. **Exact-content compression**: identical feature vectors — the
       dominant duplicate mass in a media corpus (re-uploads, mirrored
       assets) — are grouped by VALUE equality, and every member pairs
       with its group's minimum id at ``sim = 1.0``.  One keyed
       aggregate; linear; guarantees byte-identical assets always land
       in one connected near-dup group regardless of bucket skew.
    2. **LSH over one representative per distinct vector**: the
       quadratic-risk candidate join runs on ``|distinct vectors|``
       rows, not ``|assets|`` (the media fixture: 5 000 assets → 383
       distinct vectors; a 100 TB corpus compresses similarly).
       ``max_bucket_size`` still bounds residual skew among *distinct*
       vectors, where the star-cap assumption (oversized buckets are
       near-identical) is actually sound.

    The pair list is connectivity-preserving, not the full quadratic
    all-pairs expansion: cross-group near-dup links are emitted at
    representative level (exact-dup stars connect the rest) — the
    contract consumers need for dedup-group formation
    (:func:`~sql_autoloader_spark.functions.dedup.connected_components`
    → keep-one policy), and the only contract that stays sub-quadratic
    when a group has millions of identical members.
    """
    from sql_autoloader_spark.functions.similarity import (
        embedding_neardup_pairs,
    )

    from pyspark.sql import Window

    feats = extract_features(df).where(F.col("feature").isNotNull())
    # one window over the feature value assigns every member its group
    # representative — ONE exchange feeding both the star expansion and
    # the rep extraction (a groupBy + re-join spelling costs three).
    # persist: pins the mapInPandas decode AND the grouping shuffle so
    # the real codec runs once per asset, not once per consumer.
    tagged = feats.withColumn(
        "__rep",
        F.min("media_id").over(Window.partitionBy("feature")),
    ).persist()
    exact_star = tagged.where(F.col("media_id") > F.col("__rep")).select(
        F.col("__rep").alias("id_a"),
        F.col("media_id").alias("id_b"),
        F.lit(1.0).alias("sim"),
    )
    reps = tagged.where(F.col("media_id") == F.col("__rep")).select(
        "media_id", "feature"
    )
    near = embedding_neardup_pairs(
        reps,
        id_col="media_id",
        vec_col="feature",
        dim=FEATURE_DIM,
        threshold=threshold,
        max_bucket_size=max_bucket_size,
    )
    return exact_star.unionByName(near)
