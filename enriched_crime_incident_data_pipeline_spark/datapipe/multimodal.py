"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode/feature libraries (PIL, ffmpeg, torchaudio, …) are not in
this container, so the decode kernels are STUBBED — either raising
``NotImplementedError`` (live mode) or producing a deterministic fake
(test mode). The Spark-side plumbing is real and tested: schema,
``mapInPandas`` batch shape, Arrow transfer, partition sizing.

At 100 TB: binary payloads dominate partition size — the loader keys
``spark.sql.files.maxPartitionBytes`` down and never shuffles raw
bytes; derived features (small, columnar) are what flows into joins.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_DDL = "media_id long, kind string, n_bytes long, feature array<float>"
HIST_DDL = "media_id long, kind string, n_bytes long, hist array<long>"


def decode_image(content: bytes) -> "object":
    """STUB — real impl: PIL.Image.open(io.BytesIO(content))."""
    raise NotImplementedError("image decode requires PIL/opencv (not in container)")


def byte_hist(content: bytes, dim: int = 8) -> list[int]:
    """Exact integer byte-histogram: ``acc[i % dim] += byte``. The
    unnormalized core of :func:`fake_feature`; pure integer math, so
    it has a bit-equal SQL twin (the normalized float variant does
    not — float32 storage + round-half-even makes cross-engine
    equality fragile)."""
    acc = [0] * dim
    if content:
        for i, byte in enumerate(content):
            acc[i % dim] += byte
    return acc


def fake_feature(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature: byte-histogram moments. Lets
    the distributed plumbing be tested end-to-end without codecs."""
    if content is None or len(content) == 0:
        return [0.0] * dim
    acc = byte_hist(content, dim)
    total = float(sum(acc)) or 1.0
    return [round(v / total, 6) for v in acc]


def extract_features(media: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """binary media rows → small columnar features via Arrow-batched
    ``mapInPandas``. With ``deterministic_fake=False`` this calls the
    real (stubbed) decoder and raises until codecs are installed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for content in pdf["content"]:
                if deterministic_fake:
                    feats.append(fake_feature(content))
                else:  # pragma: no cover - requires codecs
                    decode_image(content)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [
                        0 if c is None else len(c) for c in pdf["content"]
                    ],
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "content").mapInPandas(run, FEATURE_DDL)


def extract_byte_histograms(media: DataFrame, dim: int = 8) -> DataFrame:
    """Same Arrow-batched ``mapInPandas`` plumbing as
    :func:`extract_features`, but emitting the exact integer
    ``byte_hist`` accumulators (``array<long>``) instead of the
    normalized float feature — this is the driver-oracle-checked
    face of the media-feature path (integer math is reproducible
    bit-for-bit in ANSI SQL)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [
                        0 if c is None else len(c) for c in pdf["content"]
                    ],
                    "hist": [byte_hist(c, dim) for c in pdf["content"]],
                }
            )

    return media.select("media_id", "kind", "content").mapInPandas(run, HIST_DDL)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: emits (media_id, frame_ts_ms)
    rows from duration metadata — the decode of each frame is the
    stubbed kernel. Pure column ops (sequence + explode), so the
    fan-out is JVM-side."""
    return (
        media.filter(F.col("kind") == "video")
        .filter(F.col("duration_ms").isNotNull())
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def sample_frame_offsets(
    media: DataFrame, step_ms: int = 1000, id_col: str = "media_id"
) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled frame offset,
    ``(media_id, frame_idx, offset_ms)`` for offsets
    0, step, 2·step, … < duration_ms.

    The *decode* of each frame is the stubbed kernel (`decode_image`);
    the offset fan-out itself is pure relational work
    (``explode(sequence(...))``) and runs JVM-side — at scale the
    explode multiplies rows before any binary touch, so the planner
    prunes the ``content`` column out of this path entirely unless a
    downstream stage asks for it."""
    return (
        media.filter(F.col("duration_ms").isNotNull())
        .select(
            F.col(id_col),
            F.posexplode(
                F.sequence(
                    F.lit(0),
                    F.col("duration_ms") - 1,
                    F.lit(step_ms),
                )
            ).alias("frame_idx", "offset_ms"),
        )
    )


RESIZE_DDL = (
    "media_id long, width int, height int, "
    "new_width int, new_height int, n_bytes long"
)


def resize_thumbnails(media: DataFrame, max_side: int = 224) -> DataFrame:
    """Thumbnail planning over binary media via ``mapInPandas``: fit
    (width, height) into a ``max_side`` box preserving aspect ratio.

    The pixel resample itself is the stubbed kernel (needs
    PIL/opencv); the dimension math is exact integer arithmetic
    (``new_w = w·max_side // max(w, h)``), so this stage — unlike the
    decode — has a SQL twin and is oracle-checked end-to-end through
    the Arrow batch path (`mm4_resize_plan`). Batches arrive
    columnar; content bytes are length-counted but never shuffled.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pdf["width"].astype("int64")
            h = pdf["height"].astype("int64")
            m = np.maximum(w, h)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": w.astype("int32"),
                    "height": h.astype("int32"),
                    "new_width": (w * max_side // m).astype("int32"),
                    "new_height": (h * max_side // m).astype("int32"),
                    "n_bytes": pdf["content"].map(
                        lambda b: 0 if b is None else len(b)
                    ),
                }
            )

    return media.select(
        "media_id", "width", "height", "content"
    ).mapInPandas(run, RESIZE_DDL)
