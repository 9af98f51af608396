"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata (schemas.MEDIA).

The Spark-side plumbing — schema, partition-friendly batch iteration,
Arrow-batched UDF signatures — is real and tested; the actual
decode/resize/feature kernels are STUBBED behind deterministic fakes
because no image/audio libraries exist in this container. Swapping in
PIL/ffmpeg later changes ONLY the inner function body, not the plan:
``mapInPandas`` keeps the work executor-side, Arrow-batched, and
column-pruned.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def _fake_feature(payload: bytes | None) -> list[float] | None:
    """Deterministic stand-in for a real decode+embed kernel: byte
    histogram folded into FEATURE_DIM buckets, L1-normalized.

    Replace with e.g. PIL decode + model forward; signature unchanged.
    """
    if payload is None:
        return None
    arr = np.frombuffer(payload, dtype=np.uint8)
    buckets = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM)
    total = max(int(buckets.sum()), 1)
    return [round(float(x) / total, 6) for x in buckets]


def decode_and_featurize(media: DataFrame) -> DataFrame:
    """mapInPandas over the media table: per Arrow batch, decode the
    binary payload and emit a feature vector. Column pruning still
    applies upstream (only the selected columns cross into Python).
    """
    cols = media.select("media_id", "kind", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else None
                    ),
                    "feature": pdf["payload"].map(_fake_feature),
                }
            )

    return cols.mapInPandas(run, DECODE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize stub: real implementation needs an image library.

    The plan shape is identical to decode_and_featurize (mapInPandas);
    calling it without a decoder raises — clearly marked.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image decode library not available in this environment; "
            "plug PIL/opencv into this mapInPandas kernel"
        )
        yield  # pragma: no cover

    return media.filter(F.col("kind") == "image").mapInPandas(run, media.schema)


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame offset,
    computed from metadata ONLY (no decode) — the exploded plan that a
    real ffmpeg kernel would fill with pixels.
    """
    frames = media.filter(
        (F.col("kind") == "video") & F.col("duration_ms").isNotNull()
    ).select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms)
            )
        ).alias("frame_offset_ms"),
    )
    return frames
