"""Multimodal columns (SURVEY §2.12): image/audio/video payloads are
opaque ``binary`` columns with a typed metadata struct alongside.

The Spark-side plumbing here is real and tested — schema, Arrow-batched
``mapInPandas``, partition sizing — while the actual media decode is
STUBBED (the container ships no image/audio libraries): decode raises
``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic synthetic feature extractor so the distributed pipeline
shape is exercised end-to-end.

Design notes for 100 TB of media:
- payloads never become shuffle keys or join keys; all grouping happens
  on metadata/ids,
- feature extraction is ``mapInPandas`` (Arrow batches, vectorized per
  partition, zero shuffles),
- ``spark.sql.files.maxPartitionBytes`` bounds per-task memory since
  binary columns dominate row size.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = (
    "id long, n_bytes long, content_md5 string, media_type string"
)
FEATURE_SCHEMA = "id long, feature array<double>, width int, height int"


def with_binary_payload(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Wrap a content column as the canonical multimodal layout:
    (id, payload binary, media_type). In production the payload comes
    off the lake as raw bytes (spark.read.format('binaryFile') or a
    bytes column in parquet); here text bytes stand in."""
    return df.select(
        F.col(id_col).alias("id"),
        F.encode(F.col(content_col), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
    )


def extract_metadata(df: DataFrame) -> DataFrame:
    """Metadata extraction over binary payloads — pure JVM built-ins
    (``md5`` and ``octet_length`` both accept binary), so 100 TB of
    media never crosses the Arrow boundary just to be sized and hashed.
    Python enters only where a real decoder is needed
    (``decode_features``)."""
    return df.select(
        F.col("id").cast("long").alias("id"),
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("content_md5"),
        "media_type",
    )


def decode_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Media decode + feature extraction. STUB: real decoding needs
    image/audio libraries not present in this environment; ``fake=True``
    runs a deterministic synthetic extractor (md5-derived 4-dim feature)
    through the identical mapInPandas plumbing."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires PIL/ffmpeg-class libraries; "
                    "run with fake=True for the deterministic stub"
                )
            feats, widths, heights = [], [], []
            for b in pdf["payload"]:
                digest = hashlib.md5(bytes(b)).digest()
                feats.append([d / 255.0 for d in digest[:4]])
                widths.append(digest[4] + 1)
                heights.append(digest[5] + 1)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "feature": feats,
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                }
            )

    return df.mapInPandas(fn, FEATURE_SCHEMA)
