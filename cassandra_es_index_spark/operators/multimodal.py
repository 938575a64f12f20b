"""Multimodal (image/audio/video) column plumbing.

The reference refuses to index blobs (``"<N> bytes"`` placeholder,
ref CStarUtils.java:305-306). This engine treats media as first-class
opaque ``binary`` columns with a typed metadata struct, and runs
decode/feature steps as Arrow-batched pandas transforms over
``mapInPandas`` — the schema, partitioning, UDF signature and batch shapes
are real and tested; only the codec itself is stubbed (image/audio libs
are not in this container).

Scale design: media rows are *much* wider than text rows, so every
transform here is ``mapInPandas`` (streamed Arrow batches, no
driver-side materialization), metadata-only predicates are plain Column
expressions that push down to the parquet scan without touching bytes,
and feature extraction emits fixed-size vectors so downstream similarity
joins partition evenly.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_METADATA = T.StructType([
    T.StructField("media_type", T.StringType()),   # image|audio|video
    T.StructField("format", T.StringType()),       # png|jpeg|wav|mp4|…
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
])

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("content", T.BinaryType()),
    T.StructField("meta", MEDIA_METADATA),
])


class MediaDecodeNotAvailable(NotImplementedError):
    """Raised by the real decode path — codecs are not in this image."""


def _fake_features(content: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real feature extractor: expand the md5
    of the bytes into ``dim`` floats in [0,1). Keeps the full pipeline
    testable end-to-end with stable outputs."""
    out: list[float] = []
    counter = 0
    while len(out) < dim:
        h = hashlib.md5(content + counter.to_bytes(4, "big")).digest()
        out.extend(b / 255.0 for b in h)
        counter += 1
    return out[:dim]


def attach_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Fill the cheap metadata fields from the bytes themselves (n_bytes)
    without decoding — a pure Column transform that stays JVM-side."""
    return df.withColumn(
        "meta",
        F.struct(
            F.col("meta.media_type").alias("media_type"),
            F.col("meta.format").alias("format"),
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
            F.length(F.col(content_col)).cast("long").alias("n_bytes"),
        ),
    )


def extract_features(df: DataFrame, dim: int = 64,
                     content_col: str = "content",
                     id_col: str = "media_id",
                     use_stub: bool = True) -> DataFrame:
    """Media → feature vectors via ``mapInPandas`` (Arrow batches).

    ``use_stub=True`` uses the deterministic fake extractor; False raises
    ``MediaDecodeNotAvailable`` per batch (the real codec isn't shipped).
    Output: (media_id, features array<double>) — ready for
    ``operators.similarity`` joins.
    """
    schema = T.StructType([
        T.StructField("media_id", T.StringType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not use_stub:
                raise MediaDecodeNotAvailable(
                    "media codecs are not available in this environment")
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype(str),
                "features": [
                    _fake_features(bytes(c) if c is not None else b"", dim)
                    for c in pdf[content_col]
                ],
            })

    return df.select(id_col, content_col).mapInPandas(batches, schema)


def resize_images(df: DataFrame, width: int, height: int,
                  content_col: str = "content",
                  id_col: str = "media_id",
                  use_stub: bool = True) -> DataFrame:
    """Image resize as ``mapInPandas`` plumbing (Arrow batches, full media
    schema out). The pixel work is stubbed — codecs are not in this image —
    but the schema, batch shape and metadata propagation are real:
    ``meta.width``/``meta.height`` become the target size, ``n_bytes``
    tracks the (stub) output bytes. ``use_stub=False`` raises
    ``MediaDecodeNotAvailable`` per batch, the real-codec seam."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not use_stub:
                raise MediaDecodeNotAvailable(
                    "media codecs are not available in this environment")
            contents, metas = [], []
            for content, meta in zip(pdf[content_col], pdf["meta"]):
                raw = bytes(content) if content is not None else b""
                # deterministic stand-in for decoded+resized pixels
                fake = hashlib.md5(
                    raw + f"{width}x{height}".encode()).digest() * 4
                contents.append(fake)
                meta = dict(meta) if meta is not None else {}
                meta.update(width=width, height=height,
                            n_bytes=len(fake))
                metas.append(meta)
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype(str),
                "content": contents,
                "meta": metas,
            })

    return df.select(id_col, content_col, "meta").mapInPandas(
        batches, MEDIA_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 1000,
                 id_col: str = "media_id") -> DataFrame:
    """Video → sampled frame rows (one row per sampled timestamp).

    The frame *timestamps* come from metadata (pure Column math — a
    ``sequence`` + ``explode``, no decode); the frame *bytes* would come
    from the codec and are stubbed as NULL binary here.
    """
    ts = F.sequence(F.lit(0).cast("long"),
                    F.greatest(F.col("meta.duration_ms").cast("long") - 1, F.lit(0)),
                    F.lit(every_ms).cast("long"))
    return (df.where(F.col("meta.media_type") == "video")
              .select(F.col(id_col), F.explode(ts).alias("frame_ts_ms"))
              .withColumn("frame", F.lit(None).cast("binary")))
