"""Multimodal (image/audio/video) column plumbing.

The reference refuses to index blobs (``"<N> bytes"`` placeholder,
ref CStarUtils.java:305-306). This engine treats media as first-class
opaque ``binary`` columns with a typed metadata struct, and runs
decode/feature steps as Arrow-batched pandas transforms over
``mapInPandas``. PNG/WAV (r12) and baseline JPEG (r13) decode for REAL
via stdlib/numpy codecs (functions/media_codecs.py, functions/jpeg.py);
MP4 container metadata parses for real too (functions/mp4.py, r14) —
only mp4 FRAME payloads keep the documented
``MediaDecodeNotAvailable`` seam / deterministic stub.

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
    """Raised by the real decode path for formats that need external
    codec libraries. PNG/WAV (r12) and baseline JPEG (r13) decode for
    REAL via the stdlib/numpy codecs; MP4 CONTAINER metadata parses
    for real too (functions/mp4.py, r14) — only mp4 FRAME payloads
    (H.264/AAC entropy streams) remain behind this seam."""


# formats the stdlib codecs genuinely decode (r12)
REAL_DECODE_FORMATS = ("png", "wav")


def _png_features(content: bytes, dim: int) -> list[float]:
    """REAL image features from decoded PNG pixels (r12): per-channel
    mean/std (scaled to [0,1]) + a 16-bin luminance histogram
    (L1-normalized), zero-padded / truncated to ``dim``. Deterministic
    — pure pixel arithmetic."""
    import numpy as np

    from cassandra_es_index_spark.functions.media_codecs import decode_png

    px = decode_png(content).astype(np.float64)
    feats: list[float] = []
    for c in range(px.shape[2]):
        feats.append(float(px[:, :, c].mean()) / 255.0)
        feats.append(float(px[:, :, c].std()) / 255.0)
    lum = px[:, :, : min(3, px.shape[2])].mean(axis=2)
    hist, _ = np.histogram(lum, bins=16, range=(0.0, 255.0))
    total = max(1, int(hist.sum()))
    feats.extend(float(h) / total for h in hist)
    feats = feats[:dim]
    return feats + [0.0] * (dim - len(feats))


def _jpeg_features(content: bytes, dim: int) -> list[float]:
    """REAL image features from decoded baseline-JPEG pixels (r13):
    the same pixel statistics as ``_png_features`` — per-channel
    mean/std + 16-bin luminance histogram — over the pure-numpy
    ``decode_jpeg`` output (``functions/jpeg.py``)."""
    import numpy as np

    from cassandra_es_index_spark.functions.media_codecs import (
        decode_jpeg,
    )

    px = decode_jpeg(content).astype("float64")
    if px.ndim == 2:
        px = px[:, :, None]
    feats: list[float] = []
    for c in range(px.shape[2]):
        feats.append(float(px[:, :, c].mean()) / 255.0)
        feats.append(float(px[:, :, c].std()) / 255.0)
    lum = px[:, :, : min(3, px.shape[2])].mean(axis=2)
    hist, _ = np.histogram(lum, bins=16, range=(0.0, 255.0))
    total = max(1, int(hist.sum()))
    feats.extend(float(h) / total for h in hist)
    feats = feats[:dim]
    return feats + [0.0] * (dim - len(feats))


def _wav_features(content: bytes, dim: int) -> list[float]:
    """REAL audio features from decoded PCM samples (r12): RMS, mean
    |amplitude|, zero-crossing rate, duration-seconds (log1p-scaled) +
    a 12-bin |amplitude| histogram (L1-normalized), padded/truncated
    to ``dim``."""
    import math

    import numpy as np

    from cassandra_es_index_spark.functions.media_codecs import decode_wav

    samples, rate = decode_wav(content)
    mono = samples.mean(axis=1) if samples.size else np.zeros(1)
    rms = float(np.sqrt((mono ** 2).mean()))
    mean_abs = float(np.abs(mono).mean())
    zcr = float((np.diff(np.signbit(mono)) != 0).mean()) \
        if mono.size > 1 else 0.0
    dur = math.log1p(mono.size / max(1, rate))
    hist, _ = np.histogram(np.abs(mono), bins=12, range=(0.0, 1.0))
    total = max(1, int(hist.sum()))
    feats = [rms, mean_abs, zcr, dur] \
        + [float(h) / total for h in hist]
    feats = feats[:dim]
    return feats + [0.0] * (dim - len(feats))


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

    PNG and WAV content decodes for REAL (r12 — the stdlib codecs in
    functions/media_codecs.py): pixel/sample statistics + histograms,
    deterministic. Other formats: ``use_stub=True`` uses the
    deterministic fake extractor, False raises
    ``MediaDecodeNotAvailable`` per batch (JPEG/MP4 need external
    codec libraries). The format is read from ``meta.format`` when the
    frame carries a ``meta`` column. Output: (media_id, features
    array<double>) — ready for ``operators.similarity`` joins.
    """
    schema = T.StructType([
        T.StructField("media_id", T.StringType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ])
    has_meta = "meta" in df.columns
    cols = [id_col, content_col] + (["meta"] if has_meta else [])

    def one(content, fmt) -> list[float]:
        raw = bytes(content) if content is not None else b""
        if fmt == "png":
            return _png_features(raw, dim)
        if fmt in ("jpeg", "jpg"):
            return _jpeg_features(raw, dim)
        if fmt == "wav":
            return _wav_features(raw, dim)
        if not use_stub:
            raise MediaDecodeNotAvailable(
                f"codec for format {fmt!r} is not available in this "
                "environment (real decode: png/jpeg/wav)")
        return _fake_features(raw, dim)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            fmts = ([
                (m.get("format") if isinstance(m, dict) else None)
                for m in pdf["meta"]
            ] if has_meta else [None] * len(pdf))
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype(str),
                "features": [one(c, f) for c, f
                             in zip(pdf[content_col], fmts)],
            })

    return df.select(*cols).mapInPandas(batches, schema)


def resize_images(df: DataFrame, width: int, height: int,
                  content_col: str = "content",
                  id_col: str = "media_id",
                  use_stub: bool = True) -> DataFrame:
    """Image resize as ``mapInPandas`` (Arrow batches, full media schema
    out). PNG content resizes for REAL (r12: stdlib decode →
    nearest-neighbor → re-encode); other formats keep the deterministic
    stub bytes when ``use_stub=True`` and raise
    ``MediaDecodeNotAvailable`` per batch otherwise. Metadata
    propagation is real either way: ``meta.width``/``meta.height``
    become the target size, ``n_bytes`` tracks the output bytes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from cassandra_es_index_spark.functions.media_codecs import (
            decode_png, encode_png, resize_nearest,
        )

        for pdf in it:
            contents, metas = [], []
            for content, meta in zip(pdf[content_col], pdf["meta"]):
                raw = bytes(content) if content is not None else b""
                fmt = (meta.get("format")
                       if isinstance(meta, dict) else None)
                if fmt == "png":
                    out = encode_png(resize_nearest(
                        decode_png(raw), width, height))
                elif fmt in ("jpeg", "jpg"):
                    from cassandra_es_index_spark.functions import (
                        media_codecs as mc,
                    )
                    out = mc.encode_jpeg(resize_nearest(
                        mc.decode_jpeg(raw), width, height))
                elif use_stub:
                    # deterministic stand-in for decoded+resized pixels
                    out = hashlib.md5(
                        raw + f"{width}x{height}".encode()).digest() * 4
                else:
                    raise MediaDecodeNotAvailable(
                        f"codec for format {fmt!r} is not available "
                        "in this environment (real resize: png)")
                contents.append(out)
                meta = dict(meta) if meta is not None else {}
                meta.update(width=width, height=height,
                            n_bytes=len(out))
                metas.append(meta)
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype(str),
                "content": contents,
                "meta": metas,
            })

    return df.select(id_col, content_col, "meta").mapInPandas(
        batches, MEDIA_SCHEMA)


MP4_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("major_brand", T.StringType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("timescale", T.LongType()),
    T.StructField("n_tracks", T.IntegerType()),
    T.StructField("tracks", T.ArrayType(T.StructType([
        T.StructField("track_id", T.LongType()),
        T.StructField("handler", T.StringType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("timescale", T.LongType()),
        T.StructField("language", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]))),
])


def mp4_metadata(df: DataFrame, content_col: str = "content",
                 id_col: str = "media_id") -> DataFrame:
    """MP4 container metadata via real stdlib box parsing (r14 —
    functions/mp4.py): movie duration/timescale/brand + per-track
    handler/language/dimensions from the moov tree. Arrow-batched
    ``mapInPandas`` like every media transform here (rows are wide);
    malformed containers raise the parser's typed ``Mp4ParseError``
    (no silent nulls). Frame payloads stay behind
    ``MediaDecodeNotAvailable`` — this reads structure only, never
    ``mdat``."""
    from cassandra_es_index_spark.functions.mp4 import parse_mp4

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                m = parse_mp4(bytes(content) if content is not None
                              else b"")
                rows.append({
                    "media_id": str(mid),
                    "major_brand": m["major_brand"],
                    "duration_ms": m["duration_ms"],
                    "timescale": m["timescale"],
                    "n_tracks": m["n_tracks"],
                    "tracks": m["tracks"],
                })
            yield pd.DataFrame(rows)

    return df.select(id_col, content_col).mapInPandas(
        batches, MP4_META_SCHEMA)


def frame_sample_mp4(df: DataFrame, every_ms: int = 1000,
                     content_col: str = "content",
                     id_col: str = "media_id") -> DataFrame:
    """Frame-sample timestamps from REAL container metadata (r14):
    ``mp4_metadata`` parses each video's true movie duration from its
    moov box, then one ``sequence`` + ``explode`` emits a row per
    sampled timestamp — no metadata column needed, and the timestamps
    reflect the bytes, not a caller-supplied guess. Frame *bytes* stay
    NULL (the ``MediaDecodeNotAvailable`` seam — this never reads
    ``mdat``). Zero-duration movies emit no rows."""
    if not isinstance(every_ms, int) or every_ms < 1:
        raise ValueError(
            f"every_ms must be a positive integer, got {every_ms!r}")
    meta = mp4_metadata(df, content_col, id_col)
    ts = F.sequence(F.lit(0).cast("long"),
                    F.col("duration_ms") - 1,
                    F.lit(every_ms).cast("long"))
    return (meta.where(F.col("duration_ms") > 0)
            .select(F.col("media_id").alias(id_col),
                    F.explode(ts).alias("frame_ts_ms"))
            .withColumn("frame", F.lit(None).cast("binary")))


FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("frame_ts_ms", T.LongType()),
    T.StructField("sample_ms", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_r", T.DoubleType()),
    T.StructField("mean_g", T.DoubleType()),
    T.StructField("mean_b", T.DoubleType()),
])

# intra-frame fourccs whose samples are standalone baseline JPEGs —
# decodable by functions/jpeg.py (ISO 14496-12 registers 'jpeg';
# 'mjpa'/'mjpb' are the QuickTime Motion-JPEG A/B variants whose
# fields are full JFIF streams)
_INTRA_JPEG_CODECS = {"jpeg", "mjpa", "mjpb"}

# ceiling on per-media frame ticks (r15) — the hang guard for hostile
# stts deltas; 100k ticks ≈ 28 h of video at the 1 s default
_MAX_FRAME_TICKS = 100_000


def decode_frames(df: DataFrame, every_ms: int = 1000,
                  content_col: str = "content",
                  id_col: str = "media_id") -> DataFrame:
    """REAL video frame decode for intra-frame (Motion-JPEG) tracks
    (r14): the stdlib sample tables (``functions/mp4.py::mp4_samples``)
    resolve each frame's byte range + decode time, the sample nearest
    at-or-before each ``every_ms`` tick is sliced out of ``mdat``, and
    ``functions/jpeg.py`` decodes it to pixels — one row per tick
    (``frame_ts_ms``; ``sample_ms`` is the decoded frame's own time)
    with per-channel pixel means. Inter-frame codecs (avc1/hvc1/
    mp4a…) raise the typed ``MediaDecodeNotAvailable`` naming the
    fourcc — the engine's LAST media seam, now codec payloads only.
    Arrow-batched ``mapInPandas`` (the sanctioned slow path for byte
    blobs); reference has no media handling (CStarUtils.java:305-306).
    """
    if not isinstance(every_ms, int) or every_ms < 1:
        raise ValueError(
            f"every_ms must be a positive integer, got {every_ms!r}")
    from cassandra_es_index_spark.functions.jpeg import decode_jpeg
    from cassandra_es_index_spark.functions.mp4 import mp4_samples

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                data = bytes(content) if content is not None else b""
                track = mp4_samples(data)
                codec = track["codec"]
                if codec not in _INTRA_JPEG_CODECS:
                    raise MediaDecodeNotAvailable(
                        f"frame decode for codec {codec!r} requires an "
                        f"external library (intra-frame Motion-JPEG "
                        f"{sorted(_INTRA_JPEG_CODECS)} decodes "
                        f"natively)")
                samples = track["samples"]
                if not samples:
                    continue
                end_ms = samples[-1]["time_ms"] + 1
                # tick-count ceiling (r15 fix): end_ms derives from
                # unvalidated 32-bit stts deltas, so a well-formed
                # container with timescale 1 and delta 2^32 would spin
                # this loop for ~4e12 ticks — an executor hang, not a
                # typed error. Mirror the percolate 10000-query
                # ceiling pattern: typed-reject absurd tick counts.
                n_ticks = (end_ms + every_ms - 1) // every_ms
                if n_ticks > _MAX_FRAME_TICKS:
                    raise MediaDecodeNotAvailable(
                        f"media {mid!r}: track duration {end_ms} ms at "
                        f"every_ms={every_ms} needs {n_ticks} frame "
                        f"ticks, over the {_MAX_FRAME_TICKS} ceiling — "
                        "raise every_ms or fix the sample tables")
                si, decoded_si, arr = 0, -1, None
                for tick in range(0, end_ms, every_ms):
                    # last sample decoding at-or-before the tick (the
                    # seek-to-keyframe rule; every MJPEG frame is one)
                    while (si + 1 < len(samples)
                           and samples[si + 1]["time_ms"] <= tick):
                        si += 1
                    smp = samples[si]
                    if si != decoded_si:        # decode each frame once
                        arr = decode_jpeg(data[smp["offset"]:
                                               smp["offset"]
                                               + smp["size"]])
                        decoded_si = si
                    if arr.ndim == 2:           # grayscale → 3 channels
                        means = [float(arr.mean())] * 3
                    else:
                        means = [float(arr[:, :, c].mean())
                                 for c in range(3)]
                    rows.append({
                        "media_id": str(mid),
                        "frame_ts_ms": tick,
                        "sample_ms": smp["time_ms"],
                        "width": int(arr.shape[1]),
                        "height": int(arr.shape[0]),
                        "mean_r": means[0],
                        "mean_g": means[1],
                        "mean_b": means[2],
                    })
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.select(id_col, content_col).mapInPandas(
        batches, FRAME_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 1000,
                 id_col: str = "media_id") -> DataFrame:
    """Video → sampled frame rows (one row per sampled timestamp).

    The frame *timestamps* come from metadata (pure Column math — a
    ``sequence`` + ``explode``, no decode); the frame *bytes* would come
    from the codec and are stubbed as NULL binary here. For real
    container-derived timestamps use ``frame_sample_mp4``.
    """
    ts = F.sequence(F.lit(0).cast("long"),
                    F.greatest(F.col("meta.duration_ms").cast("long") - 1, F.lit(0)),
                    F.lit(every_ms).cast("long"))
    return (df.where(F.col("meta.media_type") == "video")
              .select(F.col(id_col), F.explode(ts).alias("frame_ts_ms"))
              .withColumn("frame", F.lit(None).cast("binary")))
