"""Pure-stdlib media codecs (r12; JPEG r13): REAL decode for the
formats the container can handle without external libraries — PNG
(zlib is stdlib), WAV PCM (the ``wave`` module is stdlib), and
baseline JFIF JPEG (numpy DCT + Annex K tables,
``functions/jpeg.py`` — re-exported here). MP4/video still raise
``MediaDecodeNotAvailable`` at the call sites
(``operators/multimodal.py``): container demux + inter-frame codecs
genuinely need external libraries.

The reference never decodes media at all — it refuses blobs with a
``"<N> bytes"`` placeholder (ref CStarUtils.java:305-306) — so this
whole tier is engine-side value-add for LLM data pipelines.

Scale note: these codecs run INSIDE Arrow-batched ``mapInPandas``
workers, one media blob at a time — per-row Python cost, zero driver
involvement, no shuffle. The PNG unfilter loop is per-scanline numpy
with a per-pixel pass only for the sequential filters (Sub/Paeth) —
fine for the fixture-scale blobs the tests use; a production deployment
would swap `decode_png` for a C-backed codec behind the same signature.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

from cassandra_es_index_spark.functions.jpeg import (  # noqa: F401
    decode_jpeg, encode_jpeg,
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type → channels (palette type 3 handled via PLTE expansion)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG (gray / gray+alpha / RGB /
    RGBA / palette) to a ``(height, width, channels)`` uint8 array.
    All five scanline filters (None/Sub/Up/Average/Paeth) are
    implemented. Palette images (r13) expand through their PLTE table
    to RGB (tRNS alpha → RGBA). 16-bit and Adam7-interlaced images
    raise ValueError — the documented engine subset."""
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG (bad signature)")
    pos, width = len(_PNG_SIG), None
    height = channels = None
    paletted, plte, trns = False, None, None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + length]
        pos += 12 + length          # length + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", chunk)
            if depth != 8:
                raise ValueError(f"PNG bit depth {depth} unsupported "
                                 "(engine subset: 8)")
            if color not in _PNG_CHANNELS and color != 3:
                raise ValueError(f"PNG color type {color} unsupported "
                                 "(engine subset: gray/RGB/±alpha/"
                                 "palette)")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported "
                                 "(engine subset)")
            paletted = color == 3
            channels = 1 if paletted else _PNG_CHANNELS[color]
        elif ctype == b"PLTE":
            if len(chunk) % 3:
                raise ValueError("PNG PLTE length not a multiple of 3")
            plte = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(chunk, dtype=np.uint8)
        elif ctype == b"IDAT":
            idat.extend(chunk)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG data length mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride,
            offset=y * (stride + 1) + 1).astype(np.int32)
        if ftype == 0:                               # None
            cur = line
        elif ftype == 1:                             # Sub (sequential)
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 2:                             # Up (vectorized)
            cur = (line + prev) & 0xFF
        elif ftype == 3:                             # Average (sequential)
            cur = line.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:                             # Paeth (sequential)
            cur = line.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                cur[x] = (cur[x] + _paeth(int(a), b, c)) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ftype} invalid")
        prev = cur.astype(np.uint8)
        out[y] = prev
    px = out.reshape(height, width, channels)
    if paletted:
        if plte is None:
            raise ValueError("paletted PNG missing PLTE")
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("PNG palette index out of range")
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(len(plte), 255, dtype=np.uint8)
            alpha[: len(trns)] = trns
            return np.concatenate([rgb, alpha[idx][..., None]],
                                  axis=-1)
        return rgb
    return px


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray) -> bytes:
    """Encode a ``(height, width, channels)`` uint8 array (1/2/3/4
    channels) as a valid filter-0 PNG."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    height, width, channels = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(channels)
    if color is None:
        raise ValueError(f"{channels}-channel arrays unsupported")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    body = b"".join(b"\x00" + arr[y].astype(np.uint8).tobytes()
                    for y in range(height))
    return (_PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(body))
            + _chunk(b"IEND", b""))


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize of an (H, W, C) array — the deterministic
    resampler (no interpolation seams to pin in tests)."""
    src_h, src_w = arr.shape[:2]
    ys = (np.arange(height) * src_h // height).clip(0, src_h - 1)
    xs = (np.arange(width) * src_w // width).clip(0, src_w - 1)
    return arr[ys][:, xs]


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode PCM WAV bytes to ``(samples(n, channels) float64 in
    [-1, 1], sample_rate)`` — 8-bit unsigned and 16/32-bit signed PCM
    (what the stdlib ``wave`` module reads)."""
    with wave.open(io.BytesIO(data), "rb") as w:
        n, ch, sw = w.getnframes(), w.getnchannels(), w.getsampwidth()
        rate = w.getframerate()
        frames = w.readframes(n)
    if sw == 1:
        samples = (np.frombuffer(frames, dtype=np.uint8)
                   .astype(np.float64) - 128.0) / 128.0
    elif sw == 2:
        samples = np.frombuffer(frames, dtype="<i2") \
                    .astype(np.float64) / 32768.0
    elif sw == 4:
        samples = np.frombuffer(frames, dtype="<i4") \
                    .astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"WAV sample width {sw} unsupported")
    return samples.reshape(-1, ch), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Encode ``(n, channels)`` float64 in [-1, 1] as 16-bit PCM WAV."""
    if samples.ndim == 1:
        samples = samples[:, None]
    pcm = np.clip(np.round(samples * 32767.0), -32768, 32767) \
            .astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()
