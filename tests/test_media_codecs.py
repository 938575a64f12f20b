"""Pure-stdlib media codecs (r12): REAL PNG (zlib) and WAV (wave)
decode, plus the multimodal tier's real feature/resize paths for those
formats. No Spark needed for the codec units; the transform tests ride
the shared session."""

import struct
import zlib

import numpy as np
import pytest

from cassandra_es_index_spark.functions.media_codecs import (
    decode_png, decode_wav, encode_png, encode_wav, resize_nearest,
)


# ------------------------------------------------------------- PNG

@pytest.mark.parametrize("shape", [(5, 7, 3), (4, 4, 4), (3, 2, 1),
                                   (2, 3, 2)])
def test_png_round_trip_all_color_types(shape):
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_png(encode_png(arr))
    assert out.shape == shape
    assert np.array_equal(out, arr)


def _filtered_png(expected: np.ndarray, ftypes: list[int]) -> bytes:
    """Build a PNG whose scanlines are filtered with the GIVEN filter
    types — an independent forward-filter implementation, so decoding
    exercises the inverse path against hand-built data."""
    h, w, c = expected.shape
    prev = np.zeros(w * c, dtype=np.int32)

    def paeth(a, b, cc):
        p = a + b - cc
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else cc)

    body = bytearray()
    for y in range(h):
        cur = expected[y].reshape(-1).astype(np.int32)
        ft = ftypes[y]
        body.append(ft)
        for x in range(w * c):
            left = int(cur[x - c]) if x >= c else 0
            up = int(prev[x])
            ul = int(prev[x - c]) if x >= c else 0
            if ft == 0:
                v = cur[x]
            elif ft == 1:
                v = cur[x] - left
            elif ft == 2:
                v = cur[x] - up
            elif ft == 3:
                v = cur[x] - ((left + up) >> 1)
            else:
                v = cur[x] - paeth(left, up, ul)
            body.append(v & 0xFF)
        prev = cur
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(t, p):
        return (struct.pack(">I", len(p)) + t + p
                + struct.pack(">I", zlib.crc32(t + p) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 2: 4, 3: 2, 4: 6}[c],
                       0, 0, 0)
    return (sig + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(body)))
            + chunk(b"IEND", b""))


def test_png_all_five_filters_decode():
    rng = np.random.default_rng(13)
    arr = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    data = _filtered_png(arr, [0, 1, 2, 3, 4])
    assert np.array_equal(decode_png(data), arr)


def test_png_typed_rejections():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF not a png")
    # palette color type (3)
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(t, p):
        return (struct.pack(">I", len(p)) + t + p
                + struct.pack(">I", zlib.crc32(t + p) & 0xFFFFFFFF))

    # palette (type 3) decodes for real since r13 — but needs a PLTE
    pal = (sig + chunk(b"IHDR",
                       struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(
               b"\x00\x00\x00" + b"\x00\x00\x00")))
    with pytest.raises(ValueError, match="missing PLTE"):
        decode_png(pal)
    deep = sig + chunk(b"IHDR",
                       struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(deep)
    adam = sig + chunk(b"IHDR",
                       struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1))
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(adam)


def test_resize_nearest_hand_case():
    arr = np.array([[[0], [10]], [[20], [30]]], dtype=np.uint8)
    out = resize_nearest(arr, 4, 4)
    assert out.shape == (4, 4, 1)
    # each source pixel expands to a 2x2 block
    assert out[0, 0, 0] == 0 and out[0, 3, 0] == 10
    assert out[3, 0, 0] == 20 and out[3, 3, 0] == 30
    down = resize_nearest(out, 2, 2)
    assert np.array_equal(down, arr)


# ------------------------------------------------------------- WAV

def test_wav_round_trip_stereo():
    t = np.linspace(0, 1, 800, endpoint=False)
    left = np.sin(2 * np.pi * 5 * t)
    right = 0.5 * np.cos(2 * np.pi * 3 * t)
    samples = np.stack([left, right], axis=1)
    out, rate = decode_wav(encode_wav(samples, 800))
    assert rate == 800 and out.shape == (800, 2)
    assert np.abs(out - samples).max() < 1e-3   # 16-bit quantization


def test_wav_8bit_decode():
    import io
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(100)
        w.writeframes(bytes([128, 255, 0, 128]))
    out, rate = decode_wav(buf.getvalue())
    assert rate == 100
    assert out[:, 0] == pytest.approx([0.0, 127 / 128, -1.0, 0.0])


# ----------------------------------------- multimodal real paths

def test_extract_features_real_png_and_wav(spark):
    from cassandra_es_index_spark.operators import multimodal

    flat = np.full((4, 4, 3), 100, dtype=np.uint8)   # constant color
    png = encode_png(flat)
    silence = encode_wav(np.zeros((400, 1)), 400)
    rows = [("img", png, ("image", "png", 4, 4, None, None)),
            ("aud", silence, ("audio", "wav", None, None, 1000, None)),
            ("vid", b"\x00\x01", ("video", "mp4", 64, 48, 500, None))]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    feats = {r["media_id"]: r["features"] for r in
             multimodal.extract_features(df, dim=24).collect()}
    # constant-color image: mean 100/255, std 0, one histogram bin = 1
    img = feats["img"]
    assert img[0] == pytest.approx(100 / 255)
    assert img[1] == pytest.approx(0.0)
    assert sorted(img[6:22])[-1] == pytest.approx(1.0)
    # silence: rms / mean-abs / zcr all 0, duration log1p(1s)
    aud = feats["aud"]
    assert aud[0] == 0.0 and aud[1] == 0.0 and aud[2] == 0.0
    assert aud[3] == pytest.approx(np.log1p(1.0))
    # mp4 still stubs deterministically (md5 expansion)
    assert len(feats["vid"]) == 24
    # and typed-raises with use_stub=False
    with pytest.raises(Exception, match="not available"):
        multimodal.extract_features(df, dim=8,
                                    use_stub=False).collect()


def test_resize_images_real_png(spark):
    from cassandra_es_index_spark.operators import multimodal

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    rows = [("img", encode_png(arr), ("image", "png", 8, 8, None, None))]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out, = multimodal.resize_images(df, width=4, height=4).collect()
    assert (out["meta"]["width"], out["meta"]["height"]) == (4, 4)
    decoded = decode_png(bytes(out["content"]))
    assert decoded.shape == (4, 4, 3)
    assert np.array_equal(decoded, resize_nearest(arr, 4, 4))


# -- baseline JPEG (r13, pure numpy + stdlib) -------------------------------


def test_jpeg_round_trip_rgb_gradient():
    import numpy as np
    from cassandra_es_index_spark.functions import jpeg

    h, w = 24, 40
    gx = np.linspace(0, 255, w)[None, :]
    gy = np.linspace(0, 255, h)[:, None]
    img = np.stack([gx + 0 * gy, 0 * gx + gy, (gx + gy) / 2],
                   axis=-1).astype(np.uint8)
    enc = jpeg.encode_jpeg(img, quality=90)
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    dec = jpeg.decode_jpeg(enc)
    assert dec.shape == img.shape
    rmse = float(np.sqrt(((dec.astype(float)
                           - img.astype(float)) ** 2).mean()))
    assert rmse < 2.0        # smooth content, q90 → near-lossless


def test_jpeg_round_trip_gray_and_odd_dims():
    import numpy as np
    from cassandra_es_index_spark.functions import jpeg

    g = np.arange(19 * 21, dtype=np.uint8).reshape(19, 21) % 200
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=95))
    assert dec.shape == (19, 21)
    assert float(np.abs(dec.astype(int) - g.astype(int)).mean()) < 4.0


def test_jpeg_quality_orders_size_and_error():
    import numpy as np
    from cassandra_es_index_spark.functions import jpeg

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    lo = jpeg.encode_jpeg(img, quality=20)
    hi = jpeg.encode_jpeg(img, quality=95)
    assert len(lo) < len(hi)
    err = {q: float(np.abs(
        jpeg.decode_jpeg(e).astype(float) - img.astype(float)).mean())
        for q, e in (("lo", lo), ("hi", hi))}
    assert err["hi"] < err["lo"]


def test_jpeg_420_round_trip():
    import numpy as np
    from cassandra_es_index_spark.functions import jpeg

    h, w = 24, 40
    gx = np.linspace(0, 255, w)[None, :]
    gy = np.linspace(0, 255, h)[:, None]
    img = np.stack([gx + 0 * gy, 0 * gx + gy, (gx + gy) / 2],
                   axis=-1).astype(np.uint8)
    enc = jpeg.encode_jpeg(img, quality=90, subsampling="4:2:0")
    dec = jpeg.decode_jpeg(enc)
    assert dec.shape == img.shape
    rmse = float(np.sqrt(((dec.astype(float)
                           - img.astype(float)) ** 2).mean()))
    assert rmse < 5.0        # chroma is 2x2 box-mean, luma unchanged
    # luma survives nearly exactly despite the chroma subsampling
    ylum = 0.299 * img[..., 0] + 0.587 * img[..., 1] \
        + 0.114 * img[..., 2]
    dlum = 0.299 * dec[..., 0] + 0.587 * dec[..., 1] \
        + 0.114 * dec[..., 2]
    assert float(np.abs(ylum - dlum).mean()) < 1.5
    # odd dims still crop exactly
    assert jpeg.decode_jpeg(jpeg.encode_jpeg(
        img[:19, :21], subsampling="4:2:0")).shape == (19, 21, 3)


def test_jpeg_typed_rejections():
    import struct

    import numpy as np
    import pytest
    from cassandra_es_index_spark.functions import jpeg

    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode_jpeg(b"not a jpeg")
    # progressive (SOF2) rejects by marker class
    sof2 = (b"\xff\xd8" + b"\xff\xc2" + struct.pack(">H", 11)
            + bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1])
            + bytes([1, 0x11, 0]))
    with pytest.raises(ValueError, match="baseline sequential"):
        jpeg.decode_jpeg(sof2)
    # sampling factors above 2 reject (4:2:0/4:2:2 decode for real)
    sof44 = (b"\xff\xd8" + b"\xff\xc0" + struct.pack(">H", 17)
             + bytes([8]) + struct.pack(">HH", 16, 16) + bytes([3])
             + bytes([1, 0x44, 0, 2, 0x11, 1, 3, 0x11, 1]))
    with pytest.raises(ValueError, match="sampling factors"):
        jpeg.decode_jpeg(sof44)
    with pytest.raises(ValueError, match="subsampling"):
        jpeg.encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8),
                         subsampling="4:1:1")
    with pytest.raises(ValueError, match="quality"):
        jpeg.encode_jpeg(np.zeros((8, 8), dtype=np.uint8), quality=0)
    with pytest.raises(ValueError, match="uint8"):
        jpeg.encode_jpeg(np.zeros((8, 8), dtype=np.float64))


def test_jpeg_multimodal_features_and_resize(spark):
    import numpy as np
    from cassandra_es_index_spark.functions import jpeg
    from cassandra_es_index_spark.operators import multimodal
    import pandas as pd

    imgs = [np.full((8, 8, 3), v, dtype=np.uint8) for v in (10, 200)]
    pdf = pd.DataFrame({
        "media_id": ["a", "b"],
        "content": [jpeg.encode_jpeg(i, quality=95) for i in imgs],
        "meta": [{"media_type": "image", "format": "jpeg", "width": 8,
                  "height": 8, "duration_ms": None, "n_bytes": None}
                 for _ in imgs]})
    df = spark.createDataFrame(pdf, multimodal.MEDIA_SCHEMA)
    feats = {r["media_id"]: r["features"]
             for r in multimodal.extract_features(
                 df, dim=8, use_stub=False).collect()}
    # constant images: mean ≈ v/255, std ≈ 0 (quantization noise only)
    assert abs(feats["a"][0] - 10 / 255) < 0.02
    assert abs(feats["b"][0] - 200 / 255) < 0.02
    assert feats["a"][1] < 0.02 and feats["b"][1] < 0.02
    out = multimodal.resize_images(df, 4, 4, use_stub=False).collect()
    for r in out:
        dec = jpeg.decode_jpeg(bytes(r["content"]))
        assert dec.shape == (4, 4, 3)
        assert r["meta"]["width"] == 4 and r["meta"]["height"] == 4


def test_png_palette_decode_with_and_without_trns():
    import struct
    import zlib

    import numpy as np
    from cassandra_es_index_spark.functions import media_codecs as mc

    def chunk(t, p):
        return (struct.pack(">I", len(p)) + t + p
                + struct.pack(">I", zlib.crc32(t + p) & 0xFFFFFFFF))

    w, h = 4, 3
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    raw = b"".join(b"\x00" + bytes([(x + y) % 4 for x in range(w)])
                   for y in range(h))
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"PLTE", palette)
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    px = mc.decode_png(png)
    assert px.shape == (3, 4, 3)
    assert px[0, 0].tolist() == [255, 0, 0]
    assert px[2, 3].tolist() == [0, 255, 0]      # (3+2) % 4 = 1
    # tRNS: alpha per palette entry, missing entries opaque
    png2 = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"PLTE", palette) + chunk(b"tRNS", bytes([0, 128]))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))
    px2 = mc.decode_png(png2)
    assert px2.shape == (3, 4, 4)
    assert px2[0, 0].tolist() == [255, 0, 0, 0]
    assert px2[0, 1].tolist() == [0, 255, 0, 128]
    assert px2[0, 2].tolist() == [0, 0, 255, 255]
    # out-of-range palette index is typed
    raw_bad = b"\x00" + bytes([9] * w) + raw[w + 1:]
    png3 = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"PLTE", palette)
            + chunk(b"IDAT", zlib.compress(raw_bad))
            + chunk(b"IEND", b""))
    import pytest
    with pytest.raises(ValueError, match="palette index"):
        mc.decode_png(png3)


# ------------------------------ mp4 container metadata (r14)


def test_mp4_build_parse_round_trip():
    from cassandra_es_index_spark.functions.mp4 import build_mp4, parse_mp4

    data = build_mp4(5500, tracks=[
        {"track_id": 1, "handler": "vide", "duration_ms": 5500,
         "language": "und", "width": 64, "height": 36},
        {"track_id": 2, "handler": "soun", "duration_ms": 5400,
         "language": "eng", "width": 0, "height": 0}])
    m = parse_mp4(data)
    assert (m["major_brand"], m["duration_ms"], m["timescale"],
            m["n_tracks"]) == ("isom", 5500, 1000, 2)
    v, a = m["tracks"]
    assert (v["track_id"], v["handler"], v["width"], v["height"],
            v["language"], v["duration_ms"]) == (1, "vide", 64, 36,
                                                 "und", 5500)
    assert (a["handler"], a["duration_ms"], a["language"]) == \
        ("soun", 5400, "eng")


def test_mp4_v1_64bit_layout():
    from cassandra_es_index_spark.functions.mp4 import build_mp4, parse_mp4

    m = parse_mp4(build_mp4(
        7200, tracks=[{"track_id": 9, "handler": "vide",
                       "duration_ms": 7200, "language": "fra",
                       "width": 128, "height": 72}], version=1))
    assert m["duration_ms"] == 7200
    t = m["tracks"][0]
    assert (t["track_id"], t["language"], t["width"]) == (9, "fra", 128)


def test_mp4_largesize_and_to_eof_boxes_skip():
    from cassandra_es_index_spark.functions.mp4 import build_mp4, parse_mp4

    data = build_mp4(100, tracks=[])
    base = parse_mp4(data)
    large = (1).to_bytes(4, "big") + b"free" + (16).to_bytes(8, "big")
    assert parse_mp4(data + large) == base       # 64-bit size skipped
    to_eof = (0).to_bytes(4, "big") + b"free" + b"xx"
    assert parse_mp4(data + to_eof) == base      # size-0 = to EOF


def test_mp4_typed_errors():
    import pytest

    from cassandra_es_index_spark.functions.mp4 import (
        Mp4ParseError, build_mp4, parse_mp4,
    )

    data = build_mp4(100, tracks=[{"track_id": 1, "handler": "vide",
                                   "duration_ms": 100,
                                   "language": "und",
                                   "width": 4, "height": 4}])
    with pytest.raises(Mp4ParseError, match="overruns|truncated"):
        parse_mp4(data[:20])                     # cut mid-box
    with pytest.raises(Mp4ParseError, match="no moov"):
        parse_mp4((8).to_bytes(4, "big") + b"free")
    with pytest.raises(Mp4ParseError, match="major brand"):
        parse_mp4((9).to_bytes(4, "big") + b"ftyp\x00")
    with pytest.raises(Mp4ParseError, match="truncated box header"):
        parse_mp4(b"\x00\x00")
    # zero timescale in mvhd is typed (never a ZeroDivisionError)
    bad = bytearray(build_mp4(100, timescale=1000, tracks=[]))
    i = bad.find(b"mvhd") + 4 + 4 + 4 + 4        # type+vf+c+m → timescale
    bad[i:i + 4] = (0).to_bytes(4, "big")
    with pytest.raises(Mp4ParseError, match="timescale"):
        parse_mp4(bytes(bad))
    with pytest.raises(ValueError, match="3 lowercase"):
        build_mp4(100, tracks=[{"track_id": 1, "handler": "vide",
                                "duration_ms": 100, "language": "EN",
                                "width": 0, "height": 0}])
    with pytest.raises(ValueError, match="version"):
        build_mp4(100, version=2)


def test_mp4_metadata_operator(spark):
    from cassandra_es_index_spark.functions.mp4 import build_mp4
    from cassandra_es_index_spark.operators import multimodal

    rows = [("m1", build_mp4(3000, tracks=[
                {"track_id": 1, "handler": "vide", "duration_ms": 3000,
                 "language": "und", "width": 32, "height": 18}])),
            ("m2", build_mp4(4000, tracks=[
                {"track_id": 1, "handler": "soun", "duration_ms": 4000,
                 "language": "deu", "width": 0, "height": 0}],
                version=1))]
    df = spark.createDataFrame(rows, "media_id string, content binary")
    got = {r["media_id"]: r for r in
           multimodal.mp4_metadata(df).collect()}
    assert got["m1"]["duration_ms"] == 3000
    assert got["m1"]["tracks"][0]["width"] == 32
    assert got["m2"]["n_tracks"] == 1
    assert got["m2"]["tracks"][0]["language"] == "deu"
    # frame decode is still the typed seam: extract_features without
    # the stub refuses mp4 content
    import pandas as pd
    import pytest

    mdf = spark.createDataFrame(
        pd.DataFrame({
            "media_id": ["m1"], "content": [rows[0][1]],
            "meta": [{"media_type": "video", "format": "mp4",
                      "width": None, "height": None,
                      "duration_ms": 3000, "n_bytes": None}]}),
        multimodal.MEDIA_SCHEMA)
    with pytest.raises(Exception, match="not available"):
        multimodal.extract_features(mdf, dim=8, use_stub=False).collect()


def test_frame_sample_mp4_real_durations(spark):
    import pytest

    from cassandra_es_index_spark.functions.mp4 import build_mp4
    from cassandra_es_index_spark.operators import multimodal

    rows = [("v1", build_mp4(2500, tracks=[
                {"track_id": 1, "handler": "vide", "duration_ms": 2500,
                 "language": "und", "width": 8, "height": 8}])),
            ("v0", build_mp4(0, tracks=[]))]
    df = spark.createDataFrame(rows, "media_id string, content binary")
    got = sorted((r["media_id"], r["frame_ts_ms"]) for r in
                 multimodal.frame_sample_mp4(df, every_ms=1000)
                 .collect())
    # v1: 2500ms at 1000ms steps -> 0, 1000, 2000; v0: no rows
    assert got == [("v1", 0), ("v1", 1000), ("v1", 2000)]
    with pytest.raises(ValueError, match="every_ms"):
        multimodal.frame_sample_mp4(df, every_ms=0)


# ------------------------------ mp4 sample tables + MJPEG frames (r14)


def _mjpeg(colors, frame_ms=400, quality=95, codec="jpeg"):
    import numpy as np

    from cassandra_es_index_spark.functions.jpeg import encode_jpeg
    from cassandra_es_index_spark.functions.mp4 import build_mp4_video

    frames = [encode_jpeg(np.full((4, 4, 3), c, dtype=np.uint8),
                          quality=quality) for c in colors]
    return build_mp4_video(frames, frame_ms=frame_ms, width=4,
                           height=4, codec=codec)


def test_mp4_samples_round_trip():
    from cassandra_es_index_spark.functions.jpeg import decode_jpeg
    from cassandra_es_index_spark.functions.mp4 import mp4_samples

    data = _mjpeg([10, 20, 30], frame_ms=40)
    s = mp4_samples(data)
    assert (s["codec"], s["track_id"]) == ("jpeg", 1)
    assert [x["time_ms"] for x in s["samples"]] == [0, 40, 80]
    # constant gray at q95 decodes bit-exactly (the JPEG oracle rule)
    for smp, c in zip(s["samples"], (10, 20, 30)):
        arr = decode_jpeg(data[smp["offset"]:smp["offset"]
                               + smp["size"]])
        assert arr.shape == (4, 4, 3) and int(arr[0, 0, 0]) == c


def test_mp4_samples_typed_errors():
    import pytest

    from cassandra_es_index_spark.functions.mp4 import (
        Mp4ParseError, build_mp4, mp4_samples,
    )

    meta_only = build_mp4(1000, tracks=[
        {"track_id": 1, "handler": "vide", "duration_ms": 1000,
         "language": "und", "width": 4, "height": 4}])
    with pytest.raises(Mp4ParseError, match="complete sample table"):
        mp4_samples(meta_only)
    data = _mjpeg([10, 20])
    with pytest.raises(Mp4ParseError, match="complete sample table"):
        mp4_samples(data, track_id=7)
    # truncating mdat makes the last sample overrun the file
    with pytest.raises(Mp4ParseError, match="overruns"):
        mp4_samples(data[:-200] + data[-150:])


def test_mp4_stsc_multi_chunk_expansion():
    from cassandra_es_index_spark.functions.mp4 import (
        _expand_chunks, Mp4ParseError,
    )
    import pytest

    # 5 chunks: first two hold 3 samples, rest hold 1 -> 3,3,1,1,1
    assert _expand_chunks([(1, 3), (3, 1)], 5, 9) == [3, 3, 1, 1, 1]
    with pytest.raises(Mp4ParseError, match="disagree"):
        _expand_chunks([(1, 2)], 3, 5)
    with pytest.raises(Mp4ParseError, match="chunk 1"):
        _expand_chunks([(2, 1)], 2, 2)


def test_decode_frames_mjpeg(spark):
    import pandas as pd

    from cassandra_es_index_spark.operators import multimodal

    df = spark.createDataFrame(
        pd.DataFrame({"media_id": ["a", "b"],
                      "content": [_mjpeg([100, 200, 50]),
                                  _mjpeg([7])]}),
        "media_id string, content binary")
    # every_ms=300 vs 400ms frames: ticks 0,300,600 -> samples 0,0,1
    got = sorted((r["media_id"], r["frame_ts_ms"], r["sample_ms"],
                  r["mean_r"]) for r in
                 multimodal.decode_frames(df, every_ms=300).collect())
    assert got == [("a", 0, 0, 100.0), ("a", 300, 0, 100.0),
                   ("a", 600, 400, 200.0), ("b", 0, 0, 7.0)]


def _audio_first(data):
    """Rebuild a ``build_mp4_video`` file's moov with a FULL-sample-
    table audio trak (mp4a / 'soun', track 2) listed BEFORE the video
    trak — the real-world MJPEG layout the r15 track-selection fix
    targets."""
    from cassandra_es_index_spark.functions import mp4 as M

    moov_s = moov_e = None
    for btype, s, e in M._boxes(data, 0, len(data)):
        if btype == b"moov":
            moov_s, moov_e = s, e
    head = data[:moov_s - 8]
    children = list(M._boxes(data, moov_s, moov_e))
    mvhd = next(data[s - 8:e] for t, s, e in children if t == b"mvhd")
    vtrak = next(data[s - 8:e] for t, s, e in children if t == b"trak")
    vf = bytes(4)
    entry = b"mp4a" + bytes(6) + (1).to_bytes(2, "big") + bytes(20)
    stsd = M._box(b"stsd", vf + (1).to_bytes(4, "big")
                  + (len(entry) + 4).to_bytes(4, "big") + entry)
    stts = M._box(b"stts", vf + (1).to_bytes(4, "big")
                  + (1).to_bytes(4, "big") + (1000).to_bytes(4, "big"))
    stsc = M._box(b"stsc", vf + (1).to_bytes(4, "big")
                  + (1).to_bytes(4, "big") + (1).to_bytes(4, "big")
                  + (1).to_bytes(4, "big"))
    stsz = M._box(b"stsz", vf + bytes(4) + (1).to_bytes(4, "big")
                  + (8).to_bytes(4, "big"))
    stco = M._box(b"stco", vf + (1).to_bytes(4, "big")
                  + (40).to_bytes(4, "big"))
    stbl = M._box(b"stbl", stsd + stts + stsc + stsz + stco)
    dinf = M._box(b"dinf", M._box(
        b"dref", vf + (1).to_bytes(4, "big")
        + M._box(b"url ", b"\x00\x00\x00\x01")))
    minf = M._box(b"minf", M._box(b"smhd", bytes(8)) + dinf + stbl)
    mdhd = M._box(b"mdhd", vf + bytes(8) + (1000).to_bytes(4, "big")
                  + (1000).to_bytes(4, "big") + M._pack_lang("und")
                  + bytes(2))
    hdlr = M._box(b"hdlr", bytes(8) + b"soun" + bytes(12) + b"\x00")
    mdia = M._box(b"mdia", mdhd + hdlr + minf)
    tkhd = M._box(b"tkhd", vf + bytes(8) + (2).to_bytes(4, "big")
                  + bytes(4) + (1000).to_bytes(4, "big") + bytes(8)
                  + bytes(8) + M._UNITY_MATRIX + bytes(8))
    atrak = M._box(b"trak", tkhd + mdia)
    return head + M._box(b"moov", mvhd + atrak + vtrak)


def test_mp4_samples_prefers_video_track(spark):
    """r15 ADVICE fix: with track_id=None an audio trak listed first
    (mp4a also carries full stbl tables) must not shadow the decodable
    video trak."""
    import pandas as pd

    from cassandra_es_index_spark.functions.mp4 import mp4_samples
    from cassandra_es_index_spark.operators import multimodal

    data = _audio_first(_mjpeg([100, 200], frame_ms=400))
    s = mp4_samples(data)
    assert (s["codec"], s["handler"], s["track_id"]) \
        == ("jpeg", "vide", 1)
    # explicit track_id still reaches the audio track
    assert mp4_samples(data, track_id=2)["codec"] == "mp4a"
    # end-to-end: decode_frames on the two-track file decodes video
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": ["v"], "content": [data]}),
        "media_id string, content binary")
    got = sorted((r["frame_ts_ms"], r["mean_r"]) for r in
                 multimodal.decode_frames(df, every_ms=400).collect())
    assert got == [(0, 100.0), (400, 200.0)]


def test_decode_frames_tick_ceiling_typed(spark):
    """r15 ADVICE fix: hostile stts deltas (huge durations) raise a
    typed error instead of spinning the tick loop for ~4e12
    iterations."""
    import pandas as pd
    import pytest

    from cassandra_es_index_spark.operators import multimodal

    df = spark.createDataFrame(
        pd.DataFrame({"media_id": ["long"],
                      "content": [_mjpeg([1, 2],
                                         frame_ms=200_000_000)]}),
        "media_id string, content binary")
    with pytest.raises(Exception, match="frame\\s+ticks"):
        multimodal.decode_frames(df, every_ms=1000).collect()
    # the same media decodes fine with a proportionate every_ms
    n = multimodal.decode_frames(df, every_ms=100_000_000).count()
    assert n == 3                  # ticks 0, 1e8, 2e8


def test_decode_frames_inter_frame_codec_typed(spark):
    import pandas as pd
    import pytest

    from cassandra_es_index_spark.operators import multimodal

    df = spark.createDataFrame(
        pd.DataFrame({"media_id": ["x"],
                      "content": [_mjpeg([1], codec="avc1")]}),
        "media_id string, content binary")
    with pytest.raises(Exception, match="avc1"):
        multimodal.decode_frames(df).collect()
    with pytest.raises(ValueError, match="every_ms"):
        multimodal.decode_frames(df, every_ms=0)
