"""ISO BMFF (MP4) container metadata — pure-stdlib box parsing (r14).

The reference has no media handling at all (it refuses to index blobs
with a ``"<N> bytes"`` placeholder, ref CStarUtils.java:305-306); this
module narrows the engine's LAST media seam: mp4 CONTAINER metadata
(duration, timescale, brand, per-track handler/language/dimensions)
parses for real from the public ISO/IEC 14496-12 box structure, and the
SAMPLE TABLES (stsd/stts/stsc/stsz/stco — §8.5-8.7) resolve each
sample's byte range + decode time so intra-frame codecs the engine
already decodes (Motion-JPEG: every frame is a baseline JPEG) yield
real pixels via ``functions/jpeg.py``. Only INTER-frame entropy
payloads (H.264/AAC) remain the typed ``MediaDecodeNotAvailable`` seam
in ``operators/multimodal``.

Box grammar (ISO 14496-12 §4.2): 4-byte big-endian size + 4-byte type;
``size == 1`` switches to a 64-bit ``largesize``; ``size == 0`` means
"to end of container". Full boxes carry version(1)+flags(3) first;
version 1 widens creation/modification/duration to 64 bits. The parser
walks ``moov`` → ``mvhd`` + each ``trak``'s ``tkhd`` / ``mdia/mdhd`` /
``mdia/hdlr``, skips unknown boxes (the spec's forward-compat rule),
and typed-errors on any malformed size (no silent truncation).

``build_mp4`` synthesizes a minimal-but-well-formed container
(ftyp + moov + empty mdat) for fixtures and round-trip tests — the
deterministic-synthetic-media pattern the PNG/JPEG/WAV oracle queries
use.
"""

from __future__ import annotations

from typing import Iterator

__all__ = ["Mp4ParseError", "parse_mp4", "build_mp4", "mp4_samples",
           "build_mp4_video"]

# moov-internal boxes that are pure containers of other boxes
_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts",
               b"udta", b"mvex"}


class Mp4ParseError(ValueError):
    """Malformed ISO-BMFF structure (truncated header, overrunning box
    size, zero timescale, missing required box)."""


def _boxes(data: bytes, start: int,
           end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (type, payload_start, payload_end) for each box in
    data[start:end], validating sizes against the container bounds."""
    off = start
    while off < end:
        if off + 8 > end:
            raise Mp4ParseError(
                f"truncated box header at offset {off}")
        size = int.from_bytes(data[off:off + 4], "big")
        btype = data[off + 4:off + 8]
        hdr = 8
        if size == 1:                       # 64-bit largesize
            if off + 16 > end:
                raise Mp4ParseError(
                    f"truncated largesize header at offset {off}")
            size = int.from_bytes(data[off + 8:off + 16], "big")
            hdr = 16
        elif size == 0:                     # box extends to container end
            size = end - off
        if size < hdr or off + size > end:
            raise Mp4ParseError(
                f"box {btype!r} size {size} overruns its container "
                f"(offset {off}, container end {end})")
        yield btype, off + hdr, off + size
        off += size


def _full_box(data: bytes, start: int, end: int,
              btype: bytes) -> tuple[int, int]:
    """(version, body_start) for a full box — version(1) + flags(3)."""
    if start + 4 > end:
        raise Mp4ParseError(f"truncated {btype!r} full-box header")
    return data[start], start + 4


def _u32(data: bytes, off: int) -> int:
    return int.from_bytes(data[off:off + 4], "big")


def _u64(data: bytes, off: int) -> int:
    return int.from_bytes(data[off:off + 8], "big")


def _duration_ms(duration: int, timescale: int, where: str) -> int:
    if timescale <= 0:
        raise Mp4ParseError(f"{where}: timescale must be positive, "
                            f"got {timescale}")
    return duration * 1000 // timescale


def _parse_mvhd(data: bytes, start: int, end: int) -> dict:
    v, b = _full_box(data, start, end, b"mvhd")
    if v == 1:
        timescale, duration = _u32(data, b + 16), _u64(data, b + 20)
    else:
        timescale, duration = _u32(data, b + 8), _u32(data, b + 12)
    return {"timescale": timescale,
            "duration_ms": _duration_ms(duration, timescale, "mvhd")}


def _parse_tkhd(data: bytes, start: int, end: int) -> dict:
    v, b = _full_box(data, start, end, b"tkhd")
    track_id = _u32(data, b + 16) if v == 1 else _u32(data, b + 8)
    # width/height are the box's final two 16.16 fixed-point words
    return {"track_id": track_id,
            "width": _u32(data, end - 8) >> 16,
            "height": _u32(data, end - 4) >> 16}


def _parse_mdhd(data: bytes, start: int, end: int) -> dict:
    v, b = _full_box(data, start, end, b"mdhd")
    if v == 1:
        timescale, duration = _u32(data, b + 16), _u64(data, b + 20)
        lang_off = b + 28
    else:
        timescale, duration = _u32(data, b + 8), _u32(data, b + 12)
        lang_off = b + 16
    packed = int.from_bytes(data[lang_off:lang_off + 2], "big")
    lang = "".join(chr(((packed >> s) & 0x1F) + 0x60)
                   for s in (10, 5, 0))
    return {"timescale": timescale,
            "duration_ms": _duration_ms(duration, timescale, "mdhd"),
            "language": lang}


def parse_mp4(data: bytes) -> dict:
    """Container metadata from ISO-BMFF bytes:

    ``{"major_brand", "duration_ms", "timescale", "n_tracks",
    "tracks": [{"track_id", "handler", "duration_ms", "timescale",
    "language", "width", "height"}, ...]}``

    Unknown boxes skip (forward compatibility); a missing ``moov`` /
    ``mvhd`` and any malformed size are typed ``Mp4ParseError``s.
    Frame payloads (``mdat``) are never touched."""
    major_brand = None
    movie: dict | None = None
    tracks: list[dict] = []
    for btype, s, e in _boxes(data, 0, len(data)):
        if btype == b"ftyp":
            if e - s < 4:
                raise Mp4ParseError("ftyp too short for a major brand")
            major_brand = data[s:s + 4].decode("ascii", "replace")
        elif btype == b"moov":
            for mtype, ms, me in _boxes(data, s, e):
                if mtype == b"mvhd":
                    movie = _parse_mvhd(data, ms, me)
                elif mtype == b"trak":
                    tracks.append(_parse_trak(data, ms, me))
    if movie is None:
        raise Mp4ParseError("no moov/mvhd box — not an MP4 movie")
    return {"major_brand": major_brand, **movie,
            "n_tracks": len(tracks), "tracks": tracks}


def _parse_trak(data: bytes, start: int, end: int) -> dict:
    out: dict = {"track_id": None, "handler": None, "duration_ms": None,
                 "timescale": None, "language": None, "width": None,
                 "height": None}
    for btype, s, e in _boxes(data, start, end):
        if btype == b"tkhd":
            out.update(_parse_tkhd(data, s, e))
        elif btype == b"mdia":
            for mtype, ms, me in _boxes(data, s, e):
                if mtype == b"mdhd":
                    out.update(_parse_mdhd(data, ms, me))
                elif mtype == b"hdlr":
                    if me - ms < 12:
                        raise Mp4ParseError("hdlr too short")
                    out["handler"] = data[ms + 8:ms + 12].decode(
                        "ascii", "replace")
    return out


# --------------------------------------------------------------------------
# sample tables (ISO 14496-12 §8.5-8.7) — byte range + decode time per
# sample, enabling REAL frame decode for intra-frame codecs (MJPEG)
# --------------------------------------------------------------------------


def _table_bounds(b: int, e: int, n: int, width: int, what: str) -> None:
    if b + n * width > e:
        raise Mp4ParseError(f"{what}: {n} entries overrun the box")


def _parse_stsd_codec(data: bytes, start: int, end: int) -> str:
    """Fourcc of the FIRST sample entry (the engine indexes single-
    description tracks; multi-description selection is out of scope)."""
    _, b = _full_box(data, start, end, b"stsd")
    if _u32(data, b) < 1 or b + 12 > end:
        raise Mp4ParseError("stsd: no sample entries")
    return data[b + 8:b + 12].decode("ascii", "replace")


def _parse_stts(data: bytes, start: int, end: int) -> list[tuple[int, int]]:
    _, b = _full_box(data, start, end, b"stts")
    n = _u32(data, b)
    _table_bounds(b + 4, end, n, 8, "stts")
    return [(_u32(data, b + 4 + 8 * i), _u32(data, b + 8 + 8 * i))
            for i in range(n)]


def _parse_stsz(data: bytes, start: int, end: int) -> list[int]:
    _, b = _full_box(data, start, end, b"stsz")
    uniform, n = _u32(data, b), _u32(data, b + 4)
    if uniform:
        return [uniform] * n
    _table_bounds(b + 8, end, n, 4, "stsz")
    return [_u32(data, b + 8 + 4 * i) for i in range(n)]


def _parse_stsc(data: bytes, start: int, end: int) -> list[tuple[int, int]]:
    """[(first_chunk, samples_per_chunk), ...] — sample_description_index
    is parsed past but unused (single-description tracks)."""
    _, b = _full_box(data, start, end, b"stsc")
    n = _u32(data, b)
    _table_bounds(b + 4, end, n, 12, "stsc")
    return [(_u32(data, b + 4 + 12 * i), _u32(data, b + 8 + 12 * i))
            for i in range(n)]


def _parse_stco(data: bytes, start: int, end: int,
                wide: bool) -> list[int]:
    _, b = _full_box(data, start, end, b"co64" if wide else b"stco")
    n = _u32(data, b)
    width = 8 if wide else 4
    _table_bounds(b + 4, end, n, width, "co64" if wide else "stco")
    rd = _u64 if wide else _u32
    return [rd(data, b + 4 + width * i) for i in range(n)]


def _stbl_tables(data: bytes, start: int, end: int) -> dict:
    out: dict = {}
    for btype, s, e in _boxes(data, start, end):
        if btype == b"stsd":
            out["codec"] = _parse_stsd_codec(data, s, e)
        elif btype == b"stts":
            out["stts"] = _parse_stts(data, s, e)
        elif btype == b"stsz":
            out["stsz"] = _parse_stsz(data, s, e)
        elif btype == b"stsc":
            out["stsc"] = _parse_stsc(data, s, e)
        elif btype in (b"stco", b"co64"):
            out["stco"] = _parse_stco(data, s, e, btype == b"co64")
    return out


def _expand_chunks(stsc: list[tuple[int, int]],
                   n_chunks: int, n_samples: int) -> list[int]:
    """Per-chunk sample counts from the stsc run-length encoding."""
    if not stsc or stsc[0][0] != 1:
        raise Mp4ParseError("stsc must start at chunk 1")
    counts: list[int] = []
    for i, (first, spc) in enumerate(stsc):
        last = stsc[i + 1][0] - 1 if i + 1 < len(stsc) else n_chunks
        if last < first:
            raise Mp4ParseError("stsc first_chunk values must increase")
        counts.extend([spc] * (last - first + 1))
    if sum(counts) != n_samples:
        raise Mp4ParseError(
            f"sample tables disagree: stsc expands to {sum(counts)} "
            f"samples across {n_chunks} chunks, stsz has {n_samples}")
    return counts


def mp4_samples(data: bytes, track_id: int | None = None) -> dict:
    """Resolve a track's samples to byte ranges + decode times:

    ``{"track_id", "codec", "timescale", "samples": [{"offset", "size",
    "time_ms"}, ...]}``

    ``track_id=None`` picks the first track carrying a full sample
    table. Decode times come from ``stts`` deltas (ms via the track's
    mdhd timescale); offsets from ``stco`` chunk starts + the sizes of
    earlier samples in the chunk (§8.7.4's implied layout). Any table
    disagreement (stsc expansion vs stsz count, stts total vs sample
    count, a sample overrunning the file) is a typed ``Mp4ParseError``
    — no silent truncation."""
    chosen: dict | None = None
    candidates: list[dict] = []
    for btype, s, e in _boxes(data, 0, len(data)):
        if btype != b"moov":
            continue
        for mtype, ms, me in _boxes(data, s, e):
            if mtype != b"trak":
                continue
            info = _parse_trak(data, ms, me)
            tables: dict = {}
            for dtype, ds, de in _boxes(data, ms, me):
                if dtype != b"mdia":
                    continue
                for ntype, ns, ne in _boxes(data, ds, de):
                    if ntype != b"minf":
                        continue
                    for stype, ss, se in _boxes(data, ns, ne):
                        if stype == b"stbl":
                            tables = _stbl_tables(data, ss, se)
            full = all(k in tables for k in
                       ("codec", "stts", "stsz", "stsc", "stco"))
            if track_id is not None:
                if info["track_id"] == track_id:
                    if not full:
                        raise Mp4ParseError(
                            f"track {track_id} has no complete sample "
                            f"table")
                    chosen = {**info, **tables}
            elif full:
                candidates.append({**info, **tables})
    if track_id is None and candidates:
        # default-track selection (r15 fix): real MJPEG files commonly
        # list an audio trak (mp4a — which also carries full stbl
        # tables) before the video trak, so "first full table" handed
        # decode_frames the audio track. Prefer the 'vide' handler,
        # then any intra-JPEG stsd fourcc, then document order.
        chosen = next(
            (c for c in candidates if c.get("handler") == "vide"),
            next((c for c in candidates
                  if c.get("codec") in ("jpeg", "mjpa", "mjpb")),
                 candidates[0]))
    if chosen is None:
        raise Mp4ParseError(
            "no track with a complete sample table"
            + (f" (track_id={track_id})" if track_id is not None else ""))

    sizes = chosen["stsz"]
    counts = _expand_chunks(chosen["stsc"], len(chosen["stco"]),
                            len(sizes))
    deltas: list[int] = []
    for cnt, delta in chosen["stts"]:
        deltas.extend([delta] * cnt)
    if len(deltas) != len(sizes):
        raise Mp4ParseError(
            f"sample tables disagree: stts covers {len(deltas)} "
            f"samples, stsz has {len(sizes)}")
    timescale = chosen["timescale"]
    if not timescale or timescale <= 0:
        raise Mp4ParseError("sample track has no positive mdhd timescale")

    samples: list[dict] = []
    si = 0
    for chunk_off, cnt in zip(chosen["stco"], counts):
        off = chunk_off
        for _ in range(cnt):
            samples.append({"offset": off, "size": sizes[si]})
            off += sizes[si]
            si += 1
    t = 0
    for smp, delta in zip(samples, deltas):
        smp["time_ms"] = t * 1000 // timescale
        t += delta
        if smp["offset"] + smp["size"] > len(data):
            raise Mp4ParseError(
                f"sample at offset {smp['offset']} size {smp['size']} "
                f"overruns the file ({len(data)} bytes)")
    return {"track_id": chosen["track_id"], "codec": chosen["codec"],
            "handler": chosen.get("handler"),
            "timescale": timescale, "samples": samples}


# --------------------------------------------------------------------------
# synthetic builder (fixtures / round-trip tests)
# --------------------------------------------------------------------------

_UNITY_MATRIX = (
    (0x00010000).to_bytes(4, "big") + bytes(4) * 3
    + (0x00010000).to_bytes(4, "big") + bytes(4) * 3
    + (0x40000000).to_bytes(4, "big"))


def _box(btype: bytes, payload: bytes) -> bytes:
    return (len(payload) + 8).to_bytes(4, "big") + btype + payload


def _pack_lang(lang: str) -> bytes:
    if len(lang) != 3 or not all("a" <= c <= "z" for c in lang):
        raise ValueError(f"language must be 3 lowercase letters, "
                         f"got {lang!r}")
    packed = 0
    for c in lang:
        packed = (packed << 5) | (ord(c) - 0x60)
    return packed.to_bytes(2, "big")


def build_mp4(duration_ms: int, timescale: int = 1000,
              tracks: list[dict] | None = None,
              major_brand: str = "isom",
              version: int = 0) -> bytes:
    """Minimal well-formed MP4: ftyp + moov(mvhd + traks) + empty mdat.

    Each track dict: ``{"track_id", "handler" ('vide'/'soun'),
    "duration_ms", "language", "width", "height"}`` (width/height 0 for
    audio). ``version=1`` emits 64-bit mvhd/tkhd/mdhd variants so the
    parser's v1 paths are testable. Durations are exact when
    ``duration_ms * timescale`` divides by 1000 (e.g. timescale
    1000)."""
    if version not in (0, 1):
        raise ValueError(f"version must be 0 or 1, got {version!r}")
    if duration_ms < 0:
        raise ValueError("duration_ms must be non-negative")
    dur = duration_ms * timescale // 1000
    vf = bytes([version, 0, 0, 0])
    t_sz = 8 if version else 4

    def t(v: int) -> bytes:
        return v.to_bytes(t_sz, "big")

    trak_bytes = b""
    for tr in tracks or []:
        tkhd = (vf + t(0) + t(0)
                + tr["track_id"].to_bytes(4, "big") + bytes(4)
                + t(tr["duration_ms"] * timescale // 1000)
                + bytes(8)                       # reserved
                + bytes(2) + bytes(2)            # layer, alternate_group
                + bytes(2) + bytes(2)            # volume, reserved
                + _UNITY_MATRIX
                + ((tr.get("width") or 0) << 16).to_bytes(4, "big")
                + ((tr.get("height") or 0) << 16).to_bytes(4, "big"))
        mdhd = (vf + t(0) + t(0) + timescale.to_bytes(4, "big")
                + t(tr["duration_ms"] * timescale // 1000)
                + _pack_lang(tr.get("language", "und")) + bytes(2))
        hdlr = (bytes(4) + bytes(4)
                + tr["handler"].encode("ascii") + bytes(12) + b"\x00")
        mdia = _box(b"mdia", _box(b"mdhd", mdhd) + _box(b"hdlr", hdlr))
        trak_bytes += _box(b"trak", _box(b"tkhd", tkhd) + mdia)

    mvhd = (vf + t(0) + t(0) + timescale.to_bytes(4, "big") + t(dur)
            + (0x00010000).to_bytes(4, "big")    # rate 1.0
            + (0x0100).to_bytes(2, "big")        # volume 1.0
            + bytes(10) + _UNITY_MATRIX + bytes(24)
            + (len(tracks or []) + 1).to_bytes(4, "big"))
    ftyp = _box(b"ftyp", major_brand.encode("ascii")
                + bytes(4) + b"isomiso2mp41")
    moov = _box(b"moov", _box(b"mvhd", mvhd) + trak_bytes)
    return ftyp + moov + _box(b"mdat", b"")


def _visual_sample_entry(codec: str, width: int, height: int) -> bytes:
    """Spec-shaped VisualSampleEntry (§12.1.3): fourcc + reserved(6) +
    data_reference_index(1) + the fixed 70-byte visual body."""
    if len(codec) != 4:
        raise ValueError(f"codec fourcc must be 4 chars, got {codec!r}")
    body = (bytes(2) + bytes(2) + bytes(12)        # pre_defined/reserved
            + width.to_bytes(2, "big") + height.to_bytes(2, "big")
            + (0x00480000).to_bytes(4, "big") * 2  # 72 dpi h/v
            + bytes(4)                             # reserved
            + (1).to_bytes(2, "big")               # frame_count
            + bytes(32)                            # compressorname
            + (24).to_bytes(2, "big")              # depth
            + (0xFFFF).to_bytes(2, "big"))         # pre_defined
    entry = codec.encode("ascii") + bytes(6) + (1).to_bytes(2, "big") \
        + body
    return (len(entry) + 4).to_bytes(4, "big") + entry


def build_mp4_video(frames: list[bytes], frame_ms: int = 40,
                    width: int = 0, height: int = 0,
                    codec: str = "jpeg", timescale: int = 1000,
                    language: str = "und") -> bytes:
    """Well-formed single-video-track MP4 with REAL sample tables:
    ftyp + mdat (frames, one chunk) + moov whose stbl (stsd/stts/stsc/
    stsz/stco) resolves every frame's byte range and decode time — the
    Motion-JPEG layout when each frame is a baseline JPEG from
    ``functions/jpeg.py``. mdat precedes moov so chunk offsets are
    known before the movie box is sized (the classic non-faststart
    layout; the parser is order-independent)."""
    if not frames:
        raise ValueError("build_mp4_video needs at least one frame")
    if frame_ms <= 0 or timescale <= 0:
        raise ValueError("frame_ms and timescale must be positive")
    ftyp = _box(b"ftyp", b"isom" + bytes(4) + b"isomiso2mp41")
    mdat = _box(b"mdat", b"".join(frames))
    first_off = len(ftyp) + 8                     # mdat payload start
    duration_ms = frame_ms * len(frames)
    dur = duration_ms * timescale // 1000
    delta = frame_ms * timescale // 1000
    vf = bytes(4)                                 # version 0, flags 0

    stsd = _box(b"stsd", vf + (1).to_bytes(4, "big")
                + _visual_sample_entry(codec, width, height))
    stts = _box(b"stts", vf + (1).to_bytes(4, "big")
                + len(frames).to_bytes(4, "big")
                + delta.to_bytes(4, "big"))
    stsc = _box(b"stsc", vf + (1).to_bytes(4, "big")
                + (1).to_bytes(4, "big")
                + len(frames).to_bytes(4, "big")
                + (1).to_bytes(4, "big"))
    stsz = _box(b"stsz", vf + bytes(4)
                + len(frames).to_bytes(4, "big")
                + b"".join(len(f).to_bytes(4, "big") for f in frames))
    stco = _box(b"stco", vf + (1).to_bytes(4, "big")
                + first_off.to_bytes(4, "big"))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    dinf = _box(b"dinf", _box(b"dref", vf + (1).to_bytes(4, "big")
                              + _box(b"url ", b"\x00\x00\x00\x01")))
    vmhd = _box(b"vmhd", b"\x00\x00\x00\x01" + bytes(8))
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdhd = _box(b"mdhd", vf + bytes(8) + timescale.to_bytes(4, "big")
                + dur.to_bytes(4, "big") + _pack_lang(language)
                + bytes(2))
    hdlr = _box(b"hdlr", bytes(8) + b"vide" + bytes(12) + b"\x00")
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _box(b"tkhd", vf + bytes(8) + (1).to_bytes(4, "big")
                + bytes(4) + dur.to_bytes(4, "big") + bytes(8)
                + bytes(8) + _UNITY_MATRIX
                + (width << 16).to_bytes(4, "big")
                + (height << 16).to_bytes(4, "big"))
    mvhd = _box(b"mvhd", vf + bytes(8) + timescale.to_bytes(4, "big")
                + dur.to_bytes(4, "big")
                + (0x00010000).to_bytes(4, "big")
                + (0x0100).to_bytes(2, "big") + bytes(10)
                + _UNITY_MATRIX + bytes(24) + (2).to_bytes(4, "big"))
    moov = _box(b"moov", mvhd + _box(b"trak", tkhd + mdia))
    return ftyp + mdat + moov
