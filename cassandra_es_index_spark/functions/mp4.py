"""ISO BMFF (MP4) container metadata — pure-stdlib box parsing (r14).

The reference has no media handling at all (it refuses to index blobs
with a ``"<N> bytes"`` placeholder, ref CStarUtils.java:305-306); this
module narrows the engine's LAST media seam: mp4 CONTAINER metadata
(duration, timescale, brand, per-track handler/language/dimensions)
parses for real from the public ISO/IEC 14496-12 box structure, while
FRAME decode (H.264/AAC entropy payloads) remains the typed
``MediaDecodeNotAvailable`` seam in ``operators/multimodal``.

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

__all__ = ["Mp4ParseError", "parse_mp4", "build_mp4"]

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
