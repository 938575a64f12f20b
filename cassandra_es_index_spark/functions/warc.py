"""WARC (Web ARChive, ISO 28500) parsing — pure-stdlib (r14).

The head of a from-crawl LLM data pipeline: Common-Crawl-style corpora
arrive as ``.warc``/``.warc.gz`` files whose records wrap fetched HTTP
responses. The reference has no ingestion formats at all (it reads
Cassandra rows, ref CStarUtils.java); this module extends the engine's
source tier so the fineweb-style flow (WARC → HTML → text → clean →
dedup) starts from the real wire format.

Record grammar (ISO 28500 §4): a version line ``WARC/1.0`` (or 1.1),
``Name: value`` header lines, CRLF CRLF, then exactly
``Content-Length`` payload bytes, then CRLF CRLF separating the next
record. ``response`` records carry an HTTP response (status line +
headers + CRLF CRLF + body) as payload. ``.warc.gz`` concatenates one
gzip member per record — stdlib ``gzip.decompress`` inflates all
members back into the plain stream, and ``Content-Length`` restores
the record boundaries.

``build_warc`` synthesizes well-formed archives for fixtures — the
deterministic-synthetic-media pattern the PNG/JPEG/MP4 oracle queries
use. Malformed structure (bad version line, missing Content-Length,
truncated payload) is a typed ``WarcParseError`` — no silent
truncation.
"""

from __future__ import annotations

import gzip

__all__ = ["WarcParseError", "parse_warc", "build_warc"]

_CRLF2 = b"\r\n\r\n"


class WarcParseError(ValueError):
    """Malformed WARC structure (bad version line, missing
    Content-Length, truncated payload, non-integer length)."""


def _parse_headers(block: bytes, what: str,
                   strict: bool = True) -> dict:
    """``Name: value`` lines → dict with LOWERCASED names (WARC and
    HTTP header names are case-insensitive).

    ``strict=True`` (WARC record headers — OUR structural contract)
    typed-rejects a malformed line. ``strict=False`` (the HTTP payload
    of response records — THIRD-PARTY server output, r15 fix) folds
    RFC 7230 obs-fold continuation lines (leading SP/HTAB) into the
    previous value and SKIPS garbage lines: real crawl data routinely
    carries broken HTTP headers, and one bad page must not fail the
    whole archive."""
    headers: dict = {}
    last: str | None = None
    for line in block.split(b"\r\n"):
        if not line:
            continue
        if not strict and line[:1] in (b" ", b"\t"):
            if last is not None:                  # obs-fold continuation
                headers[last] = (headers[last] + " "
                                 + line.strip().decode("latin-1"))
            continue
        name, sep, value = line.partition(b":")
        if not sep:
            if strict:
                raise WarcParseError(f"{what}: malformed header line "
                                     f"{line[:60]!r}")
            last = None                           # garbage line — skip
            continue
        last = name.strip().lower().decode("latin-1")
        headers[last] = value.strip().decode("latin-1")
    return headers


def _parse_http_response(payload: bytes) -> tuple:
    """(status:int|None, content_type:str|None, body:bytes) from an
    HTTP response payload; a payload without an HTTP status line
    returns (None, None, payload) — raw payloads pass through rather
    than erroring (the format allows non-HTTP response content), and
    header lines inside the payload parse LENIENTLY (server output,
    not archive structure — see ``_parse_headers``)."""
    head, sep, body = payload.partition(_CRLF2)
    first, _, rest = head.partition(b"\r\n")
    parts = first.split(None, 2)
    if not sep or len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        return None, None, payload
    try:
        status = int(parts[1])
    except ValueError:
        return None, None, payload
    headers = _parse_headers(rest, "http response", strict=False)
    return status, headers.get("content-type"), body


def parse_warc(data: bytes) -> list[dict]:
    """All records of a WARC archive (gzip transparently inflated):

    ``{"type", "record_id", "date", "target_uri", "content_type",
    "content_length", "http_status", "http_content_type", "body"}``

    ``http_status``/``http_content_type``/``body`` come from the HTTP
    payload of ``response`` records; other record types (request,
    warcinfo, metadata, resource) carry their raw payload in ``body``
    with the HTTP fields None."""
    if data[:2] == b"\x1f\x8b":              # .warc.gz member stream
        try:
            data = gzip.decompress(data)
        except OSError as e:
            raise WarcParseError(f"bad gzip stream: {e}") from e
    records: list[dict] = []
    off = 0
    n = len(data)
    while off < n:
        # tolerate the inter-record CRLF CRLF separators
        while data.startswith(b"\r\n", off):
            off += 2
        if off >= n:
            break
        head_end = data.find(_CRLF2, off)
        if head_end < 0:
            raise WarcParseError(
                f"truncated record header at offset {off}")
        version, _, header_block = \
            data[off:head_end].partition(b"\r\n")
        if not version.startswith(b"WARC/"):
            raise WarcParseError(
                f"bad WARC version line {version[:40]!r} at offset "
                f"{off}")
        headers = _parse_headers(header_block, "warc record")
        raw_len = headers.get("content-length")
        if raw_len is None:
            raise WarcParseError(
                f"record at offset {off} has no Content-Length")
        try:
            length = int(raw_len)
        except ValueError as e:
            raise WarcParseError(
                f"bad Content-Length {raw_len!r} at offset {off}") \
                from e
        payload_start = head_end + 4
        if payload_start + length > n:
            raise WarcParseError(
                f"record payload at offset {off} overruns the archive "
                f"({length} bytes declared, "
                f"{n - payload_start} available)")
        payload = data[payload_start:payload_start + length]
        rtype = headers.get("warc-type", "")
        if rtype == "response":
            status, ct, body = _parse_http_response(payload)
        else:
            status, ct, body = None, None, payload
        records.append({
            "type": rtype,
            "record_id": headers.get("warc-record-id"),
            "date": headers.get("warc-date"),
            "target_uri": headers.get("warc-target-uri"),
            "content_type": headers.get("content-type"),
            "content_length": length,
            "http_status": status,
            "http_content_type": ct,
            "body": body,
        })
        off = payload_start + length
    return records


def _record_bytes(rtype: str, headers: list[tuple[str, str]],
                  payload: bytes) -> bytes:
    head = [b"WARC/1.0", f"WARC-Type: {rtype}".encode("latin-1")]
    head += [f"{k}: {v}".encode("latin-1") for k, v in headers]
    head.append(f"Content-Length: {len(payload)}".encode("latin-1"))
    return b"\r\n".join(head) + _CRLF2 + payload + _CRLF2


def build_warc(pages: list[dict], compress: bool = False) -> bytes:
    """Well-formed WARC with one ``response`` record per page dict:
    ``{"url", "date" (ISO string), "body" (str|bytes),
    "status" (default 200), "content_type" (default text/html)}``.
    A leading ``warcinfo`` record mirrors real crawler output.
    ``compress=True`` gzips each record into its own member (the
    ``.warc.gz`` layout)."""
    records = [_record_bytes(
        "warcinfo",
        [("WARC-Record-ID", "<urn:uuid:00000000-0000-0000-0000-"
                            "000000000000>"),
         ("WARC-Date", "2024-01-01T00:00:00Z"),
         ("Content-Type", "application/warc-fields")],
        b"software: cassandra-es-index-spark synthetic builder\r\n")]
    for i, page in enumerate(pages):
        body = page["body"]
        if isinstance(body, str):
            body = body.encode("utf-8")
        status = page.get("status", 200)
        ct = page.get("content_type", "text/html")
        http = (f"HTTP/1.1 {status} OK\r\nContent-Type: {ct}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
                .encode("latin-1") + body)
        records.append(_record_bytes(
            "response",
            [("WARC-Record-ID", f"<urn:uuid:{i:08d}-0000-0000-0000-"
                                f"000000000000>"),
             ("WARC-Date", page["date"]),
             ("WARC-Target-URI", page["url"]),
             ("Content-Type", "application/http;msgtype=response")],
            http))
    if compress:
        return b"".join(
            gzip.compress(r, compresslevel=6, mtime=0) for r in records)
    return b"".join(records)
