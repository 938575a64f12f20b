"""Crawl ingestion — WARC archives → response-page rows.

The first stage of the fineweb-style pipeline: ``warc_responses``
turns a binary column of WARC archives (``.warc`` or per-record-gzip
``.warc.gz``, Common Crawl's layout) into one row per fetched page,
ready for ``html_to_text`` → C4 cleaning → dedup downstream. The
reference has no ingestion formats (it reads Cassandra rows); this is
part of the engine's beyond-reference LLM-pipeline tier.

Scale shape: archives are opaque blobs processed inside Arrow-batched
``mapInPandas`` — the sanctioned slow path for byte formats, one pass,
no shuffle, parallel in the input partitioning (at crawl scale each
WARC file is one row of a binaryFile read, so file-level parallelism
is the natural unit, exactly how Common Crawl shards are processed).
Record boundaries come from Content-Length, so parsing is linear with
no backtracking.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["warc_responses", "WARC_RESPONSE_SCHEMA"]

WARC_RESPONSE_SCHEMA = T.StructType([
    T.StructField("archive_id", T.StringType()),
    T.StructField("record_seq", T.IntegerType()),
    T.StructField("url", T.StringType()),
    T.StructField("warc_date", T.StringType()),
    T.StructField("http_status", T.IntegerType()),
    T.StructField("mime", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("body_text", T.StringType()),
])


def warc_responses(df: DataFrame, content_col: str = "content",
                   id_col: str = "archive_id") -> DataFrame:
    """One row per WARC ``response`` record: (archive_id, record_seq,
    url, warc_date, http_status, mime, n_bytes, body_text).

    ``record_seq`` numbers the response records within their archive
    (0-based, archive order) so downstream keys are deterministic.
    ``body_text`` is the HTTP body decoded as UTF-8 with replacement
    (crawl bodies lie about encodings; mojibake repair is a separate
    pipeline stage). Non-response records (warcinfo/request/metadata)
    are skipped — they carry no page. Malformed archives raise the
    parser's typed ``WarcParseError`` (no silent truncation)."""
    from cassandra_es_index_spark.functions.warc import parse_warc

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, content in zip(pdf[id_col], pdf[content_col]):
                data = bytes(content) if content is not None else b""
                seq = 0
                for rec in parse_warc(data):
                    if rec["type"] != "response":
                        continue
                    body = rec["body"]
                    rows.append({
                        "archive_id": str(aid),
                        "record_seq": seq,
                        "url": rec["target_uri"],
                        "warc_date": rec["date"],
                        "http_status": rec["http_status"],
                        "mime": rec["http_content_type"],
                        "n_bytes": len(body),
                        "body_text": body.decode("utf-8", "replace"),
                    })
                    seq += 1
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in WARC_RESPONSE_SCHEMA.fields])

    return df.select(id_col, content_col).mapInPandas(
        batches, WARC_RESPONSE_SCHEMA)
