"""Ingest pipelines: per-table document transforms applied at index time.

The reference configures server-side ES ingest pipelines per type
(``type-pipelines`` / ``pipeline-<type>`` options, ref
ElasticIndex.java:409-416,598-600, requests/UpdatePipeline.java:30-67) —
the replacement for removed mapping-transforms. The Spark-native
equivalent is a registry of ``DataFrame → DataFrame`` transforms applied
with ``df.transform(fn)`` in the write path, before segment assignment.

Processors mirror the common ES ingest processors the reference's users
rely on (set/rename/remove/lowercase/gsub, plus r15: convert/date/trim/
uppercase/split/append — the subset a real porter's pipelines use,
ref requests/UpdatePipeline.java:30-67, README.md:547-548), built from
Column expressions so they fuse into the same codegen stage as the
document build. Script/grok and other server-side-only kinds stay typed
rejects — a silently skipped processor would index different documents
than ES with no signal.
"""

from __future__ import annotations

import re as _re
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Transform = Callable[[DataFrame], DataFrame]


def _check_regex(pattern: Any, kind: str) -> str:
    """Eager typed validation of a user regex (r15 fuzz hardening): a
    malformed pattern previously reached regexp_replace/split and
    crashed at RUNTIME with a JVM PatternSyntaxException. Python's
    ``re`` grammar approximates Java's closely enough to reject
    garbage; Java-only constructs (possessive quantifiers) are
    rejected too — documented subset, a typed error either way."""
    if not isinstance(pattern, str):
        raise ValueError(f"{kind}: pattern must be a string, "
                         f"got {pattern!r}")
    try:
        _re.compile(pattern)
    except _re.error as e:
        raise ValueError(f"{kind}: bad pattern {pattern!r}: {e}") from e
    return pattern


# date-format patterns already probed against Spark's own parser this
# session (set of accepted format strings)
_DATE_FMT_OK: set[str] = set()


def _check_date_format(fmt: str, df: DataFrame) -> None:
    """Probe a date format against the SAME parser that executes it
    (one cached 1-row local job): Spark's pattern grammar bans some
    DateTimeFormatter letters, so only a real parse attempt separates
    "pattern error at runtime" from "value doesn't match" — the former
    must be a typed error at pipeline-apply time."""
    if fmt in _DATE_FMT_OK:
        return
    try:
        (df.sparkSession.range(1)
           .select(F.try_to_timestamp(F.lit("probe"), F.lit(fmt)))
           .collect())
    except Exception as e:  # noqa: BLE001 — JVM pattern error → typed
        raise ValueError(f"date: bad format pattern {fmt!r}: "
                         f"{str(e)[:200]}") from e
    _DATE_FMT_OK.add(fmt)


class PipelineRegistry:
    """Named pipelines; a table's ``pipeline-<name>`` option selects one
    (ref config/IndexConfig.java:110-111)."""

    def __init__(self) -> None:
        self._pipelines: dict[str, list[Transform]] = {}

    def put(self, name: str, processors: list[Transform]) -> None:
        self._pipelines[name] = list(processors)

    def get(self, name: str) -> list[Transform]:
        if name not in self._pipelines:
            raise KeyError(f"unknown pipeline {name!r}")
        return self._pipelines[name]

    def apply(self, name: str, df: DataFrame) -> DataFrame:
        from pyspark.errors import AnalysisException
        for i, proc in enumerate(self.get(name)):
            try:
                df = df.transform(proc)
            except AnalysisException as e:
                # a processor naming a missing/ambiguous column is a
                # user-spec error — typed, like every other bad spec
                # (r15 fuzz hardening; transformations analyze eagerly
                # so this surfaces here, not at the sink)
                raise ValueError(
                    f"pipeline {name!r} processor #{i}: "
                    f"{str(e)[:200]}") from e
        return df

    def names(self) -> list[str]:
        return sorted(self._pipelines)


# -- processor factories (ES ingest-processor analogues) --------------------


def set_field(name: str, value: Any) -> Transform:
    return lambda df: df.withColumn(name, F.lit(value))


def rename_field(src: str, dst: str) -> Transform:
    return lambda df: df.withColumnRenamed(src, dst)


def remove_field(name: str) -> Transform:
    return lambda df: df.drop(name)


def lowercase_field(name: str) -> Transform:
    return lambda df: df.withColumn(name, F.lower(F.col(name)))


def gsub_field(name: str, pattern: str, replacement: str) -> Transform:
    _check_regex(pattern, "gsub")
    return lambda df: df.withColumn(
        name, F.regexp_replace(F.col(name), pattern, replacement))


def uppercase_field(name: str) -> Transform:
    return lambda df: df.withColumn(name, F.upper(F.col(name)))


def trim_field(name: str) -> Transform:
    return lambda df: df.withColumn(name, F.trim(F.col(name)))


# ES convert-processor types → Spark cast targets. "auto" typed-rejects
# (its per-document type sniffing has no declarative analogue).
_CONVERT_TYPES = {
    "integer": "int", "long": "bigint", "float": "float",
    "double": "double", "string": "string", "boolean": "boolean",
    "ip": "string",
}


def convert_field(name: str, type_: str,
                  target: str | None = None) -> Transform:
    """ES ``convert``: cast a field (``try_cast`` — an unconvertible
    value yields null rather than an ANSI runtime crash; ES raises per
    document, but a distributed job must not die on one bad row — the
    null is visible and filterable)."""
    if type_ not in _CONVERT_TYPES:
        raise ValueError(
            f"convert: unsupported type {type_!r} (engine subset: "
            f"{sorted(_CONVERT_TYPES)})")
    dst = _CONVERT_TYPES[type_]
    return lambda df: df.withColumn(
        target or name, F.col(name).try_cast(dst))


def split_field(name: str, separator: str,
                target: str | None = None) -> Transform:
    """ES ``split``: string → array on a REGEX separator (the ES
    contract — '\\s+' splits runs of whitespace)."""
    _check_regex(separator, "split")
    return lambda df: df.withColumn(
        target or name, F.split(F.col(name), separator))


def append_field(name: str, value: Any) -> Transform:
    """ES ``append``: add value(s) to an array field; a scalar field
    (or a missing/null value) converts to an array first, like ES."""
    values = value if isinstance(value, list) else [value]

    def _apply(df: DataFrame) -> DataFrame:
        tail = F.array(*[F.lit(v) for v in values])
        if name not in df.columns:
            return df.withColumn(name, tail)
        dt = df.schema[name].dataType.typeName()
        head = F.col(name) if dt == "array" else F.array(F.col(name))
        return df.withColumn(
            name, F.concat(F.coalesce(head, F.array()), tail))

    return _apply


def date_field(name: str, formats: list[str],
               target: str = "@timestamp",
               timezone: str | None = None) -> Transform:
    """ES ``date``: parse ``field`` trying ``formats`` left to right
    into ``target_field`` (default ``@timestamp``). Formats are Java
    time patterns (Spark's own grammar) plus the ES named formats
    ISO8601 / UNIX / UNIX_MS; parses are ``try_to_timestamp``-based so
    a non-matching value falls through to the next format and an
    all-miss yields null, never an ANSI crash. ``timezone`` names the
    zone the TEXT is wall-clocked in (ES semantics): the parsed local
    time converts to UTC via ``to_utc_timestamp`` (fixed offsets and
    IANA ids both resolve JVM-side)."""
    if not formats:
        raise ValueError("date: needs at least one format")

    def _one(col, fmt):
        if fmt == "ISO8601":
            return F.try_to_timestamp(col)
        if fmt == "UNIX":
            return F.try_to_timestamp(
                F.from_unixtime(col.try_cast("double")))
        if fmt == "UNIX_MS":
            return F.try_to_timestamp(
                F.from_unixtime(col.try_cast("double") / F.lit(1000.0)))
        return F.try_to_timestamp(col, F.lit(fmt))

    def _apply(df: DataFrame) -> DataFrame:
        for f in formats:
            if f not in ("ISO8601", "UNIX", "UNIX_MS"):
                _check_date_format(f, df)
        col = F.col(name).cast("string")
        parsed = F.coalesce(*[_one(col, f) for f in formats])
        if timezone is not None and timezone not in ("UTC", "Z",
                                                     "+00:00"):
            from cassandra_es_index_spark.search.compile import (
                _zone_id_ok,
            )
            if not isinstance(timezone, str) \
                    or not _zone_id_ok(timezone, df.sparkSession):
                raise ValueError(f"date: unknown timezone "
                                 f"{timezone!r}")
            parsed = F.to_utc_timestamp(parsed, timezone)
        return df.withColumn(target, parsed)

    return _apply


def from_processor_specs(specs: list[dict[str, Any]]) -> list[Transform]:
    """Build processors from the JSON shape ES pipelines use:
    ``[{"set": {"field": f, "value": v}}, {"rename": {...}}, ...]``.
    Malformed shapes — non-dict specs, multi-kind entries, missing
    required keys, non-string field names — are typed ``ValueError``s
    here, not KeyErrors/JVM crashes downstream (r15 fuzz
    hardening)."""
    if not isinstance(specs, list):
        raise ValueError(f"processor specs must be a list, "
                         f"got {type(specs).__name__}")
    out: list[Transform] = []
    for spec in specs:
        if not isinstance(spec, dict) or len(spec) != 1:
            raise ValueError(
                f"each processor spec must be a single-kind object "
                f"like {{'set': {{...}}}}, got {spec!r}")
        (kind, body), = spec.items()
        if not isinstance(body, dict):
            raise ValueError(f"{kind}: processor body must be an "
                             f"object, got {body!r}")

        def _need(*keys, _kind=kind, _body=body):
            for kk in keys:
                if kk not in _body:
                    raise ValueError(
                        f"{_kind}: missing required key {kk!r}")
                if kk in ("field", "target_field", "separator",
                          "type") and not isinstance(_body[kk], str):
                    raise ValueError(
                        f"{_kind}: {kk} must be a string, "
                        f"got {_body[kk]!r}")
        if kind == "set":
            _need("field", "value")
            out.append(set_field(body["field"], body["value"]))
        elif kind == "rename":
            _need("field", "target_field")
            out.append(rename_field(body["field"], body["target_field"]))
        elif kind == "remove":
            _need("field")
            out.append(remove_field(body["field"]))
        elif kind == "lowercase":
            _need("field")
            out.append(lowercase_field(body["field"]))
        elif kind == "gsub":
            _need("field", "pattern", "replacement")
            out.append(gsub_field(body["field"], body["pattern"],
                                  body["replacement"]))
        elif kind == "uppercase":
            _need("field")
            out.append(uppercase_field(body["field"]))
        elif kind == "trim":
            _need("field")
            out.append(trim_field(body["field"]))
        elif kind == "convert":
            _need("field", "type")
            out.append(convert_field(body["field"], body["type"],
                                     body.get("target_field")))
        elif kind == "split":
            _need("field", "separator")
            out.append(split_field(body["field"], body["separator"],
                                   body.get("target_field")))
        elif kind == "append":
            _need("field", "value")
            out.append(append_field(body["field"], body["value"]))
        elif kind == "date":
            _need("field", "formats")
            fmts = body["formats"]
            if not isinstance(fmts, list) \
                    or not all(isinstance(f, str) for f in fmts):
                raise ValueError(
                    f"date: formats must be a list of strings, "
                    f"got {fmts!r}")
            out.append(date_field(body["field"], fmts,
                                  body.get("target_field",
                                           "@timestamp"),
                                  body.get("timezone")))
        else:
            raise ValueError(f"unsupported processor {kind!r}")
    return out
