"""Ingest pipelines: per-table document transforms applied at index time.

The reference configures server-side ES ingest pipelines per type
(``type-pipelines`` / ``pipeline-<type>`` options, ref
ElasticIndex.java:409-416,598-600, requests/UpdatePipeline.java:30-67) —
the replacement for removed mapping-transforms. The Spark-native
equivalent is a registry of ``DataFrame → DataFrame`` transforms applied
with ``df.transform(fn)`` in the write path, before segment assignment.

Processors mirror the common ES ingest processors the reference's users
rely on (set/rename/remove/lowercase/gsub), built from Column expressions
so they fuse into the same codegen stage as the document build.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Transform = Callable[[DataFrame], DataFrame]


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
        for proc in self.get(name):
            df = df.transform(proc)
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
    return lambda df: df.withColumn(
        name, F.regexp_replace(F.col(name), pattern, replacement))


def from_processor_specs(specs: list[dict[str, Any]]) -> list[Transform]:
    """Build processors from the JSON shape ES pipelines use:
    ``[{"set": {"field": f, "value": v}}, {"rename": {...}}, ...]``."""
    out: list[Transform] = []
    for spec in specs:
        (kind, body), = spec.items()
        if kind == "set":
            out.append(set_field(body["field"], body["value"]))
        elif kind == "rename":
            out.append(rename_field(body["field"], body["target_field"]))
        elif kind == "remove":
            out.append(remove_field(body["field"]))
        elif kind == "lowercase":
            out.append(lowercase_field(body["field"]))
        elif kind == "gsub":
            out.append(gsub_field(body["field"], body["pattern"],
                                  body["replacement"]))
        else:
            raise ValueError(f"unsupported processor {kind!r}")
    return out
