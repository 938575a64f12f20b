"""Parquet source with nanosecond-timestamp normalization.

Spark (≤4.x) cannot represent parquet ``TIMESTAMP(NANOS)`` natively; with
``spark.sql.legacy.parquet.nanosAsLong`` (set by ``session.get_spark``)
those columns arrive as LongType epoch-nanoseconds. This reader detects
them from the parquet footer (driver-side, no data read) and converts to
microsecond ``TimestampType`` — truncation toward zero, the same
conversion other engines (e.g. DuckDB) apply when narrowing ns → µs.

The conversion is a Column expression on top of the scan, so pushdown and
pruning for all other columns are unaffected.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pyarrow.types as pat
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _nanos_columns(path: str) -> list[str]:
    """Names of TIMESTAMP(NANOS) columns, read from one file's footer."""
    probe = path
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not files:
            return []
        probe = files[0]
    try:
        schema = pq.read_schema(probe)
    except Exception:  # noqa: BLE001 — fall back to no conversion
        return []
    return [name for name, typ in zip(schema.names, schema.types)
            if pat.is_timestamp(typ) and typ.unit == "ns"]


def ensure_session_confs(spark: SparkSession) -> None:
    """Apply the engine's session-level invariants on a foreign session
    (e.g. the driver harness creates its own SparkSession): UTC semantics,
    nanos-as-long parquet reads, string partition keys. All three are
    runtime-settable SQLConfs."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # parquet timestamp[us/ms] with isAdjustedToUTC=false would otherwise
    # be inferred as TIMESTAMP_NTZ, which the epoch-extraction functions
    # (unix_micros/unix_seconds) reject. The engine pins one timestamp
    # semantics — session-UTC TIMESTAMP — the Spark analogue of the
    # reference's single GMT ISO-8601 convention (ref JsonUtils.java:49).
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set(
        "spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    # postings tables are bucketed by token; keep bucketed scans so term
    # lookups bucket-prune (see session.get_spark)
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    ensure_session_confs(spark)
    df = spark.read.parquet(path)
    for name in _nanos_columns(path):
        if name in df.columns:
            df = df.withColumn(
                name, F.timestamp_micros(F.expr(f"`{name}` div 1000")))
    # Defensive second layer behind the inferTimestampNTZ conf: if a column
    # still arrives as TIMESTAMP_NTZ (schema resolved before the conf was
    # set), cast to TIMESTAMP — under the UTC session timezone this
    # reinterprets the wall-clock values as UTC instants, matching what
    # the conf-based read produces.
    for field in df.schema.fields:
        if field.dataType.typeName() == "timestamp_ntz":
            df = df.withColumn(field.name,
                               F.col(field.name).cast("timestamp"))
    return df
