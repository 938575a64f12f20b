"""Timestamp-flavor robustness (round-3 root cause).

The driver regenerated fixtures as parquet ``timestamp[us]`` with
isAdjustedToUTC=false, which pyspark 4.1.2 infers as TIMESTAMP_NTZ by
default — and the epoch-extraction functions (unix_micros/unix_seconds)
reject NTZ. The engine pins ONE timestamp semantics, session-UTC
TIMESTAMP (the Spark analogue of the reference's single GMT ISO-8601
convention, ref JsonUtils.java:49,122-126):

- ``sources.read_parquet`` / ``ensure_session_confs`` disable NTZ
  inference so every parquet timestamp flavor lands as TIMESTAMP;
- ``operators.asof_join`` additionally casts defensively so it is
  NTZ-proof even on user-supplied frames built outside our source path.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

import __spark_entry__ as entrymod
from cassandra_es_index_spark.operators.asof import asof_join
from cassandra_es_index_spark.sources import read_parquet

TS = [dt.datetime(2024, 1, 1, 0, 0, i) for i in range(6)]


def _write_ntz_events(tmpdir: str) -> str:
    """Write an events-shaped parquet whose ts column is timestamp[us]
    isAdjustedToUTC=false — the exact flavor the driver's fixture writer
    produced on 2026-08-13, which NTZ-infers by default."""
    path = os.path.join(tmpdir, "events.parquet")
    table = pa.table({
        "event_id": pa.array(range(6), pa.int64()),
        "ts": pa.array(TS, pa.timestamp("us")),  # no tz => NTZ-inferring
        "user_id": pa.array([1, 1, 1, 2, 2, 2], pa.int64()),
        "event_type": pa.array(["click"] * 6),
        "value": pa.array([float(i) for i in range(6)]),
        "props": pa.array(['{"k":1}'] * 6),
    })
    pq.write_table(table, path)
    return path


def test_ntz_parquet_reads_as_timestamp(spark, tmp_path):
    path = _write_ntz_events(str(tmp_path))
    # confirm the fixture actually NTZ-infers when the conf is on
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try:
        raw = spark.read.parquet(path)
        assert isinstance(raw.schema["ts"].dataType, TimestampNTZType)
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled",
                       "false")
    # the engine's source boundary must yield TIMESTAMP regardless
    df = read_parquet(spark, path)
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    # and epoch extraction — the round-3 failing call — must resolve
    micros = df.select(F.unix_micros("ts").alias("m")).agg(
        F.min("m").alias("m")).collect()[0]["m"]
    assert micros == int(TS[0].replace(
        tzinfo=dt.timezone.utc).timestamp() * 1_000_000)


def test_read_parquet_casts_preexisting_ntz_schema(spark, tmp_path):
    """Even if NTZ sneaks past the conf (e.g. resolved earlier), the
    defensive cast in read_parquet normalizes it."""
    path = _write_ntz_events(str(tmp_path))
    ntz_df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1),)], "ts timestamp_ntz")
    assert isinstance(ntz_df.schema["ts"].dataType, TimestampNTZType)
    out = ntz_df.withColumn("ts", F.col("ts").cast("timestamp"))
    row = out.select(F.unix_seconds("ts").alias("s")).collect()[0]
    assert row["s"] == int(dt.datetime(
        2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())
    # and the reader path end-to-end
    assert isinstance(
        read_parquet(spark, path).schema["ts"].dataType, TimestampType)


def test_asof_join_is_ntz_proof(spark):
    """asof_join must accept TIMESTAMP_NTZ frames built outside the
    engine's source path (library operator, round-3 pytest red)."""
    left = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 0, 0, 30))],
        "user_id bigint, ts timestamp_ntz")
    right = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 0, 0, 10), "click"),
         (1, dt.datetime(2024, 1, 1, 0, 0, 50), "view")],
        "user_id bigint, ts timestamp_ntz, action string")
    out = asof_join(left, right, by=["user_id"], ts_col="ts",
                    value_cols=["action"]).collect()
    assert len(out) == 1
    assert out[0]["asof_action"] == "click"


@pytest.mark.parametrize("flavor", ["ltz", "ntz"])
def test_round3_broken_queries_on_both_flavors(spark, tmp_path, flavor):
    """The three round-3 failures (sessionize, ttl_expired via the events
    table; asof via the operator) must run on both timestamp flavors."""
    path = str(tmp_path / flavor)
    os.makedirs(path, exist_ok=True)
    _write_ntz_events(path)
    if flavor == "ltz":
        # rewrite with an UTC-adjusted (LTZ-reading) ts column
        table = pq.read_table(os.path.join(path, "events.parquet"))
        idx = table.schema.get_field_index("ts")
        table = table.set_column(
            idx, pa.field("ts", pa.timestamp("us", tz="UTC")),
            table.column("ts").cast(pa.timestamp("us", tz="UTC")))
        pq.write_table(table, os.path.join(path, "events.parquet"))
    for qname in ("events_sessionize", "ttl_expired"):
        df = entrymod.queries()[qname](spark, path)
        assert df.count() >= 0  # resolves + executes
