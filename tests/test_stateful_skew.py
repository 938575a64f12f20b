"""Stateful streaming operators + skew utilities."""

import datetime

import pytest
from pyspark.sql import functions as F

from cassandra_es_index_spark.operators import skew
from cassandra_es_index_spark.streaming.stateful import (
    running_counts, streaming_dedup_first_wins,
)


def _ts(minute):
    return datetime.datetime(2024, 1, 1, 0, minute)


EVENTS_SCHEMA = "id string, ts timestamp, value double"


def _write_stream_src(spark, tmp_path, rows, name):
    src = str(tmp_path / name)
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1) \
        .write.mode("overwrite").parquet(src)
    return src


def test_streaming_dedup_first_wins(spark, tmp_path):
    src = _write_stream_src(spark, tmp_path, [
        ("a", _ts(1), 1.0), ("a", _ts(2), 2.0),
        ("b", _ts(1), 3.0), ("a", _ts(3), 4.0),
    ], "dedup_src")
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    out = streaming_dedup_first_wins(stream, "id", ["value"])
    q = (out.writeStream.format("memory").queryName("dedup_out")
         .outputMode("append").trigger(availableNow=True).start())
    # ProcessingTimeTimeout makes the stateful operator report
    # shouldRunAnotherBatch=true on every batch (TTL timers might still
    # fire), so even availableNow keeps scheduling empty batches: the
    # query never self-terminates and processAllAvailable never latches
    # its no-new-data flag. Poll the sink for the expected rows with a
    # deadline, then stop the timer loop.
    import time as _time
    expect = {("a", 1.0), ("b", 3.0)}  # only first occurrence per key
    rows: set = set()
    deadline = _time.time() + 300
    while _time.time() < deadline:
        rows = {(r["id"], r["value"])
                for r in spark.sql("SELECT * FROM dedup_out").collect()}
        if rows == expect:
            break
        _time.sleep(0.5)
    q.stop()
    q.awaitTermination(60)
    assert rows == expect


def test_running_counts(spark, tmp_path):
    src = _write_stream_src(spark, tmp_path, [
        ("a", _ts(1), 1.0), ("a", _ts(2), 2.0), ("b", _ts(1), 5.0),
    ], "counts_src")
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    out = running_counts(stream, "id", "value")
    q = (out.writeStream.format("memory").queryName("counts_out")
         .outputMode("update").trigger(availableNow=True).start())
    assert q.awaitTermination(300)  # availableNow: must self-terminate
    rows = {r["id"]: (r["n_total"], r["sum_total"])
            for r in spark.sql("SELECT * FROM counts_out").collect()}
    assert rows["a"] == (2, 3.0)
    assert rows["b"] == (1, 5.0)


def test_salted_agg_equals_plain_agg(spark):
    df = spark.createDataFrame(
        [("hot", float(i)) for i in range(100)] + [("cold", 1.0)],
        "k string, v double")
    out = skew.salted_agg(df, ["k"], {"v": "sum", "k": "count"}, n_salts=8)
    got = {r["k"]: (r["sum_v"], r["count_k"]) for r in out.collect()}
    assert got["hot"] == (sum(range(100)), 100)
    assert got["cold"] == (1.0, 1)


def test_salted_agg_min_max(spark):
    df = spark.createDataFrame([("a", 5.0), ("a", -3.0)], "k string, v double")
    out = skew.salted_agg(df, ["k"], {"v": "max"}, n_salts=4).first()
    assert out["max_v"] == 5.0
    with pytest.raises(ValueError):
        skew.salted_agg(df, ["k"], {"v": "median"})


def test_salted_join_equals_plain_join(spark):
    big = spark.createDataFrame(
        [("hot", i) for i in range(50)] + [("x", 0), ("y", 1)],
        "k string, payload int")
    small = spark.createDataFrame(
        [("hot", "H"), ("x", "X"), ("z", "Z")], "k string, dim string")
    got = skew.salted_join(big, small, ["k"], n_salts=4)
    want = big.join(small, ["k"])
    assert got.count() == want.count() == 51
    assert (sorted(r["dim"] for r in got.collect())
            == sorted(r["dim"] for r in want.collect()))
