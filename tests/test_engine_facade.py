"""End-to-end facade test: register → build → search → mutate → maintain."""

import datetime

import pytest
from pyspark.sql import functions as F

from cassandra_es_index_spark.catalog import TableSpec
from cassandra_es_index_spark.docmodel import DOC_ID
from cassandra_es_index_spark.engine import CassandraEsIndexEngine


def _ts(minute):
    return datetime.datetime(2024, 1, 1, 0, minute)


@pytest.fixture()
def engine(spark, tmp_path):
    return CassandraEsIndexEngine(spark, str(tmp_path / "indexes"))


def test_full_lifecycle(engine, spark):
    emails = spark.createDataFrame(
        [("a", "hello cassandra", 1), ("b", "hello spark", 2)],
        "id string, body string, userid int")
    store = engine.register(emails, TableSpec("emails", ["id"]), build=True)
    assert store.count() == 2

    hits = engine.search("emails", "body:cassan*")
    assert [r["id"] for r in hits.collect()] == ["a"]
    assert engine.validate("emails", "body:ok") is None
    assert engine.validate("emails", "nope:x") is not None

    engine.apply_mutations("emails", spark.createDataFrame(
        [(_ts(1), "update", "b", "updated body", 9),
         (_ts(2), "partition_delete", "a", None, None)],
        "ts timestamp, op string, id string, body string, userid int"))
    got = {r[DOC_ID]: r["body"] for r in store.read().collect()}
    assert got == {"b": "updated body"}

    report = engine.maintain("emails", now_epoch_s=1)
    assert report["ttl_swept"] is True
    assert store.count() == 1  # nothing expired (no ttl column)


def test_compaction(engine, spark):
    df = spark.createDataFrame([("k%d" % i, "text %d" % i) for i in range(20)],
                               "id string, body string")
    store = engine.register(df, TableSpec("docs", ["id"]), build=True)
    # create small-file pressure: 6 single-row upserts
    for i in range(6):
        store.upsert(spark.createDataFrame(
            [(f"k{i}", f"patched {i}")], "id string, body string"))
    files_before = store.segment_file_counts()["all"]
    assert files_before > 4
    report = engine.maintain("docs", compact_max_files=4)
    assert report["segments_compacted"] == ["all"]
    assert store.segment_file_counts()["all"] <= 2
    assert store.count() == 20  # no rows lost
    got = {r[DOC_ID]: r["body"] for r in store.read().collect()}
    assert got["k3"] == "patched 3"


def test_sql_passthrough(spark, tmp_path):
    """S15 generic passthrough: registered tables are queryable with raw
    SQL through the facade (the reference's GenericRequest escape hatch)."""
    from cassandra_es_index_spark.engine import CassandraEsIndexEngine

    eng = CassandraEsIndexEngine(spark, str(tmp_path / "root"))
    df = spark.createDataFrame([("x", 1), ("y", 2)], "id string, n int")
    eng.register(df, TableSpec("passthrough_t", ["id"]))
    out = eng.sql("SELECT count(*) AS n, sum(n) AS total FROM passthrough_t")
    row = out.first()
    assert (row["n"], row["total"]) == (2, 3)


def test_search_sees_writes(engine, spark):
    """After a mutation batch, search must reflect the mutated index — in
    the reference, search hits ES, which is exactly what the writes
    updated."""
    emails = spark.createDataFrame(
        [("a", "hello cassandra", 1), ("b", "hello spark", 2)],
        "id string, body string, userid int")
    engine.register(emails, TableSpec("emails_sw", ["id"]), build=True)
    assert engine.search(
        "emails_sw", "#options:load-rows=false#body:freshly").count() == 0

    engine.apply_mutations("emails_sw", spark.createDataFrame(
        [(_ts(1), "update", "b", "freshly indexed text", 9),
         (_ts(2), "partition_delete", "a", None, None)],
        "ts timestamp, op string, id string, body string, userid int"))
    # new content searchable, deleted doc gone
    hits = engine.search("emails_sw", "#options:load-rows=false#body:freshly")
    assert [r["id"] for r in hits.collect()] == ["b"]
    assert engine.search(
        "emails_sw", "#options:load-rows=false#body:cassandra").count() == 0
    # load-source returns the updated document content
    src = engine.search(
        "emails_sw", "#options:load-rows=false,load-source=true#body:freshly")
    assert [r["body"] for r in src.collect()] == ["freshly indexed text"]
