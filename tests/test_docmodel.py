"""Document-model tests: doc-id synthesis, ISO dates, TTL field,
json-serialized / flat fields, JSON doc serialization
(ref ElasticIndex.java:470-586, CStarUtils.java:376-406)."""

import datetime
import json

import pytest
from pyspark.sql import functions as F

from cassandra_es_index_spark.catalog import TableSpec
from cassandra_es_index_spark.docmodel import (
    DOC_ID, INT_MAX, build_documents, doc_json, iso8601,
)


@pytest.fixture(scope="module")
def clustered(spark):
    # F3-shaped table: composite PK + clustering keys
    rows = [
        (7, "conv-a", 1, "alice", "hello cassandra world",
         '{"tags": ["x", "y"]}', 1700000000),
        (7, "conv-a", 2, "bob", "elasticsearch rocks", None, None),
        (8, "conv-b", 1, "carol", "hello again", '{"tags": []}', None),
    ]
    return spark.createDataFrame(
        rows,
        "tenant int, convo string, seq long, author string, text string, "
        "props string, expire_at long")


def test_doc_id_pk_ck_join(clustered):
    spec = TableSpec("msgs", ["tenant", "convo"], ["seq", "author"],
                     ttl_column="expire_at")
    docs = build_documents(clustered, spec)
    ids = {r[DOC_ID] for r in docs.select(DOC_ID).collect()}
    # PK-PK-CK-CK joined with '-' (ref CStarUtils.java:376-406)
    assert ids == {"7-conv-a-1-alice", "7-conv-a-2-bob", "8-conv-b-1-carol"}


def test_custom_separator(clustered):
    spec = TableSpec("msgs", ["tenant", "convo"], ["seq", "author"],
                     options={"id-separator": "_"})
    docs = build_documents(clustered, spec)
    assert docs.select(DOC_ID).first()[0].count("_") == 3


def test_ttl_field_and_shift(clustered):
    spec = TableSpec("msgs", ["tenant", "convo"], ["seq", "author"],
                     ttl_column="expire_at", options={"ttl-shift": 3600})
    docs = build_documents(clustered, spec)
    got = {r[DOC_ID]: r["_cassandraTtl"] for r in docs.collect()}
    assert got["7-conv-a-1-alice"] == 1700000000 + 3600
    assert got["7-conv-a-2-bob"] == INT_MAX  # no TTL sentinel


def test_iso8601_format(spark):
    df = spark.createDataFrame(
        [(datetime.datetime(2016, 1, 5, 13, 49, 25, 143000),)], "ts timestamp")
    out = df.select(iso8601(F.col("ts")).alias("s")).first()["s"]
    # ref JsonUtils.java docstring example: 2016-01-05T13:49:25.143Z
    assert out == "2016-01-05T13:49:25.143Z"


def test_indexation_date_present(clustered):
    spec = TableSpec("msgs", ["tenant", "convo"], ["seq", "author"])
    docs = build_documents(clustered, spec)
    row = docs.select("IndexationDate").first()
    assert row[0].endswith("Z") and "T" in row[0]


def test_json_serialized_field_queryable(spark):
    df = spark.createDataFrame(
        [("1", '{"LastName": "abbot", "FirstName": "ann"}'),
         ("2", '{"LastName": "zorn"}')],
        "Id string, AttributeValues string")
    spec = TableSpec("contact", ["Id"],
                     options={"json-serialized-fields": "AttributeValues"})
    docs = build_documents(df, spec)
    got = docs.select(F.col("AttributeValues")["LastName"].alias("ln")) \
              .orderBy("ln").collect()
    assert [r["ln"] for r in got] == ["abbot", "zorn"]


def test_flat_serialized_field(spark):
    raw = json.dumps({
        "maps": {"key1": "value", "key2": 42},
        "string": "string",
        "plplpl": [1, 2, 3, 4],
    })
    df = spark.createDataFrame([("1", raw)], "Id string, AllAttributes string")
    spec = TableSpec("contact", ["Id"],
                     options={"json-flat-serialized-fields": "AllAttributes"})
    docs = build_documents(df, spec)
    flat = docs.select("AllAttributes").first()[0]
    assert flat["maps"] == ["key1=value", "key2=42"]
    assert flat["string"] == ["string"]
    assert flat["plplpl"] == ["1", "2", "3", "4"]


def test_doc_json_serialization(spark):
    df = spark.createDataFrame(
        [("a", 5, datetime.datetime(2020, 6, 1, 12, 0, 0), True)],
        "id string, n int, ts timestamp, flag boolean")
    spec = TableSpec("t", ["id"])
    docs = build_documents(df, spec)
    out = doc_json(docs, spec).first()
    doc = json.loads(out["doc"])
    assert out[DOC_ID] == "a"
    assert doc["n"] == "5"
    assert doc["ts"] == "2020-06-01T12:00:00.000Z"
    assert doc["flag"] == "true"


def test_discard_nulls_modes(spark):
    df = spark.createDataFrame([("a", None)], "id string, body string")
    drop_spec = TableSpec("t", ["id"])  # discard-nulls default true
    keep_spec = TableSpec("t", ["id"], options={"discard-nulls": False})
    dropped = json.loads(doc_json(build_documents(df, drop_spec), drop_spec)
                         .first()["doc"])
    kept = json.loads(doc_json(build_documents(df, keep_spec), keep_spec)
                      .first()["doc"])
    # ref ElasticIndex.java:525-527: true skips dead cells, false writes
    # explicit nulls so fields can be erased
    assert "body" not in dropped
    assert kept["body"] is None


def test_static_mapping_overrides_inferred_types(spark):
    """`mapping-<table>` ES JSON at registration overrides inferred column
    types (ref IndexConfig.java:97, README.md:317-400)."""
    import json

    from cassandra_es_index_spark.docmodel import build_documents, mapping_casts

    df = spark.createDataFrame(
        [("a", 10, "5"), ("b", 20, "7")], "id string, n long, s string")
    mapping = json.dumps({"t": {"properties": {
        "n": {"type": "integer"},
        "s": {"type": "long"},
        "id": {"type": "keyword"},
    }}})
    spec = TableSpec("t", ["id"], options={"mapping-t": mapping})
    assert mapping_casts(spec) == {"n": "int", "s": "long", "id": "string"}
    docs = build_documents(df, spec)
    types = {f.name: f.dataType.simpleString() for f in docs.schema.fields}
    assert types["n"] == "int" and types["s"] == "bigint"
    # values cast, not dropped
    assert {r["s"] for r in docs.collect()} == {5, 7}


def test_static_mapping_unwrapped_properties(spark):
    from cassandra_es_index_spark.docmodel import mapping_casts

    spec = TableSpec("t", ["id"], options={
        "mapping": {"properties": {"n": {"type": "double"}}}})
    assert mapping_casts(spec) == {"n": "double"}
