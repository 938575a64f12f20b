"""Connector gating (Cassandra source / ES sink fallbacks) + layered
config resolution (ref config/OptionReader.java:109-210)."""

import os

import pytest

from cassandra_es_index_spark.catalog import TableSpec
from cassandra_es_index_spark.config import IndexConfig
from cassandra_es_index_spark.docmodel import DOC_ID
from cassandra_es_index_spark.indexstore import ParquetIndexStore
from cassandra_es_index_spark.sinks.elasticsearch import (
    es_available, es_writer_options, write_documents,
)
from cassandra_es_index_spark.sources.cassandra import (
    cassandra_available, read_table_or_fixture,
)


def test_cassandra_falls_back_to_fixture(spark, sf_dir):
    assert not cassandra_available(spark)  # jar not in this image
    df = read_table_or_fixture(spark, "ks", "nation", fixture_dir=sf_dir)
    assert df.count() > 0
    with pytest.raises(RuntimeError, match="no Cassandra connector"):
        read_table_or_fixture(spark, "ks", "nation")


def test_es_sink_falls_back_to_store(spark, tmp_path, sf_dir):
    assert not es_available(spark)
    base = read_table_or_fixture(spark, "ks", "nation", fixture_dir=sf_dir)
    spec = TableSpec("nation", ["n_nationkey"])
    store = ParquetIndexStore(spark, str(tmp_path / "idx"), spec)
    from cassandra_es_index_spark.docmodel import build_documents
    docs = build_documents(base, spec)
    path = write_documents(docs, "ks_nation_index", fallback_store=store)
    assert path == "parquet"
    assert store.count() == base.count()
    assert DOC_ID in store.read().columns
    with pytest.raises(RuntimeError, match="fallback_store"):
        write_documents(docs, "ks_nation_index")


def test_es_writer_options_mirror_reference():
    opts = es_writer_options(IndexConfig())
    assert opts["es.write.operation"] == "upsert"        # doc_as_upsert
    assert opts["es.update.retry.on.conflict"] == "5"    # IndexConfig default
    assert opts["es.mapping.id"] == "_id"


# -- config resolution ------------------------------------------------------


def test_defaults():
    cfg = IndexConfig()
    assert cfg.max_results == 10_000
    assert cfg.discard_nulls is True
    assert cfg.get("async-write") is True
    assert cfg.id_separator == "-"


def test_precedence_table_under_file():
    cfg = IndexConfig(table_options={"max-results": "5"},
                      file_options={"max-results": "7"})
    assert cfg.max_results == 7  # file layer wins over table options


def test_env_overrides_everything(monkeypatch):
    monkeypatch.setenv("CASSANDRA_ES_INDEX_MAX_RESULTS", "3")
    cfg = IndexConfig(table_options={"max-results": "5"},
                      file_options={"max-results": "7"})
    assert cfg.max_results == 3


def test_hyphen_dot_variants():
    cfg = IndexConfig(table_options={"async.write": "false"})
    assert cfg.get("async-write") is False


def test_scope_prefix_most_specific_wins():
    # reference: '<dc>.<rack>.' tried before '<dc>.' (OptionReader.java:172-210)
    cfg = IndexConfig(table_options={"dc1.rack1.max-results": "1",
                                     "dc1.max-results": "2",
                                     "max-results": "3"},
                      scope="dc1.rack1")
    assert cfg.max_results == 1
    cfg2 = IndexConfig(table_options={"dc1.max-results": "2",
                                      "max-results": "3"}, scope="dc1.rack1")
    assert cfg2.max_results == 2
    cfg3 = IndexConfig(table_options={"max-results": "3"}, scope="dc1.rack1")
    assert cfg3.max_results == 3


def test_bool_coercion_and_errors():
    cfg = IndexConfig(table_options={"discard-nulls": "off"})
    assert cfg.discard_nulls is False
    with pytest.raises(ValueError):
        IndexConfig(table_options={"discard-nulls": "maybe"}).discard_nulls


def test_csv_lists():
    cfg = IndexConfig(table_options={"json-serialized-fields": "A, B ,C"})
    assert cfg.json_serialized_fields == ["A", "B", "C"]
    assert IndexConfig().json_flat_serialized_fields == []
