"""Streaming-semantics tests (SURVEY.md §2.8): last-writer-wins, tombstone
policy, analytic mode, foreachBatch wiring, watermarked windows."""

import datetime

import pytest
from pyspark.sql import functions as F

from cassandra_es_index_spark.catalog import TableSpec
from cassandra_es_index_spark.docmodel import DOC_ID
from cassandra_es_index_spark.indexstore import ParquetIndexStore
from cassandra_es_index_spark.streaming import apply_mutation_batch
from cassandra_es_index_spark.streaming.indexer import MutationIndexer
from cassandra_es_index_spark.streaming import windows as W

MUT_SCHEMA = "ts timestamp, op string, id string, body string, userid int"


def _ts(minute):
    return datetime.datetime(2024, 1, 1, 0, minute)


def _store(spark, tmp_path, options=None):
    spec = TableSpec("emails", ["id"], options=options or {})
    return ParquetIndexStore(spark, str(tmp_path / "idx"), spec)


def test_last_writer_wins_within_batch(spark, tmp_path):
    store = _store(spark, tmp_path)
    batch = spark.createDataFrame([
        (_ts(1), "insert", "a", "v1", 1),
        (_ts(2), "update", "a", "v2", 2),
        (_ts(3), "update", "a", "v3", 3),
        (_ts(1), "insert", "b", "b1", 1),
    ], MUT_SCHEMA)
    apply_mutation_batch(store, batch)
    got = {r[DOC_ID]: r["body"] for r in store.read().collect()}
    assert got == {"a": "v3", "b": "b1"}  # W3: one deterministic writer per key


def test_partition_delete_propagates(spark, tmp_path):
    store = _store(spark, tmp_path)
    apply_mutation_batch(store, spark.createDataFrame(
        [(_ts(1), "insert", "a", "v1", 1), (_ts(1), "insert", "b", "b1", 1)],
        MUT_SCHEMA))
    apply_mutation_batch(store, spark.createDataFrame(
        [(_ts(2), "partition_delete", "a", None, None)], MUT_SCHEMA))
    assert {r[DOC_ID] for r in store.read().collect()} == {"b"}


def test_delete_then_update_in_same_batch_keeps_latest(spark, tmp_path):
    store = _store(spark, tmp_path)
    batch = spark.createDataFrame([
        (_ts(1), "insert", "a", "v1", 1),
        (_ts(2), "partition_delete", "a", None, None),
        (_ts(3), "update", "a", "v3", 3),
    ], MUT_SCHEMA)
    apply_mutation_batch(store, batch)
    got = {r[DOC_ID]: r["body"] for r in store.read().collect()}
    assert got == {"a": "v3"}  # latest mutation wins, delete superseded


def test_empty_update_is_not_a_delete(spark, tmp_path):
    # UCS-4927 (ref EsSecondaryIndexTest.java:151-160)
    store = _store(spark, tmp_path)
    apply_mutation_batch(store, spark.createDataFrame(
        [(_ts(1), "insert", "a", "v1", 1)], MUT_SCHEMA))
    apply_mutation_batch(store, spark.createDataFrame(
        [(_ts(2), "empty_update", "a", None, None)], MUT_SCHEMA))
    got = {r[DOC_ID]: r["body"] for r in store.read().collect()}
    assert got == {"a": "v1"}  # unchanged


def test_analytic_mode_skips_deletes(spark, tmp_path):
    # W8 (ref EsSecondaryIndex.java:413, README.md:465-469)
    store = _store(spark, tmp_path, {"es-analytic-mode": True})
    apply_mutation_batch(store, spark.createDataFrame(
        [(_ts(1), "insert", "a", "v1", 1)], MUT_SCHEMA))
    apply_mutation_batch(store, spark.createDataFrame(
        [(_ts(2), "partition_delete", "a", None, None)], MUT_SCHEMA))
    assert {r[DOC_ID] for r in store.read().collect()} == {"a"}


def test_foreachbatch_stream(spark, tmp_path):
    """Drive the MutationIndexer through a real Structured Streaming query
    (parquet file source, availableNow trigger)."""
    src_dir = str(tmp_path / "mutations")
    mutations = spark.createDataFrame([
        (_ts(1), "insert", "a", "v1", 1),
        (_ts(2), "update", "a", "v2", 2),
        (_ts(1), "insert", "b", "b1", 1),
        (_ts(3), "partition_delete", "b", None, None),
    ], MUT_SCHEMA)
    mutations.coalesce(1).write.mode("overwrite").parquet(src_dir)

    store = _store(spark, tmp_path)
    stream = (spark.readStream.schema(mutations.schema).parquet(src_dir))
    q = MutationIndexer(store).start(stream, str(tmp_path / "ckpt"))
    assert q.awaitTermination(300)  # availableNow: must self-terminate
    got = {r[DOC_ID]: r["body"] for r in store.read().collect()}
    assert got == {"a": "v2"}  # b inserted then deleted in the same batch


def test_tumbling_window_batch(spark):
    df = spark.createDataFrame(
        [(_ts(1), "click", 1.0), (_ts(2), "click", 2.0), (_ts(40), "click", 4.0)],
        "ts timestamp, event_type string, value double")
    out = W.tumbling(df, "ts", "30 minutes", ["event_type"],
                     [F.count("*").alias("n"), F.sum("value").alias("v")])
    rows = {(r["win_start"].minute, r["n"], r["v"]) for r in out.collect()}
    assert rows == {(0, 2, 3.0), (30, 1, 4.0)}


def test_session_window_batch(spark):
    df = spark.createDataFrame(
        [(_ts(1), 1), (_ts(5), 1), (_ts(50), 1)], "ts timestamp, user int")
    out = W.session(df, "ts", "10 minutes", ["user"],
                    [F.count("*").alias("n")])
    ns = sorted(r["n"] for r in out.collect())
    assert ns == [1, 2]  # two sessions: {1,5} and {50}


def test_streaming_windowed_agg_end_to_end(spark, tmp_path):
    """Watermarked tumbling aggregation over a real stream into memory."""
    src_dir = str(tmp_path / "events_src")
    df = spark.createDataFrame(
        [(_ts(1), "click", 1.0), (_ts(2), "view", 2.0), (_ts(31), "click", 3.0)],
        "ts timestamp, event_type string, value double")
    df.coalesce(1).write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(df.schema).parquet(src_dir)
    agg = (stream.withWatermark("ts", "10 minutes")
                 .groupBy(F.window("ts", "30 minutes"), "event_type")
                 .agg(F.count("*").alias("n")))
    q = (agg.writeStream.outputMode("complete")
         .format("memory").queryName("winagg")
         .trigger(availableNow=True).start())
    assert q.awaitTermination(300)  # availableNow: must self-terminate
    rows = spark.sql("SELECT event_type, n FROM winagg").collect()
    got = {(r["event_type"], r["n"]) for r in rows}
    assert ("view", 1) in got and ("click", 1) in got


def test_streaming_warc_ingest_end_to_end(spark, tmp_path):
    """Crawl ingestion under Structured Streaming (r14.75): WARC
    archives arrive as binary rows, warc_responses (mapInPandas) and
    html_to_text run unchanged on the streaming frame, and the cleaned
    pages land in a memory sink — the fineweb head as a stream."""
    import pandas as pd

    from cassandra_es_index_spark.functions.text import html_to_text
    from cassandra_es_index_spark.functions.warc import build_warc
    from cassandra_es_index_spark.operators import web_ingest

    src_dir = str(tmp_path / "warc_src")
    pages = [{"url": "http://s.test/1", "date": "2024-01-01T00:00:00Z",
              "body": "<html><body><p>streamed &amp; clean</p>"
                      "</body></html>"},
             {"url": "http://s.test/2", "date": "2024-01-01T00:00:01Z",
              "body": "gone", "status": 404,
              "content_type": "text/plain"}]
    pdf = pd.DataFrame({"archive_id": ["w1"],
                        "content": [build_warc(pages, compress=True)]})
    df = spark.createDataFrame(pdf, "archive_id string, content binary")
    df.coalesce(1).write.mode("overwrite").parquet(src_dir)

    stream = spark.readStream.schema(df.schema).parquet(src_dir)
    cleaned = (web_ingest.warc_responses(stream)
               .where("http_status = 200 AND mime = 'text/html'")
               .select("url", html_to_text(F.col("body_text"))
                       .alias("text")))
    q = (cleaned.writeStream.outputMode("append")
         .format("memory").queryName("warc_pages")
         .trigger(availableNow=True).start())
    assert q.awaitTermination(300)  # availableNow: must self-terminate
    rows = spark.sql("SELECT url, text FROM warc_pages").collect()
    assert [(r["url"], r["text"]) for r in rows] == \
        [("http://s.test/1", "streamed & clean")]
