"""Unit tests for BM25 scoring, the postings index, and the as-of join."""

import datetime
import math

import pytest
from pyspark.sql import functions as F

from cassandra_es_index_spark.operators.asof import asof_join
from cassandra_es_index_spark.search import postings as post
from cassandra_es_index_spark.search import scoring


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spark spark spark engine"),
        (2, "spark data pipeline"),
        (3, "data data lake"),
        (4, "unrelated words entirely"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_ranks_tf_and_rarity(corpus):
    out = scoring.bm25_topk(corpus, "text", ["spark"], "doc_id", k=10)
    rows = [(r["doc_id"], r["_bm25"]) for r in out.collect()]
    ids = [r[0] for r in rows]
    assert ids == [1, 2]  # doc 1 has higher tf; non-matching docs absent
    assert rows[0][1] > rows[1][1] > 0


def test_bm25_matches_reference_formula(corpus):
    out = {r["doc_id"]: r["_bm25"]
           for r in scoring.bm25_score(corpus, "text", ["spark"]).collect()}
    # hand-computed: N=4, df=2, avgdl = (4+3+3+3)/4 = 3.25
    idf = math.log(1 + (4 - 2 + 0.5) / (2 + 0.5))
    dl1, tf1 = 4.0, 3.0
    expected1 = idf * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl1 / 3.25))
    assert out[1] == round(expected1, 6)


def test_postings_roundtrip(corpus):
    p = post.build_postings(corpus, "doc_id", "text")
    got = {(r["token"], r["doc"]): r["tf"] for r in p.collect()}
    assert got[("spark", 1)] == 3
    assert got[("data", 3)] == 2

    any_hits = {r["doc"]: r["score"]
                for r in post.lookup_terms(p, ["spark", "data"]).collect()}
    assert any_hits == {1: 3, 2: 2, 3: 2}

    all_hits = {r["doc"] for r in
                post.lookup_terms(p, ["spark", "data"], mode="all").collect()}
    assert all_hits == {2}


def test_postings_equals_scan_semantics(corpus):
    """postings lookup == whole-token regex count (the oracle contract)."""
    p = post.lookup_terms(post.build_postings(corpus, "doc_id", "text"), ["spark"])
    scan = (corpus
            .select("doc_id",
                    F.size(F.regexp_extract_all("text", F.lit(r"(?i)\bspark\b"),
                                                F.lit(0))).cast("long").alias("score"))
            .where(F.col("score") > 0))
    got = {(r["doc"], r["score"]) for r in p.collect()}
    want = {(r["doc_id"], r["score"]) for r in scan.collect()}
    assert got == want


def _ts(minute, second=0):
    return datetime.datetime(2024, 1, 1, 0, minute, second)


def test_asof_join_strict(spark):
    left = spark.createDataFrame(
        [(100, 1, _ts(10)), (101, 1, _ts(20)), (102, 2, _ts(5))],
        "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(9), 1.0), (1, _ts(15), 2.0), (1, _ts(20), 3.0),
         (3, _ts(1), 9.0)],
        "user_id long, ts timestamp, value double")
    out = asof_join(left, right, by=["user_id"], ts_col="ts",
                    value_cols=["value"], strict=True)
    got = {r["event_id"]: (r["asof_ts"], r["asof_value"]) for r in out.collect()}
    assert got[100] == (_ts(9), 1.0)
    # strict: the ts(20) click does NOT match the ts(20) event
    assert got[101] == (_ts(15), 2.0)
    assert got[102] == (None, None)  # user 2 has no clicks


def test_asof_join_inclusive(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(20))], "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(20), 3.0)], "user_id long, ts timestamp, value double")
    out = asof_join(left, right, by=["user_id"], ts_col="ts",
                    value_cols=["value"], strict=False)
    assert out.first()["asof_value"] == 3.0


def test_postings_bucketed_roundtrip(corpus, spark, tmp_path):
    """write_postings → read_postings: identical lookups, and the term
    filter prunes to matching buckets (the 100 TB path: a lookup touches
    1/buckets of the index)."""
    p = post.build_postings(corpus, "doc_id", "text")
    want = sorted(map(tuple, post.lookup_terms(p, ["spark"]).collect()))

    post.write_postings(p, str(tmp_path / "postings"), buckets=4,
                        table_name="postings_rt")
    try:
        stored = post.read_postings(spark, "postings_rt")
        got = sorted(map(tuple, post.lookup_terms(stored, ["spark"]).collect()))
        assert got == want and len(got) == 2
        plan = (stored.where(F.col("token") == "spark")
                ._jdf.queryExecution().executedPlan().toString())
        assert "SelectedBucketsCount: 1 out of 4" in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS postings_rt")


def test_bm25_postings_matches_scan_bitwise(corpus):
    """The postings-served BM25 must equal the corpus-scan BM25 exactly —
    same formula, same fixed term-order summation, same 6-dp rounding —
    so the two implementations are interchangeable under the oracle."""
    p = post.build_postings(corpus, "doc_id", "text")
    scan = {r["doc_id"]: r["_bm25"] for r in
            scoring.bm25_topk(corpus, "text", ["spark", "data"],
                              "doc_id", k=10).collect()}
    idx = {r["doc"]: r["_bm25"] for r in
           scoring.bm25_topk_postings(p, ["spark", "data"], k=10).collect()}
    assert idx == scan
    # single-term too
    scan1 = {r["doc_id"]: r["_bm25"] for r in
             scoring.bm25_topk(corpus, "text", ["spark"],
                               "doc_id", k=10).collect()}
    idx1 = {r["doc"]: r["_bm25"] for r in
            scoring.bm25_topk_postings(p, ["spark"], k=10).collect()}
    assert idx1 == scan1


def test_bm25_postings_explicit_lengths(spark):
    """A zero-token doc has no postings row; passing the corpus-derived
    lengths keeps N/avgdl identical to the scan implementation."""
    rows = [(1, "spark spark"), (2, "data"), (3, "")]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    p = post.build_postings(corpus, "doc_id", "text")
    from cassandra_es_index_spark.functions.analyzers import standard
    lens = corpus.select(F.col("doc_id").alias("doc"),
                         F.size(standard(F.col("text")))
                          .cast("double").alias("_dl"))
    scan = {r["doc_id"]: r["_bm25"] for r in
            scoring.bm25_topk(corpus, "text", ["spark"],
                              "doc_id", k=10).collect()}
    idx = {r["doc"]: r["_bm25"] for r in
           scoring.bm25_topk_postings(p, ["spark"], k=10,
                                      lengths=lens).collect()}
    assert idx == scan
