"""terms_set query, _analyze API, and the suggest term-dictionary cache
(round 7, VERDICT items 5-7).

terms_set: Lucene CoveringQuery semantics — at least
minimum_should_match(doc) of the supplied terms occur in the field;
thresholds < 1 clamp to 1, null thresholds match nothing; score = Σ tf
of matched terms. Index-served as ONE `token IN terms` postings filter
+ per-doc (count, Σtf) aggregation with the floor joined from the
threshold field's range index.
"""

import pytest
from pyspark.sql import types as T

from cassandra_es_index_spark.search.engine import SearchEngine, TableSpec
from cassandra_es_index_spark.search.es_dsl import DslError, parse_request

ROWS = [
    # id, text, required
    ("a", "spark streams tables", 2),       # 3 matches
    ("b", "spark and nothing else", 2),     # 1 match  → below floor
    ("c", "spark tables", 2),               # 2 matches → meets floor
    ("d", "spark spark tables", 3),         # 2 distinct < 3
    ("e", "streams", 0),                    # clamp: 0 → 1, matches
    ("f", "spark streams tables", None),    # null floor → no match
]

Q = ('{"query":{"terms_set":{"text":{"terms":'
     '["spark","streams","tables"],'
     '"minimum_should_match_field":"required"}}}}')


@pytest.fixture(scope="module")
def ts_engine(spark):
    eng = SearchEngine(spark)
    df = spark.createDataFrame(ROWS, "id string, text string, required int")
    eng.register(df, TableSpec("ts_docs", ["id"]))
    return eng


def test_terms_set_scan_semantics(ts_engine):
    got = {r["id"]: r["_score"]
           for r in ts_engine.search("ts_docs", Q).collect()}
    # scores are Σ tf of matched terms: d has spark×2 + tables×1 but
    # only 2 distinct < required 3 → excluded
    assert got == {"a": 3, "c": 2, "e": 1}


def test_terms_set_script_threshold(ts_engine):
    q = ('{"query":{"terms_set":{"text":{"terms":'
         '["spark","streams","tables"],'
         '"minimum_should_match_script":'
         '{"source":"params.num_terms - 1"}}}}}')
    got = {r["id"] for r in ts_engine.search("ts_docs", q).collect()}
    # floor = 3 − 1 = 2 everywhere
    assert got == {"a", "c", "d", "f"}


def test_terms_set_validation():
    with pytest.raises(DslError, match="terms"):
        parse_request({"query": {"terms_set": {"text": {}}}})
    with pytest.raises(DslError, match="exactly one"):
        parse_request({"query": {"terms_set": {"text": {
            "terms": ["a"]}}}})
    with pytest.raises(DslError, match="exactly one"):
        parse_request({"query": {"terms_set": {"text": {
            "terms": ["a"], "minimum_should_match_field": "x",
            "minimum_should_match_script": {"source": "1"}}}}})
    from cassandra_es_index_spark.search.ast import MatchNone
    req = parse_request({"query": {"terms_set": {"text": {
        "terms": [], "minimum_should_match_field": "x"}}}})
    assert isinstance(req.node, MatchNone)


def test_terms_set_duplicate_terms_collapse(ts_engine):
    q = ('{"query":{"terms_set":{"text":{"terms":'
         '["spark","Spark","tables"],'
         '"minimum_should_match_field":"required"}}}}')
    got = {r["id"] for r in ts_engine.search("ts_docs", q).collect()}
    # "spark"/"Spark" are one term — c meets floor 2 via spark+tables,
    # b (only spark) does not
    assert "c" in got and "b" not in got


@pytest.fixture(scope="module")
def ts_indexed(spark):
    eng = SearchEngine(spark)
    df = spark.createDataFrame(ROWS, "id string, text string, required int")
    eng.register(df, TableSpec("ts_idx", ["id"]))
    eng.build_postings_index("ts_idx", "text", materialize=True)
    eng.build_range_index("ts_idx", "required")
    return eng


def test_terms_set_index_served_bit_exact(ts_engine, ts_indexed):
    scan = {(r["id"], r["_score"])
            for r in ts_engine.search("ts_docs", Q).collect()}
    out = ts_indexed.search("ts_idx", "#options:load-rows=false#" + Q)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "regexp_extract_all" not in plan   # scan-free
    got = {(r["id"], r["_score"]) for r in out.collect()}
    assert got == scan == {("a", 3), ("c", 2), ("e", 1)}


# -- _analyze ----------------------------------------------------------------


def test_analyze_api(spark):
    eng = SearchEngine(spark)
    out = eng.analyze("Quick-Brown FOX!")
    rows = [(r["token"], r["position"]) for r in out.collect()]
    assert rows == [("quick", 0), ("brown", 1), ("fox", 2)]
    assert [f.name for f in out.schema.fields] == ["token", "position"]
    kw = eng.analyze("One Token", analyzer="keyword").collect()
    assert [(r["token"], r["position"]) for r in kw] == [("One Token", 0)]
    with pytest.raises(DslError, match="unknown analyzer"):
        eng.analyze("x", analyzer="nope")


# -- suggest dictionary cache -------------------------------------------------


def test_suggest_dictionary_cached_and_invalidated(spark):
    from pyspark.sql import functions as F

    from cassandra_es_index_spark.docmodel import build_documents

    eng = SearchEngine(spark)
    df = spark.createDataFrame(
        [("a", "hello world"), ("b", "hello sparkk")],
        "id string, text string")
    spec = TableSpec("sugg_docs", ["id"])
    eng.register(df, spec)
    eng.build_postings_index("sugg_docs", "text")
    r1 = eng.suggest_similar("sugg_docs", "spark", field="text").collect()
    d1 = eng._term_dict[("sugg_docs", "text")]
    r2 = eng.suggest_similar("sugg_docs", "spark", field="text").collect()
    # same cached frame object reused, results stable
    assert eng._term_dict[("sugg_docs", "text")] is d1
    assert r1 == r2 and r1[0]["token"] == "sparkk"
    # suggest_phrase shares the same cache
    eng.suggest_phrase("sugg_docs", "helo sparkk", field="text").collect()
    assert eng._term_dict[("sugg_docs", "text")] is d1

    # incremental delta invalidates: new vocabulary becomes visible
    new_rows = [("c", "sparko arrives")]
    new_docs = build_documents(
        spark.createDataFrame(new_rows, "id string, text string"), spec)
    resolved = build_documents(
        spark.createDataFrame(
            [("a", "hello world"), ("b", "hello sparkk")] + new_rows,
            "id string, text string"), spec)
    eng.apply_delta("sugg_docs", resolved, new_docs, None)
    assert ("sugg_docs", "text") not in eng._term_dict
    toks = {r["token"]
            for r in eng.suggest_similar("sugg_docs", "spark", field="text").collect()}
    assert "sparko" in toks
