"""ES percolator, Spark-first (round-9). The reference forwards
percolate requests to ES like any query (ref ElasticIndex.java:663-667);
ES stores the queries in a percolator field and runs each incoming doc
through a per-shard memory index. The engine inverts the shape for the
corpus-scale case: a BOUNDED stored-query set compiles to Column
predicates evaluated over the (unbounded, distributed) documents scan in
one pass — the alerting/routing primitive.

Contracts under test:
- one output row per (document, matching query), scores DOUBLE
- queries accept both query_string and JSON-DSL text, same parsers as
  search(); parse/compile errors are typed and name the query_id
- array-filter-then-explode: non-matching (doc, query) pairs never
  materialize as rows (plan shape), and the whole evaluation is one
  projection over one scan — no per-query scans, no join
"""

import pytest
from pyspark.sql import functions as F

from cassandra_es_index_spark.search.compile import CompileError
from cassandra_es_index_spark.search.engine import SearchEngine, TableSpec
from cassandra_es_index_spark.search.es_dsl import DslError


@pytest.fixture(scope="module")
def perc(spark):
    eng = SearchEngine(spark)
    df = spark.createDataFrame(
        [("a", "spark rules", 100), ("b", "flink wins", 500),
         ("c", "spark and flink and spark", 450), ("d", "other", None)],
        "id string, text string, n int")
    eng.register(df, TableSpec("perc", ["id"]))
    return eng, df


QUERIES = [
    ("q_spark", "text:spark"),
    ("q_big", '{"query":{"range":{"n":{"gte":400}}}}'),
    ("q_both", '{"query":{"bool":{"must":[{"term":{"text":"flink"}}],'
               '"filter":[{"range":{"n":{"gte":470}}}]}}}'),
]


def test_percolate_matches_and_scores(perc):
    eng, df = perc
    out = eng.percolate(df, QUERIES, default_field="text",
                        id_cols=("id",))
    got = sorted(tuple(r) for r in out.collect())
    assert got == [("a", "q_spark", 1.0),
                   ("b", "q_big", 1.0),
                   ("b", "q_both", 1.0),
                   ("c", "q_big", 1.0),
                   ("c", "q_spark", 2.0)]
    assert dict(out.dtypes)["_score"] == "double"


def test_percolate_queries_dataframe_form(perc):
    eng, df = perc
    qdf = df.sparkSession.createDataFrame(
        QUERIES, "query_id string, query string")
    out = eng.percolate(df, qdf, default_field="text", id_cols=("id",))
    assert out.count() == 5


def test_percolate_default_id_cols_keep_documents(perc):
    eng, df = perc
    out = eng.percolate(df, QUERIES[:1], default_field="text")
    assert out.columns == ["id", "text", "n", "query_id", "_score"]


def test_percolate_single_scan_no_join(perc):
    # ONE scan, no join, no per-query re-scan: the stored-query set
    # rides a single projection
    eng, df = perc
    out = eng.percolate(df, QUERIES, default_field="text",
                        id_cols=("id",))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Scan ") <= 1


def test_percolate_typed_errors_name_the_query(perc):
    eng, df = perc
    with pytest.raises(DslError, match="q_bad"):
        eng.percolate(df, [("q_bad", '{"query":{"nope":{}}}')],
                      default_field="text")
    with pytest.raises(CompileError, match="q_missing"):
        eng.percolate(df, [("q_missing", "missing_field:x")],
                      default_field="text")
    with pytest.raises(ValueError, match="at least one"):
        eng.percolate(df, [], default_field="text")


def test_percolate_mixed_fractional_scores(perc):
    # a fractional scorer beside tf-count queries: all scores DOUBLE
    eng, df = perc
    qs = [("q_rf", '{"query":{"rank_feature":{"field":"n",'
                   '"saturation":{"pivot":100}}}}'),
          ("q_spark", "text:spark")]
    out = eng.percolate(df, qs, default_field="text", id_cols=("id",))
    got = {(r["id"], r["query_id"]): r["_score"] for r in out.collect()}
    assert got[("a", "q_rf")] == pytest.approx(0.5)
    assert got[("b", "q_rf")] == pytest.approx(500.0 / 600.0)
    assert got[("a", "q_spark")] == 1.0


def test_percolate_r11_query_kinds(spark):
    # r11 surface rides percolate for free (stored queries go through
    # the same parse + compile): geo_shape and cross_fields
    from pyspark.sql import functions as F

    from cassandra_es_index_spark.search.engine import (
        SearchEngine, TableSpec,
    )
    eng = SearchEngine(spark)
    docs = (spark.createDataFrame(
        [(1, 57.6, 10.4, "spark fast"), (2, 40.7, -74.0, "slow words"),
         (3, None, None, "spark here")],
        "id int, lat double, lon double, text string")
        .select("id", "text", F.struct("lat", "lon").alias("loc")))
    qs = [
        ("near_jutland", '{"query":{"geo_shape":{"loc":{"shape":'
         '{"type":"envelope","coordinates":[[9.0,58.0],[11.0,57.0]]}'
         '}}}}'),
        ("cross", '{"query":{"multi_match":{"query":"spark",'
         '"fields":["text"],"type":"cross_fields"}}}'),
    ]
    out = eng.percolate(docs, qs, default_field="text",
                        id_cols=("id",))
    got = sorted((r["id"], r["query_id"]) for r in out.collect())
    assert got == [(1, "cross"), (1, "near_jutland"), (3, "cross")]


# ------------------------------- percolate QUERY kind (r12, ES form)
# Searched against a STORED-QUERIES table: matches the rows whose
# query text matches the inline document. Resolves through
# _expand_data_nodes → ScoredIds, so paging/bool composition/count
# all compose.

@pytest.fixture(scope="module")
def stored_q(spark):
    eng = SearchEngine(spark)
    df = spark.createDataFrame(
        [("alert_spark", "text:spark", "infra"),
         ("alert_big", '{"query":{"range":{"n":{"gte":400}}}}', "size"),
         ("alert_both", '{"query":{"bool":{"must":['
          '{"term":{"text":"flink"}}],"filter":['
          '{"range":{"n":{"gte":470}}}]}}}', "combo"),
         ("alert_null", None, "dead")],
        "qid string, query string, topic string")
    eng.register(df, TableSpec("stored_q", ["qid"]))
    return eng


def _perc_q(doc, extra=""):
    import json as _json
    return ('{"query":{"percolate":{"field":"query","document":'
            + _json.dumps(doc) + '}}' + extra + '}')


def test_percolate_query_kind_matches(stored_q):
    out = stored_q.search(
        "stored_q", "#options:load-rows=false#"
        + _perc_q({"text": "spark and flink and spark", "n": 480}),
        default_field="text")
    got = sorted((r["qid"], r["_score"]) for r in out.collect())
    # q_spark: tf 2; q_big: range score 1; q_both: must tf 1 + filter 0
    assert got == [("alert_big", 1.0), ("alert_both", 1.0),
                   ("alert_spark", 2.0)]


def test_percolate_query_kind_row_load_and_compose(stored_q):
    # default row-load mode returns the stored-query table's own rows
    out = stored_q.search(
        "stored_q", _perc_q({"text": "spark rules", "n": 10}),
        default_field="text")
    rows = out.collect()
    assert [r["qid"] for r in rows] == ["alert_spark"]
    assert rows[0]["topic"] == "infra"
    # composes under bool: percolate AND a filter on the stored-query
    # table's own metadata
    q = ('{"query":{"bool":{"must":[{"percolate":{"field":"query",'
         '"document":{"text":"spark","n":480}}}],'
         '"filter":[{"term":{"topic":"size"}}]}}}')
    out2 = stored_q.search("stored_q", q, default_field="topic")
    assert [r["qid"] for r in out2.collect()] == ["alert_big"]


def test_percolate_query_kind_no_match_and_nulls_skip(stored_q):
    # no stored query matches; the null-query row never errors
    out = stored_q.search(
        "stored_q", _perc_q({"text": "nothing here", "n": 1}),
        default_field="text")
    assert out.count() == 0


def test_percolate_query_kind_typed_errors(stored_q, spark):
    for body, msg in [
        ({"query": {"percolate": {"document": {"a": 1}}}}, "field"),
        ({"query": {"percolate": {"field": "query"}}}, "document"),
        ({"query": {"percolate": {"field": "query", "document": {},
                                  }}}, "non-empty"),
        ({"query": {"percolate": {"field": "query",
                                  "document": {"a": 1},
                                  "documents": [{"a": 1}]}}},
         "exactly one of"),
        ({"query": {"percolate": {"field": "query",
                                  "documents": []}}}, "non-empty"),
        ({"query": {"percolate": {"field": "query",
                                  "documents": [{"a": 1},
                                                {"b": 2}]}}},
         "share one key set"),
        ({"query": {"percolate": {"field": "query",
                                  "document": {"a": 1},
                                  "index": "x", "id": "1"}}},
         "unsupported parameters"),
    ]:
        import json as _json
        with pytest.raises(DslError, match=msg):
            stored_q.search("stored_q", _json.dumps(body)).collect()
    # a stored query referencing a field absent from the inline doc
    # is a typed error naming the offending query (engine contract:
    # unknown fields typed-error; ES would silently not match)
    with pytest.raises(CompileError, match="alert_big"):
        stored_q.search(
            "stored_q", _perc_q({"text": "only text"}),
            default_field="text").collect()
    # raw compile without the engine is typed
    from cassandra_es_index_spark.search.ast import PercolateDoc
    from cassandra_es_index_spark.search.compile import Compiler
    df = spark.createDataFrame([("a", "x")], "qid string, query string")
    with pytest.raises(CompileError, match="data-driven"):
        Compiler(df, "query").compile(PercolateDoc("query", "{}"))


def test_percolate_query_kind_count_and_aggs(stored_q):
    # the expansion hooks at every entry point: count + aggs over the
    # stored-query table scoped by the percolate match set
    import json as _json
    q = {"query": {"percolate": {"field": "query", "document":
                                 {"text": "spark flink", "n": 480}}}}
    assert stored_q.count("stored_q", _json.dumps(q),
                          default_field="text") == 3
    qa = dict(q)
    qa["aggs"] = {"by_topic": {"terms": {"field": "topic"}}}
    got = {(r["key"], r["doc_count"]) for r in
           stored_q.search_aggs("stored_q", _json.dumps(qa),
                                default_field="text").collect()}
    assert got == {("infra", 1), ("size", 1), ("combo", 1)}


def test_percolate_documents_multi_slot(stored_q):
    # multi-document form (r12): a stored query matching ANY slot
    # qualifies; its score SUMS the per-slot scores (the engine's Σ
    # composition — ES reports per-slot fields instead, documented)
    import json as _json
    one = {"query": {"percolate": {
        "field": "query",
        "document": {"text": "spark spark", "n": 480}}},
        "size": 100}
    multi = {"query": {"percolate": {
        "field": "query",
        "documents": [{"text": "spark spark", "n": 480},
                      {"text": "spark", "n": 10},
                      {"text": "nothing", "n": 0}]}}, "size": 100}
    r1 = {r["qid"]: r["_score"] for r in stored_q.search(
        "stored_q", "#options:load-rows=false#"
        + _json.dumps(one)).collect()}
    rm_ = {r["qid"]: r["_score"] for r in stored_q.search(
        "stored_q", "#options:load-rows=false#"
        + _json.dumps(multi)).collect()}
    # every single-doc match persists, and queries matching the extra
    # 'alpha' slot gain its score on top
    assert set(r1) <= set(rm_)
    for qid, s in r1.items():
        assert rm_[qid] >= s


def test_percolate_batch_cap_and_duplicate_ids(spark):
    # r14.75: the batch API gains the DSL path's 10k ceiling (an
    # unbounded stored set is a driver Column-tree melt) and rejects
    # duplicate query ids
    from cassandra_es_index_spark.catalog import TableSpec
    from cassandra_es_index_spark.search import SearchEngine
    from cassandra_es_index_spark.search.es_dsl import DslError

    eng = SearchEngine(spark)
    docs = spark.createDataFrame([(1, "spark fast")],
                                 "id int, body string")
    eng.register(docs, TableSpec("pcap", ["id"]))
    with pytest.raises(DslError, match="more than 10000"):
        eng.percolate(docs, [(f"q{i}", "body:spark")
                             for i in range(10001)])
    with pytest.raises(DslError, match="duplicate query_id"):
        eng.percolate(docs, [("q1", "body:spark"),
                             ("q1", "body:fast")])
