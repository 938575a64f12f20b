"""ES ``_terms_enum`` and ``_rank_eval`` analogues (r12). The reference
exposes ES verbatim (ref ElasticIndex.java:663-667); these complete the
dictionary/evaluation API tier. rank_eval shape: each rated request is
an ordinary top-k search; its ≤k hits join a broadcast rating literal
and the metric aggregates ≤k rows — never a corpus pass beyond the
query's own."""

import json

import pytest

from cassandra_es_index_spark.catalog import TableSpec
from cassandra_es_index_spark.search import SearchEngine
from cassandra_es_index_spark.search import es_dsl


@pytest.fixture(scope="module")
def eng(spark):
    eng = SearchEngine(spark)
    df = spark.createDataFrame(
        [(1, "spark spark spark"), (2, "spark spark other"),
         (3, "spark other other"), (4, "nothing here")],
        "id bigint, text string")
    eng.register(df, TableSpec("re", ["id"]))
    return eng


def test_terms_enum_prefix_order_paging(eng):
    assert [r["token"] for r in
            eng.terms_enum("re", "text", "sp").collect()] == ["spark"]
    assert [r["token"] for r in
            eng.terms_enum("re", "text", size=2).collect()] == \
        ["here", "nothing"]
    # keyset cursor: strictly after
    assert [r["token"] for r in
            eng.terms_enum("re", "text", size=2,
                           search_after="nothing").collect()] == \
        ["other", "spark"]
    # uppercase prefix lowercases (case_insensitive convention)
    assert [r["token"] for r in
            eng.terms_enum("re", "text", "SP").collect()] == ["spark"]


def test_terms_enum_typed_errors(eng):
    with pytest.raises(es_dsl.DslError, match="case_insensitive"):
        eng.terms_enum("re", "text", case_insensitive=False)
    with pytest.raises(es_dsl.DslError, match="size"):
        eng.terms_enum("re", "text", size=0)


def _body(metric, ratings_q1=None):
    return {"requests": [
        {"id": "q1", "request": {"query": {"term": {"text": "spark"}}},
         "ratings": ratings_q1 if ratings_q1 is not None else
         [{"_id": "1", "rating": 3}, {"_id": "3", "rating": 0},
          {"_id": "2", "rating": 1}]},
        {"id": "q2",
         "request": {"query": {"term": {"text": "nothing"}}},
         "ratings": [{"_id": "1", "rating": 1}]},
    ], "metric": metric}


def test_rank_eval_precision_recall_mrr(eng):
    # ranking for text:spark — doc1 (tf3), doc2 (tf2), doc3 (tf1)
    rows = {r["id"]: r for r in eng.rank_eval(
        "re", _body({"precision": {"k": 3}})).collect()}
    assert rows["q1"]["metric_score"] == pytest.approx(2 / 3, abs=1e-6)
    assert rows["q2"]["metric_score"] == 0.0   # q2 hit (doc 4) unrated
    assert rows["q1"]["overall"] == pytest.approx(1 / 3, abs=1e-6)

    rows = {r["id"]: r for r in eng.rank_eval(
        "re", _body({"recall": {"k": 2}})).collect()}
    # relevant in ratings: docs 1, 2 — both inside the top-2 window
    assert rows["q1"]["metric_score"] == pytest.approx(1.0)

    rows = {r["id"]: r for r in eng.rank_eval(
        "re", _body({"mean_reciprocal_rank": {"k": 3}})).collect()}
    assert rows["q1"]["metric_score"] == pytest.approx(1.0)
    # first relevant at rank 2 when doc1 is rated 0
    rows = {r["id"]: r for r in eng.rank_eval(
        "re", _body({"mean_reciprocal_rank": {"k": 3}},
                    ratings_q1=[{"_id": "1", "rating": 0},
                                {"_id": "2", "rating": 2}])).collect()}
    assert rows["q1"]["metric_score"] == pytest.approx(0.5)


def test_rank_eval_dcg_ndcg_hand_computed(eng):
    import math
    rows = {r["id"]: r for r in eng.rank_eval(
        "re", _body({"dcg": {"k": 3}})).collect()}
    # gains by rank: 3, 1, 0 → 7/log2(2) + 1/log2(3) + 0
    exp = 7.0 + 1.0 / math.log2(3.0)
    assert rows["q1"]["metric_score"] == pytest.approx(exp, abs=1e-5)
    rows = {r["id"]: r for r in eng.rank_eval(
        "re", _body({"dcg": {"k": 3, "normalize": True}})).collect()}
    # ideal order 3,1,0 equals the actual order → NDCG 1
    assert rows["q1"]["metric_score"] == pytest.approx(1.0)


def test_rank_eval_typed_errors(eng):
    with pytest.raises(es_dsl.DslError, match="metric must be one of"):
        eng.rank_eval("re", _body({"expected_reciprocal_rank": {}}))
    with pytest.raises(es_dsl.DslError, match="k must be"):
        eng.rank_eval("re", _body({"precision": {"k": 0}}))
    with pytest.raises(es_dsl.DslError, match="unsupported params"):
        eng.rank_eval("re", _body({"precision": {"ignore_unlabeled":
                                                 True}}))
    with pytest.raises(es_dsl.DslError, match="each rating needs"):
        eng.rank_eval("re", {"requests": [
            {"id": "x", "request": {"query": {"match_all": {}}},
             "ratings": [{"doc": "1"}]}],
            "metric": {"precision": {}}})
    with pytest.raises(es_dsl.DslError, match="at most 50"):
        eng.rank_eval("re", {"requests": [
            {"id": str(i), "request": {"query": {"match_all": {}}},
             "ratings": []} for i in range(51)],
            "metric": {"precision": {}}})
    comp = SearchEngine(eng.spark)
    comp.register(eng.spark.createDataFrame([("a", "b", "t")],
                                            "k1 string, k2 string, "
                                            "text string"),
                  TableSpec("re2", ["k1", "k2"]))
    with pytest.raises(es_dsl.DslError, match="single-key"):
        comp.rank_eval("re2", _body({"precision": {}}))
