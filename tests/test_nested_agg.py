"""ES ``nested`` aggregation (r9): sub-aggregations over the ELEMENTS
of an array<struct> field — one explode rebinds the agg frame, element
fields resolve by their ES dotted path, doc_count switches to element
counts. The reference forwards agg bodies verbatim to ES, so the ES
contracts are the parity targets."""

import json

import pytest

from cassandra_es_index_spark.search.engine import SearchEngine, TableSpec
from cassandra_es_index_spark.search.es_dsl import DslError

ROWS = [
    (1, "x", [("a", 5.0), ("b", 3.0)]),
    (2, "x", [("a", 1.0)]),
    (3, "y", []),              # empty array: zero elements
    (4, "y", None),            # null array: zero elements
    (5, "x x", [("b", 2.0), ("b", 4.0), ("c", 7.0)]),
]


@pytest.fixture(scope="module")
def eng(spark):
    e = SearchEngine(spark)
    docs = spark.createDataFrame(
        ROWS, "id int, text string, "
              "items array<struct<tag:string, qty:double>>")
    e.register(docs, TableSpec("nag", ["id"]))
    return e


def _run(eng, q):
    return eng.search_aggs("nag", json.dumps(q)).collect()


def test_element_doc_count_skips_null_and_empty(eng):
    rows = _run(eng, {"query": {"match_all": {}},
                      "aggs": {"n": {"nested": {"path": "items"}}}})
    assert len(rows) == 1 and rows[0]["doc_count"] == 6


def test_terms_metrics_pipelines_over_elements(eng):
    rows = _run(eng, {"query": {"match_all": {}}, "aggs": {
        "n": {"nested": {"path": "items"}, "aggs": {
            "by": {"terms": {"field": "items.tag"}, "aggs": {
                "s": {"sum": {"field": "items.qty"}},
                "p": {"normalize": {"buckets_path": "s",
                                    "method": "percent_of_sum"}}}}}}}})
    by = {r["key"]: r for r in rows}
    assert by["b"]["doc_count"] == 3 and by["b"]["s"] == 9.0
    assert by["a"]["doc_count"] == 2 and by["a"]["s"] == 6.0
    assert abs(by["c"]["p"] - 7.0 / 22.0) < 1e-12


def test_query_scopes_parent_docs_before_explode(eng):
    rows = _run(eng, {"query": {"term": {"text": "y"}}, "aggs": {
        "n": {"nested": {"path": "items"},
              "aggs": {"c": {"value_count": {"field": "items.qty"}}}}}})
    assert rows[0]["c"] == 0   # docs 3/4 match, neither has elements


def test_composes_under_sampler(eng):
    # sampler keeps the best-scoring doc (5, score 2) → its 3 elements
    rows = _run(eng, {"query": {"term": {"text": "x"}}, "aggs": {
        "sm": {"sampler": {"shard_size": 1}, "aggs": {
            "n": {"nested": {"path": "items"}, "aggs": {
                "c": {"value_count": {"field": "items.tag"}}}}}}}})
    assert rows[0]["c"] == 3


@pytest.mark.parametrize("aggs, msg", [
    ({"n": {"nested": {"path": "text"}}}, "array<struct>"),
    ({"n": {"nested": {"path": "items.tag"}}}, "top-level array"),
    ({"n": {"nested": {}}}, "'path'"),
    ({"n": {"nested": {"path": "items"},
            "aggs": {"m": {"nested": {"path": "items"}}}}},
     "no nested-in-nested"),
])
def test_typed_errors(eng, aggs, msg):
    with pytest.raises(DslError, match=msg):
        _run(eng, {"query": {"match_all": {}}, "aggs": aggs})


def test_reverse_nested_counts_parents(eng):
    rows = _run(eng, {"query": {"match_all": {}}, "aggs": {
        "n": {"nested": {"path": "items"}, "aggs": {
            "by": {"terms": {"field": "items.tag"}, "aggs": {
                "parents": {"reverse_nested": {}}}}}}}})
    by = {r["key"]: r for r in rows}
    # tag b: elements in docs 1 and 5 → 2 parents (3 elements)
    assert by["b"]["doc_count"] == 3
    assert by["b"]["parents_doc_count"] == 2
    assert by["a"]["parents_doc_count"] == 2


def test_reverse_nested_typed_errors(eng):
    with pytest.raises(DslError, match="inside a nested"):
        _run(eng, {"query": {"match_all": {}},
                   "aggs": {"p": {"reverse_nested": {}}}})
    with pytest.raises(DslError, match="doc_count only"):
        _run(eng, {"query": {"match_all": {}}, "aggs": {
            "n": {"nested": {"path": "items"}, "aggs": {
                "p": {"reverse_nested": {"path": "x"}}}}}})
