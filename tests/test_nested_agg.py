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
    with pytest.raises(DslError, match="document root"):
        _run(eng, {"query": {"match_all": {}}, "aggs": {
            "n": {"nested": {"path": "items"}, "aggs": {
                "p": {"reverse_nested": {"path": "x"}}}}}})


# -- reverse_nested parent-scope sub-aggs (r13) ----------------------------


def test_reverse_nested_parent_scope_metrics(eng):
    # tag b: elements in docs 1 (q 3) and 5 (q 2, 4) → parents {1, 5};
    # parent-scope metrics aggregate each parent ONCE (doc 5 holds two
    # b elements but contributes one id value)
    rows = _run(eng, {"query": {"match_all": {}}, "aggs": {
        "n": {"nested": {"path": "items"}, "aggs": {
            "by": {"terms": {"field": "items.tag"}, "aggs": {
                "back": {"reverse_nested": {}, "aggs": {
                    "avg_id": {"avg": {"field": "id"}},
                    "sum_id": {"sum": {"field": "id"}},
                    "n_id": {"value_count": {"field": "id"}},
                    "c_txt": {"cardinality": {"field": "text"}}}}}}}}}})
    by = {r["key"]: r for r in rows}
    assert by["b"]["back_doc_count"] == 2
    assert by["b"]["back_avg_id"] == 3.0      # (1 + 5) / 2
    assert by["b"]["back_sum_id"] == 6
    assert by["b"]["back_n_id"] == 2
    assert by["b"]["back_c_txt"] == 2         # "x", "x x"
    assert by["a"]["back_avg_id"] == 1.5      # parents {1, 2}
    assert by["c"]["back_doc_count"] == 1
    assert by["c"]["back_sum_id"] == 5


def test_reverse_nested_subs_directly_under_nested(eng):
    # metrics-only shape: one global bucket over all parents holding
    # >=1 element — docs {1, 2, 5}
    rows = _run(eng, {"query": {"match_all": {}}, "aggs": {
        "n": {"nested": {"path": "items"}, "aggs": {
            "back": {"reverse_nested": {}, "aggs": {
                "s": {"sum": {"field": "id"}}}}}}}})
    assert rows[0]["back_doc_count"] == 3
    assert rows[0]["back_s"] == 8


def test_reverse_nested_subs_beside_element_metrics(eng):
    # element-scope and parent-scope metrics compose in one bucket
    rows = _run(eng, {"query": {"match_all": {}}, "aggs": {
        "n": {"nested": {"path": "items"}, "aggs": {
            "by": {"terms": {"field": "items.tag"}, "aggs": {
                "q": {"sum": {"field": "items.qty"}},
                "back": {"reverse_nested": {}, "aggs": {
                    "m": {"max": {"field": "id"}}}}}}}}}})
    by = {r["key"]: r for r in rows}
    assert by["b"]["q"] == 9.0 and by["b"]["back_m"] == 5
    assert by["a"]["q"] == 6.0 and by["a"]["back_m"] == 2


def test_reverse_nested_sub_typed_errors(eng):
    with pytest.raises(DslError, match="is not supported"):
        _run(eng, {"query": {"match_all": {}}, "aggs": {
            "n": {"nested": {"path": "items"}, "aggs": {
                "by": {"terms": {"field": "items.tag"}, "aggs": {
                    "back": {"reverse_nested": {}, "aggs": {
                        "p": {"percentiles": {"field": "id"}}}}}}}}}})
    with pytest.raises(DslError, match="precision_threshold"):
        _run(eng, {"query": {"match_all": {}}, "aggs": {
            "n": {"nested": {"path": "items"}, "aggs": {
                "back": {"reverse_nested": {}, "aggs": {
                    "c": {"cardinality": {
                        "field": "id",
                        "precision_threshold": 100}}}}}}}})
    with pytest.raises(DslError, match="non-empty object"):
        _run(eng, {"query": {"match_all": {}}, "aggs": {
            "n": {"nested": {"path": "items"}, "aggs": {
                "back": {"reverse_nested": {}, "aggs": {}}}}}})
