"""ES ``intervals`` query, ``match`` rule (round 7): multi-term
positional matching with ordered/unordered + max_gaps, evaluated as
higher-order-function position math on the scan plan and as one token
filter + per-doc position-list aggregation on the token-position index
(``build_span_index``) — both through the SAME width/order predicate
(``positional.interval_match_pred``), so the plans agree bit-exactly.

Width contract (Lucene minimal intervals): a tuple qualifies when
``max(pos) − min(pos) + 1 − n ≤ max_gaps`` (−1 lifts the bound);
``ordered`` additionally requires query order, checked via the greedy
earliest-next chain (minimal end for a fixed start → exact).
"""

import json

import pytest

from cassandra_es_index_spark.search.engine import SearchEngine, TableSpec
from cassandra_es_index_spark.search.es_dsl import DslError, parse_request

DOCS = [
    ("a", "quick brown fox jumps"),     # adjacent, in order
    ("b", "quick fox over brown"),      # quick..brown gap 2, fox between
    ("c", "quick x y z brown fox"),     # quick..brown gap 3
    ("d", "brown quick"),               # reverse order, adjacent
    ("e", "nothing here"),
    ("f", "quick quick brown"),         # repeated first term
]


@pytest.fixture(scope="module")
def iv_engine(spark):
    eng = SearchEngine(spark)
    df = spark.createDataFrame(DOCS, "id string, text string")
    eng.register(df, TableSpec("iv_docs", ["id"]))
    return eng


def _q(query, **params):
    spec = {"query": query, **params}
    return json.dumps({"query": {"intervals": {"text": {"match": spec}}}})


CASES = [
    # (params, expected ids)
    (dict(ordered=True, max_gaps=0), {"a", "f"}),
    (dict(ordered=True, max_gaps=1), {"a", "f"}),
    (dict(ordered=True, max_gaps=2), {"a", "b", "f"}),
    (dict(ordered=True), {"a", "b", "c", "f"}),      # unbounded
    (dict(max_gaps=0), {"a", "d", "f"}),             # unordered adjacent
    (dict(max_gaps=2), {"a", "b", "d", "f"}),
    (dict(), {"a", "b", "c", "d", "f"}),             # both terms present
]


@pytest.mark.parametrize("params,want", CASES,
                         ids=[str(p) for p, _ in CASES])
def test_intervals_scan_semantics(iv_engine, params, want):
    got = {r["id"] for r in
           iv_engine.search("iv_docs", _q("quick brown", **params))
           .collect()}
    assert got == want


def test_intervals_three_terms_ordered(iv_engine):
    q = _q("quick brown fox", ordered=True, max_gaps=0)
    got = {r["id"] for r in iv_engine.search("iv_docs", q).collect()}
    assert got == {"a"}
    # unordered window: b has quick(0) fox(1) brown(3) → width 1 ≤ 1
    q2 = _q("quick brown fox", max_gaps=1)
    got2 = {r["id"] for r in iv_engine.search("iv_docs", q2).collect()}
    assert got2 == {"a", "b"}


def test_intervals_empty_query_matches_none(iv_engine):
    assert iv_engine.search("iv_docs", _q("")).count() == 0


def test_intervals_validation():
    with pytest.raises(DslError, match="rule"):
        parse_request({"query": {"intervals": {"text": {
            "all_of": {"intervals": []}}}}})
    with pytest.raises(DslError, match="max_gaps"):
        parse_request({"query": {"intervals": {"text": {
            "match": {"query": "a b", "max_gaps": -2}}}}})
    with pytest.raises(DslError, match="ordered"):
        parse_request({"query": {"intervals": {"text": {
            "match": {"query": "a b", "ordered": "yes"}}}}})


@pytest.fixture(scope="module")
def iv_indexed(spark):
    eng = SearchEngine(spark)
    df = spark.createDataFrame(DOCS, "id string, text string")
    eng.register(df, TableSpec("iv_idx", ["id"]))
    eng.build_span_index("iv_idx", "text", materialize=True)
    return eng


@pytest.mark.parametrize("params,want", CASES,
                         ids=[str(p) for p, _ in CASES])
def test_intervals_index_served_matches_scan(iv_indexed, params, want):
    out = iv_indexed.search("iv_idx",
                            "#options:load-rows=false#"
                            + _q("quick brown", **params))
    assert {r["id"] for r in out.collect()} == want


def test_intervals_served_plan_is_scan_free(iv_indexed):
    out = iv_indexed.search(
        "iv_idx", "#options:load-rows=false#"
        + _q("quick brown fox", ordered=True, max_gaps=1))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "sequence(0" not in plan       # no scan-path re-tokenization
    assert "regexp_extract_all" not in plan
    assert "InMemoryTableScan" in plan    # hits come from the index


def test_intervals_composes_in_bool(iv_engine):
    q = json.dumps({"query": {"bool": {
        "must": [{"intervals": {"text": {"match":
                 {"query": "quick brown", "ordered": True}}}}],
        "must_not": [{"term": {"text": "fox"}}]}}})
    got = {r["id"] for r in iv_engine.search("iv_docs", q).collect()}
    assert got == {"f"}


# ------------------------------------------- any_of / all_of rules (r9)

def _ids2(eng, q):
    out = eng.search("iv", "#options:load-rows=false#" + q)
    return sorted(r["id"] for r in out.collect())


@pytest.fixture(scope="module")
def iv_eng(spark):
    from cassandra_es_index_spark.search.engine import (
        SearchEngine, TableSpec,
    )
    e = SearchEngine(spark)
    docs = spark.createDataFrame(
        [(1, "red fox jumps"), (2, "red dog"), (3, "blue fox"),
         (4, "cat")], "id int, text string")
    e.register(docs, TableSpec("iv", ["id"]))
    return e


def test_intervals_any_of(iv_eng):
    q = ('{"query":{"intervals":{"text":{"any_of":{"intervals":['
         '{"match":{"query":"red dog","max_gaps":0,"ordered":true}},'
         '{"match":{"query":"blue"}}]}}}}}')
    assert _ids2(iv_eng, q) == [2, 3]
    # combined trees keep the flat-1 intervals score
    out = iv_eng.search("iv", "#options:load-rows=false#" + q).collect()
    assert all(r["_score"] == 1 for r in out)


def test_intervals_all_of_unconstrained(iv_eng):
    q = ('{"query":{"intervals":{"text":{"all_of":{"intervals":['
         '{"match":{"query":"red"}},{"match":{"query":"fox"}}]}}}}}')
    assert _ids2(iv_eng, q) == [1]


def test_intervals_nested_combiners(iv_eng):
    q = ('{"query":{"intervals":{"text":{"all_of":{"intervals":['
         '{"any_of":{"intervals":[{"match":{"query":"red"}},'
         '{"match":{"query":"blue"}}]}},'
         '{"match":{"query":"fox"}}]}}}}}')
    assert _ids2(iv_eng, q) == [1, 3]


@pytest.mark.parametrize("q, msg", [
    ('{"query":{"intervals":{"text":{"all_of":{"intervals":'
     '[{"match":{"query":"a"}}],"ordered":true}}}}}',
     "cross-source interval algebra"),
    ('{"query":{"intervals":{"text":{"regexp":{"pattern":"re.*"}}}}}',
     "match, any_of, all_of"),
    ('{"query":{"intervals":{"text":{"any_of":{}}}}}',
     "any_of needs"),
    ('{"query":{"intervals":{"text":{"prefix":{"prefix":"re",'
     '"use_field":"other"}}}}}', "unsupported parameters"),
    ('{"query":{"intervals":{"text":{"wildcard":{"wc":"r*"}}}}}',
     "unsupported parameters"),
    ('{"query":{"intervals":{"text":{"wildcard":{}}}}}', "needs"),
])
def test_intervals_combiner_typed_errors(iv_eng, q, msg):
    with pytest.raises(DslError, match=msg):
        iv_eng.search("iv", q).collect()


# --------------------------- prefix / wildcard / fuzzy rules (r11)
# fixture: 1="red fox jumps", 2="red dog", 3="blue fox", 4="cat"

def test_intervals_prefix_rule(iv_eng):
    # standalone: any token with the prefix; flat-1 intervals score
    q = '{"query":{"intervals":{"text":{"prefix":{"prefix":"re"}}}}}'
    assert _ids2(iv_eng, q) == [1, 2]
    out = iv_eng.search("iv", "#options:load-rows=false#" + q).collect()
    assert all(r["_score"] == 1 for r in out)


def test_intervals_wildcard_rule(iv_eng):
    q = ('{"query":{"intervals":{"text":'
         '{"wildcard":{"pattern":"*o*"}}}}}')
    assert _ids2(iv_eng, q) == [1, 2, 3]    # fox/dog/fox


def test_intervals_fuzzy_rule(iv_eng):
    # "rad" within 1 edit of "red" — explicit fuzziness 1 and the AUTO
    # default (3-char term → 1 edit) both match; a 2-char term gets 0
    # edits under AUTO (exact only) → no match
    q1 = ('{"query":{"intervals":{"text":'
          '{"fuzzy":{"term":"rad","fuzziness":1}}}}}')
    assert _ids2(iv_eng, q1) == [1, 2]
    assert _ids2(iv_eng, '{"query":{"intervals":{"text":'
                         '{"fuzzy":{"term":"rad"}}}}}') == [1, 2]
    assert _ids2(iv_eng, '{"query":{"intervals":{"text":'
                         '{"fuzzy":{"term":"rd"}}}}}') == []


def test_intervals_multiterm_rule_in_combiners(iv_eng):
    # all_of: a red-prefixed token AND fox somewhere (unconstrained)
    q = ('{"query":{"intervals":{"text":{"all_of":{"intervals":['
         '{"prefix":{"prefix":"re"}},'
         '{"match":{"query":"fox"}}]}}}}}')
    assert _ids2(iv_eng, q) == [1]
    # any_of: blue OR a d-prefixed token
    q2 = ('{"query":{"intervals":{"text":{"any_of":{"intervals":['
          '{"prefix":{"prefix":"d"}},'
          '{"match":{"query":"blue"}}]}}}}}')
    assert _ids2(iv_eng, q2) == [2, 3]
