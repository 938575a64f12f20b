"""nested ``inner_hits`` (round-8, VERDICT "What's missing" #3): a
top-level nested query may request the matching array elements per
parent hit — flattened as ``<path>_<field>`` columns with an
``_inner_rank`` (element child score desc, struct-order ties), the
collapse-inner_hits surface shape. Element ranking is per-row array
math (sort_array over (−score, element) structs) — no window, no extra
shuffle; hit selection and paging still count PARENTS.
"""

import pytest
from pyspark.sql import functions as F

from cassandra_es_index_spark.search.engine import SearchEngine, TableSpec
from cassandra_es_index_spark.search.es_dsl import DslError, parse_request


@pytest.fixture(scope="module")
def ni_engine(spark):
    eng = SearchEngine(spark)
    df = spark.createDataFrame(
        [("a", [("r", 50.0), ("r", 10.0), ("x", 99.0), ("r", 60.0)]),
         ("b", [("r", 10.0)]),
         ("c", [("x", 50.0)]),
         ("d", None)],
        "id string, items array<struct<rf string, qty double>>")
    eng.register(df, TableSpec("ni_docs", ["id"]))
    return eng


Q = ('{"query":{"nested":{"path":"items","query":{"bool":{"must":['
     '{"term":{"items.rf":"r"}}],"should":['
     '{"range":{"items.qty":{"gte":40}}}]}},"score_mode":"sum",'
     '"inner_hits":{"size":2}}}}')


def _rows(eng, q, **kw):
    out = eng.search("ni_docs", "#options:load-rows=false#" + q,
                     default_field="id", **kw)
    return [r.asDict() for r in out.collect()], out


def test_inner_hits_flatten_and_rank(ni_engine):
    rows, out = _rows(ni_engine, Q)
    assert set(out.columns) == {"id", "_score", "_inner_rank",
                                "items_rf", "items_qty"}
    by_parent = {}
    for r in rows:
        by_parent.setdefault(r["id"], []).append(r)
    # a: matching elements (r,50)=2, (r,10)=1, (r,60)=2 → parent score 5;
    # top-2 by element score desc, struct ties (rf,qty asc) → 50 then 60
    a = sorted(by_parent["a"], key=lambda r: r["_inner_rank"])
    assert [r["_score"] for r in a] == [5, 5]
    assert [(r["_inner_rank"], r["items_qty"]) for r in a] == \
        [(1, 50.0), (2, 60.0)]
    # b: one matching element, score 1
    assert by_parent["b"][0]["_inner_rank"] == 1
    assert by_parent["b"][0]["items_qty"] == 10.0
    assert by_parent["b"][0]["_score"] == 1
    # c (no rf=r element) and d (null array) do not match at all
    assert set(by_parent) == {"a", "b"}


def test_inner_hits_size_caps_elements_not_parents(ni_engine):
    rows, _ = _rows(ni_engine, Q.replace('"size":2', '"size":1'))
    assert sorted(r["id"] for r in rows) == ["a", "b"]   # parents kept
    assert all(r["_inner_rank"] == 1 for r in rows)


def test_inner_hits_limit_counts_parents(ni_engine):
    rows, _ = _rows(ni_engine, Q, limit=1)
    # one parent (a, score 5) → 2 element rows
    assert {r["id"] for r in rows} == {"a"} and len(rows) == 2


def test_inner_hits_default_size_three(ni_engine):
    q = Q.replace(',"inner_hits":{"size":2}', ',"inner_hits":{}')
    rows, _ = _rows(ni_engine, q)
    a = [r for r in rows if r["id"] == "a"]
    assert len(a) == 3   # ES default size 3


def test_inner_hits_typed_errors():
    with pytest.raises(DslError, match="TOP-LEVEL"):
        parse_request(
            '{"query":{"bool":{"must":[{"nested":{"path":"p",'
            '"query":{"match_all":{}},"inner_hits":{}}}]}}}')
    with pytest.raises(DslError, match="positive integer"):
        parse_request('{"query":{"nested":{"path":"p","query":'
                      '{"match_all":{}},"inner_hits":{"size":0}}}}')
    # r13: custom sort parses (path-dotted element field required)
    with pytest.raises(DslError, match="under the nested path"):
        parse_request('{"query":{"nested":{"path":"p","query":'
                      '{"match_all":{}},"inner_hits":{"sort":["x"]}}}}')
    with pytest.raises(DslError, match="exactly one plain field"):
        parse_request('{"query":{"nested":{"path":"p","query":'
                      '{"match_all":{}},"inner_hits":'
                      '{"sort":[{"p.a":"asc"},{"p.b":"asc"}]}}}}')
    req = parse_request('{"query":{"nested":{"path":"p","query":'
                        '{"match_all":{}},"inner_hits":'
                        '{"sort":[{"p.qty":"desc"}]}}}}')
    assert req.nested_inner_sort == ("qty", False)


def test_inner_hits_custom_element_sort(ni_engine):
    # r13: elements rank by the element field, not the child score
    q = Q.replace('"inner_hits":{"size":2}',
                  '"inner_hits":{"size":2,"sort":[{"items.qty":"desc"}]}')
    rows, _ = _rows(ni_engine, q)
    a = sorted((r["_inner_rank"], r["items_qty"])
               for r in rows if r["id"] == "a")
    assert [q_ for _, q_ in a] == sorted(
        [q_ for _, q_ in a], reverse=True)
    assert [rk for rk, _ in a] == list(range(1, len(a) + 1))
    # unknown element field is typed
    bad = Q.replace('"inner_hits":{"size":2}',
                    '"inner_hits":{"size":2,"sort":[{"items.zz":"desc"}]}')
    with pytest.raises(DslError, match="not an element field"):
        _rows(ni_engine, bad)


def test_nested_should_scores_elements(ni_engine):
    # the pre-r8 latent bug: Should/Or inside a nested element compiler
    # crashed (unwrapped staticmethod _gated); pin the fixed behavior
    q = ('{"query":{"nested":{"path":"items","query":{"bool":{"should":['
         '{"term":{"items.rf":"r"}},{"term":{"items.rf":"x"}}]}},'
         '"score_mode":"sum"}}}')
    rows, _ = _rows(ni_engine, q)
    got = {r["id"]: r["_score"] for r in rows}
    assert got == {"a": 4, "b": 1, "c": 1}
