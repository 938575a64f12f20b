"""ES ``runtime_mappings`` (r9): search-time computed fields over the
painless arithmetic subset — added as computed columns before compile so
query/aggs/sort/script_fields resolve them like stored fields. The
reference forwards request bodies verbatim to ES, so the ES runtime-
field contract is the parity target (engine subset: double/long/boolean
types, no stored-column shadowing)."""

import json

import pytest

from cassandra_es_index_spark.search.engine import SearchEngine, TableSpec
from cassandra_es_index_spark.search.es_dsl import DslError

RM = ('"runtime_mappings":{"total":{"type":"double","script":'
      '{"source":"emit(doc[\'price\'].value * doc[\'qty\'].value)"}}}')


@pytest.fixture(scope="module")
def eng(spark):
    e = SearchEngine(spark)
    docs = spark.createDataFrame(
        [(1, 10.0, 2.0, "a"), (2, 30.0, 3.0, "b"), (3, 50.0, 0.0, "a"),
         (4, None, 4.0, "b")],
        "id int, price double, qty double, g string")
    e.register(docs, TableSpec("rt", ["id"]))
    return e


def _ids(eng, q):
    out = eng.search("rt", "#options:load-rows=false#" + q)
    return [r["id"] for r in out.collect()]


def test_query_on_runtime_field(eng):
    # total: 20, 90, 0, null — null arithmetic matches nothing
    q = '{%s,"query":{"range":{"total":{"gte":50}}}}' % RM
    assert _ids(eng, q) == [2]


def test_sort_and_search_after_on_runtime_field(eng):
    q = '{%s,"query":{"match_all":{}},"sort":[{"total":"desc"}]}' % RM
    assert _ids(eng, q) == [2, 1, 3, 4]   # null trails (missing _last)
    q2 = ('{%s,"query":{"match_all":{}},"sort":[{"total":"desc"}],'
          '"search_after":[90.0,2]}' % RM)
    assert _ids(eng, q2) == [1, 3, 4]


def test_aggs_on_runtime_field(eng):
    q = ('{%s,"query":{"match_all":{}},"aggs":{'
         '"by":{"terms":{"field":"g"},'
         '"aggs":{"s":{"sum":{"field":"total"}}}}}}' % RM)
    rows = eng.search_aggs("rt", q).collect()
    by = {r["key"]: r["s"] for r in rows}
    assert by == {"a": 20.0, "b": 90.0}   # null total sums out


def test_boolean_and_long_types(eng):
    q = ('{"runtime_mappings":{'
         '"cheap":{"type":"boolean","script":'
         '{"source":"doc[\'price\'].value < 20"}},'
         '"dbl":{"type":"long","script":'
         '{"source":"doc[\'id\'].value * 2"}}},'
         '"query":{"term":{"cheap":"true"}},"sort":[{"dbl":"asc"}]}')
    assert _ids(eng, q) == [1]


def test_runtime_feeds_script_fields(eng):
    # script_fields read response columns: runtime fields ride the
    # load-source result (PK-only/row-load results don't carry them —
    # the existing script_fields column contract applies)
    q = ('{%s,"query":{"range":{"total":{"gte":50}}},'
         '"script_fields":{"half":{"script":'
         '{"source":"doc[\'total\'].value / 2"}}}}' % RM)
    rows = eng.search("rt", "#options:load-source=true#" + q).collect()
    assert rows[0]["half"] == 45.0
    with pytest.raises(DslError, match="not in the result"):
        eng.search("rt", "#options:load-rows=false#" + q).collect()


def test_zero_divisor_is_null_not_error(eng):
    q = ('{"runtime_mappings":{"ratio":{"type":"double","script":'
         '{"source":"doc[\'price\'].value / doc[\'qty\'].value"}}},'
         '"query":{"exists":{"field":"ratio"}}}')
    # qty 0 (id 3) and null price (id 4) → null ratio, dropped by exists
    assert sorted(_ids(eng, q)) == [1, 2]


@pytest.mark.parametrize("body, msg", [
    ('{"runtime_mappings":{"price":{"type":"double","script":'
     '{"source":"1+1"}}},"query":{"match_all":{}}}', "shadows"),
    ('{"runtime_mappings":{"k":{"type":"keyword","script":'
     '{"source":"1"}}},"query":{"match_all":{}}}', "type must be"),
    ('{"runtime_mappings":{"k":{"type":"double"}},'
     '"query":{"match_all":{}}}', "'script'"),
    ('{"runtime_mappings":{},"query":{"match_all":{}}}', "non-empty"),
    ('{"runtime_mappings":{"k":{"type":"double","script":'
     '{"source":"doc[\'p\'].value + \'x\'"}}},"query":{"match_all":{}}}',
     "arithmetic"),
])
def test_typed_errors(eng, body, msg):
    with pytest.raises(DslError, match=msg):
        eng.search("rt", body).collect()


def test_unknown_ref_inside_runtime_script_is_typed(eng):
    q = ('{"runtime_mappings":{"k":{"type":"double","script":'
         '{"source":"doc[\'nope\'].value + 1"}}},'
         '"query":{"range":{"k":{"gte":0}}}}')
    from cassandra_es_index_spark.search.compile import CompileError
    with pytest.raises((DslError, CompileError)):
        eng.search("rt", q).collect()
