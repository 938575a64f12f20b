"""ES ``match`` ``operator``/``minimum_should_match`` and
``multi_match`` ``type``/``tie_breaker``/``operator`` (r9). Previously
these parameters were silently dropped — the match set changed with no
signal; now they execute (and/msm/best_fields) or typed-reject. The
reference forwards query bodies verbatim to ES
(ref ElasticIndex.java:663-667), so the ES contracts are the parity
targets."""

import pytest

from cassandra_es_index_spark.search.engine import SearchEngine, TableSpec
from cassandra_es_index_spark.search.es_dsl import DslError

ROWS = [
    (1, "a b", "x"),
    (2, "a", "a b"),
    (3, "b", "y"),
    (4, "a b c", "z"),
    (5, "a a b", "w"),   # tf(a)=2 for scoring checks
]


@pytest.fixture(scope="module")
def eng(spark):
    e = SearchEngine(spark)
    docs = spark.createDataFrame(ROWS, "id int, text string, title string")
    e.register(docs, TableSpec("mp", ["id"]))
    return e


def _rows(eng, q):
    out = eng.search("mp", "#options:load-rows=false#" + q)
    return {r["id"]: r["_score"] for r in out.collect()}


def test_match_operator_and(eng):
    got = _rows(eng, '{"query":{"match":{"text":'
                     '{"query":"a b","operator":"and"}}}}')
    assert sorted(got) == [1, 4, 5]
    assert got[5] == 3   # Σ tf: a×2 + b×1


def test_match_msm_integer_and_percent(eng):
    q = ('{"query":{"match":{"text":{"query":"a b c",'
         '"minimum_should_match":2}}}}')
    got = _rows(eng, q)
    assert sorted(got) == [1, 4, 5]
    assert got[4] == 3 and got[5] == 3   # Σ matched tf (covering score)
    pct = _rows(eng, '{"query":{"match":{"text":{"query":"a b c",'
                     '"minimum_should_match":"67%"}}}}')
    assert sorted(pct) == [1, 4, 5]      # floor(3 × 67 / 100) = 2


def test_match_msm_above_clause_count_matches_nothing(eng):
    assert _rows(eng, '{"query":{"match":{"text":{"query":"a b",'
                      '"minimum_should_match":5}}}}') == {}


def test_match_operator_or_default_unchanged(eng):
    got = _rows(eng, '{"query":{"match":{"text":{"query":"a b"}}}}')
    assert sorted(got) == [1, 2, 3, 4, 5]


def test_multi_match_operator_and(eng):
    got = _rows(eng, '{"query":{"multi_match":{"query":"a b",'
                     '"fields":["text","title"],"operator":"and"}}}')
    assert sorted(got) == [1, 2, 4, 5]   # title "a b" carries doc 2


def test_multi_match_best_fields_is_dis_max(eng):
    # doc 2 matches 'a' in BOTH fields: most_fields sums (2),
    # best_fields takes the max (1)
    most = _rows(eng, '{"query":{"multi_match":{"query":"a",'
                      '"fields":["text","title"]}}}')
    best = _rows(eng, '{"query":{"multi_match":{"query":"a",'
                      '"fields":["text","title"],'
                      '"type":"best_fields"}}}')
    assert most[2] == 2 and best[2] == 1
    assert most[1] == best[1] == 1


@pytest.mark.parametrize("q, msg", [
    ('{"query":{"match":{"text":{"query":"a",'
     '"zero_terms_query":"all"}}}}', "unsupported parameters"),
    ('{"query":{"match":{"text":{"query":"a b","operator":"and",'
     '"minimum_should_match":2}}}}', "inoperative"),
    ('{"query":{"match":{"text":{"query":"a b","operator":"xor"}}}}',
     "or/and"),
    ('{"query":{"match":{"text":{"query":"a b",'
     '"minimum_should_match":"150%"}}}}', r"\(0, 100\]"),
    ('{"query":{"match":{"text":{"query":"a b",'
     '"minimum_should_match":0}}}}', "positive"),
    ('{"query":{"match":{"text":{"query":"a b","fuzziness":1,'
     '"minimum_should_match":2}}}}', "fuzziness"),
    ('{"query":{"multi_match":{"query":"a","fields":["text"],'
     '"type":"cross_fields"}}}', "most_fields/best_fields"),
    ('{"query":{"multi_match":{"query":"a","fields":["text"],'
     '"tie_breaker":0.5}}}', "best_fields only"),
    ('{"query":{"multi_match":{"query":"a","fields":["text"],'
     '"type":"best_fields","tie_breaker":1.5}}}', r"\[0, 1\]"),
    ('{"query":{"multi_match":{"query":"a","fields":["text"],'
     '"analyzer":"simple"}}}', "unsupported parameters"),
])
def test_typed_errors(eng, q, msg):
    with pytest.raises(DslError, match=msg):
        eng.search("mp", q).collect()
