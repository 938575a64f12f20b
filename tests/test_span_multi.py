"""ES ``span_multi`` (r9): a multi-term query (prefix/wildcard/regexp/
fuzzy) in a span position — Lucene SpanMultiTermQueryWrapper. The
pattern expands against the term dictionary pre-compile
(``_expand_data_nodes``) into the equivalent concrete span_or; the
reference forwards span queries verbatim to ES, so the Lucene span
contracts are the parity targets."""

import pytest

from cassandra_es_index_spark.search.ast import SpanOr, TermPattern
from cassandra_es_index_spark.search.compile import Compiler, CompileError
from cassandra_es_index_spark.search.engine import SearchEngine, TableSpec
from cassandra_es_index_spark.search.es_dsl import DslError

ROWS = [
    (1, "query quest apple"),
    (2, "quest zebra"),
    (3, "apple banana"),
    (4, "quick quack"),
]


@pytest.fixture(scope="module")
def eng(spark):
    e = SearchEngine(spark)
    docs = spark.createDataFrame(ROWS, "id int, text string")
    e.register(docs, TableSpec("sm", ["id"]))
    return e


def _rows(eng, q, table="sm"):
    out = eng.search(table, "#options:load-rows=false#" + q)
    return {r["id"]: r["_score"] for r in out.collect()}


def _sm(kind, value, extra=""):
    return ('{"query":{"span_multi":{"match":{"%s":{"text":'
            '{"value":"%s"%s}}}}}}' % (kind, value, extra))


def test_standalone_prefix_counts_positions(eng):
    got = _rows(eng, _sm("prefix", "qu"))
    assert got == {1: 2, 2: 1, 4: 2}   # Σ matching positions


def test_wildcard_regexp_fuzzy_patterns(eng):
    assert _rows(eng, _sm("wildcard", "qu?ck")) == {4: 2}
    assert _rows(eng, _sm("regexp", "qu(ery|ack)")) == {1: 1, 4: 1}
    assert _rows(eng, _sm("fuzzy", "quast", ',"fuzziness":1')) \
        == {1: 1, 2: 1}   # quest within 1 edit


def test_fuzzy_pattern_transpositions_and_prefix(eng):
    # 'uqest' is 'quest' with q-u swapped: DL 1, classic lev 2 — the
    # shared fuzzy_token_cond drives the expansion (r11)
    assert _rows(eng, _sm("fuzzy", "uqest", ',"fuzziness":1')) == {}
    assert _rows(eng, _sm("fuzzy", "uqest",
                          ',"fuzziness":1,"transpositions":true')) \
        == {1: 1, 2: 1}
    # prefix guard: juest~1 matches quest (one substitution), but
    # prefix_length 1 requires a literal 'j' start — nothing survives
    assert _rows(eng, _sm("fuzzy", "juest", ',"fuzziness":1')) \
        == {1: 1, 2: 1}
    assert _rows(eng, _sm("fuzzy", "juest",
                          ',"fuzziness":1,"prefix_length":1')) == {}
    # unknown pattern params typed-reject (previously silently dropped)
    with pytest.raises(DslError, match="unsupported parameters"):
        _rows(eng, _sm("prefix", "qu", ',"rewrite":"top_terms_10"'))
    with pytest.raises(DslError, match="boolean"):
        _rows(eng, _sm("fuzzy", "quast", ',"transpositions":"y"'))


def test_inside_span_first_and_span_not(eng):
    first = _rows(eng, '{"query":{"span_first":{"match":'
                       '{"span_multi":{"match":{"prefix":{"text":'
                       '{"value":"qu"}}}}},"end":1}}}')
    assert first == {1: 1, 2: 1, 4: 1}   # position 0 only
    nq = ('{"query":{"span_not":{"include":{"span_multi":{"match":'
          '{"prefix":{"text":{"value":"qu"}}}}},"exclude":'
          '{"span_term":{"text":"zebra"}},"dist":1}}}')
    assert _rows(eng, nq) == {1: 2, 4: 2}   # doc 2's quest is adjacent


def test_empty_expansion_matches_nothing(eng):
    assert _rows(eng, _sm("prefix", "zzzz")) == {}


def test_index_served_parity(eng, spark):
    e2 = SearchEngine(spark)
    docs = spark.createDataFrame(ROWS, "id int, text string")
    e2.register(docs, TableSpec("sm2", ["id"]))
    e2.build_postings_index("sm2", "text", materialize=True)
    e2.build_span_index("sm2", "text")
    for q in (_sm("prefix", "qu"), _sm("wildcard", "qu?ck")):
        assert _rows(eng, q) == _rows(e2, q, "sm2")


def test_raw_pattern_compile_is_typed(eng, spark):
    docs = spark.createDataFrame(ROWS, "id int, text string")
    with pytest.raises(CompileError, match="data-driven"):
        Compiler(docs, "text").compile(
            SpanOr("text", (TermPattern("prefix", "qu"),)))


@pytest.mark.parametrize("q, msg", [
    ('{"query":{"span_multi":{"match":{"range":{"id":{"gte":1}}}}}}',
     "prefix/wildcard/regexp/fuzzy"),
    ('{"query":{"span_multi":{}}}', "span_multi needs"),
    ('{"query":{"span_multi":{"match":{"regexp":{"text":'
     '{"value":"(unclosed"}}}}}}', ".*"),
])
def test_typed_errors(eng, q, msg):
    with pytest.raises((DslError, CompileError), match=msg):
        eng.search("sm", q).collect()
