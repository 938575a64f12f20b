"""Parser unit tests — query shapes from the reference's docs
(README.md:179,404,689,731, doc/examples.txt:24)."""

import pytest

from cassandra_es_index_spark.search import es_dsl, query_string as qs
from cassandra_es_index_spark.search.ast import (
    And, Exists, MatchAll, Not, Or, Phrase, Range, Scoreless, Should, Term,
    Wildcard,
)
from cassandra_es_index_spark.search.options import QueryMetaData


def test_simple_term():
    assert qs.parse("hello") == Term(None, "hello")


def test_field_term():
    assert qs.parse("body:hello") == Term("body", "hello")


def test_wildcard():
    assert qs.parse("body:cassan*") == Wildcard("body", "cassan*")
    assert qs.parse("id:ab?") == Wildcard("id", "ab?")


def test_nested_field_path():
    assert qs.parse("AttributeValues.LastName:ab*") == Wildcard(
        "AttributeValues.LastName", "ab*")


def test_boolean_and():
    assert qs.parse("subject:Hello AND userid:42") == And(
        (Term("subject", "Hello"), Term("userid", "42")))


def test_boolean_or_and_not():
    node = qs.parse("a OR b AND NOT c")
    assert node == Or((Term(None, "a"), And((Term(None, "b"), Not(Term(None, "c"))))))


def test_juxtaposition_is_or():
    assert qs.parse("hello world") == Or((Term(None, "hello"), Term(None, "world")))


def test_parens_and_field_group():
    node = qs.parse("body:(hello OR world)")
    assert node == Or((Term("body", "hello"), Term("body", "world")))


def test_phrase():
    assert qs.parse('body:"hello world"') == Phrase("body", "hello world")


def test_range_inclusive_exclusive():
    assert qs.parse("userid:[10 TO 50]") == Range("userid", "10", "50", True, True)
    assert qs.parse("userid:{10 TO 50}") == Range("userid", "10", "50", False, False)
    assert qs.parse("userid:[10 TO *]") == Range("userid", "10", None, True, True)


def test_comparisons():
    assert qs.parse("userid:>=10") == Range("userid", "10", None, True, True)
    assert qs.parse("userid:>10") == Range("userid", "10", None, False, True)
    assert qs.parse("userid:<50") == Range("userid", None, "50", True, False)


def test_exists_and_match_all():
    assert qs.parse("_exists_:subject") == Exists("subject")
    assert qs.parse("*:*") == MatchAll()


def test_parse_error():
    with pytest.raises(qs.QueryParseError):
        qs.parse("body:(unclosed")
    with pytest.raises(qs.QueryParseError):
        qs.parse("")


# -- ES DSL subset ---------------------------------------------------------


def test_dsl_range_with_size():
    node, size = es_dsl.parse('{"size": 5, "query":{"range":{"userid":{"gte":10,"lte":50}}}}')
    assert node == Range("userid", "10", "50", True, True)
    assert size == 5


def test_dsl_term_and_match():
    node, _ = es_dsl.parse('{"query":{"term":{"lang":"en"}}}')
    assert node == Term("lang", "en")
    node, _ = es_dsl.parse('{"query":{"match":{"text":"hello world"}}}')
    assert node == Or((Term("text", "hello"), Term("text", "world")))


def test_dsl_bool():
    # should alongside must is optional/score-only (ES minimum_should_match=0)
    node, _ = es_dsl.parse(
        '{"query":{"bool":{"must":[{"term":{"lang":"en"}}],'
        '"must_not":{"term":{"source":"web"}},'
        '"should":[{"term":{"a":"1"}},{"term":{"a":"2"}}]}}}')
    assert node == And((
        Term("lang", "en"),
        Should((Term("a", "1"), Term("a", "2"))),
        Not(Term("source", "web")),
    ))


def test_dsl_bool_should_alone_is_required():
    node, _ = es_dsl.parse(
        '{"query":{"bool":{"should":[{"term":{"a":"1"}},{"term":{"a":"2"}}]}}}')
    assert node == Or((Term("a", "1"), Term("a", "2")))


def test_dsl_bool_filter_is_scoreless():
    node, _ = es_dsl.parse(
        '{"query":{"bool":{"must":[{"term":{"lang":"en"}}],'
        '"filter":[{"range":{"n":{"gte":1}}}]}}}')
    assert node == And((
        Term("lang", "en"),
        Scoreless(Range("n", "1", None, include_lo=True, include_hi=True)),
    ))


def test_dsl_query_string_passthrough():
    node, _ = es_dsl.parse('{"query":{"query_string":{"query":"body:cassan*"}}}')
    assert node == Wildcard("body", "cassan*")


def test_dsl_errors():
    with pytest.raises(es_dsl.DslError):
        es_dsl.parse("{not json")
    with pytest.raises(es_dsl.DslError):
        es_dsl.parse('{"query":{"more_like_this":{"fields":["a"]}}}')


# -- #options:# prefix (QueryMetaDataTest.java:26-57) ----------------------


def test_options_false():
    meta = QueryMetaData.parse("#options:load-rows=false#plop=42")
    assert meta.query == "plop=42"
    assert meta.load_rows is False


def test_options_true_with_trailing_hashes():
    meta = QueryMetaData.parse("#options:load-rows=true#plop=42###")
    assert meta.query == "plop=42###"
    assert meta.load_rows is True


def test_options_extra():
    meta = QueryMetaData.parse("#options:load-rows=true,number=42#plop=42###")
    assert meta.query == "plop=42###"
    assert meta.load_rows is True
    assert meta.options["number"] == "42"


def test_options_absent():
    meta = QueryMetaData.parse("Text=42#plop")
    assert meta.query == "Text=42#plop"
    assert meta.load_rows is True
    assert meta.load_source is False


# -- Lucene operator surface: fuzzy / boost / slop / required-prohibited ----
# (the reference forwards query strings verbatim to ES, so the full Lucene
# syntax is its real query surface — ref ElasticIndex.java:663-667)

from cassandra_es_index_spark.search.ast import (  # noqa: E402
    Boost, ConstantScore, Fuzzy,
)


def test_fuzzy_suffix():
    # bare `~` = Lucene AUTO: budget resolves on the query term's length
    assert qs.parse("roam~") == Fuzzy(None, "roam", None)
    assert qs.parse("body:roam~1") == Fuzzy("body", "roam", 1)


def test_fuzzy_auto_budget_resolves_on_term_length():
    from cassandra_es_index_spark.search.ast import fuzzy_edits
    assert fuzzy_edits(Fuzzy(None, "ab", None)) == 0      # < 3 chars
    assert fuzzy_edits(Fuzzy(None, "roam", None)) == 1    # 3–5 chars
    assert fuzzy_edits(Fuzzy(None, "routed", None)) == 2  # 6+ chars
    # AUTO:low,high overrides the ladder
    assert fuzzy_edits(Fuzzy(None, "roam", None,
                             auto_low=5, auto_high=7)) == 0
    # explicit budget wins over AUTO resolution
    assert fuzzy_edits(Fuzzy(None, "ab", 2)) == 2


def test_fuzzy_with_wildcard_rejected():
    with pytest.raises(qs.QueryParseError):
        qs.parse("roa*m~1")


def test_boost_suffixes():
    assert qs.parse("jakarta^4") == Boost(Term(None, "jakarta"), 4.0)
    assert qs.parse('"a b"^2') == Boost(Phrase(None, "a b"), 2.0)
    assert qs.parse("(a OR b)^2") == Boost(
        Or((Term(None, "a"), Term(None, "b"))), 2.0)
    assert qs.parse("roam~1^2") == Boost(Fuzzy(None, "roam", 1), 2.0)


def test_phrase_slop_suffix():
    assert qs.parse('"jakarta apache"~3') == Phrase(None, "jakarta apache", 3)
    assert qs.parse('body:"a b"~2^3') == Boost(Phrase("body", "a b", 2), 3.0)


def test_required_prohibited_operators():
    # +must optional -prohibited: Lucene semantics in a default-OR group
    node = qs.parse("+apache lucene -deprecated")
    assert node == And((
        Term(None, "apache"),
        Should((Term(None, "lucene"),)),
        Not(Term(None, "deprecated"))))
    # juxtaposed prohibit without musts: positives gate, Not excludes
    assert qs.parse("a -b") == And((Term(None, "a"), Not(Term(None, "b"))))
    # explicit OR NOT keeps pure boolean semantics
    assert qs.parse("a OR NOT b") == Or((Term(None, "a"),
                                         Not(Term(None, "b"))))
    # lone +term is just the term
    assert qs.parse("+a") == Term(None, "a")
    # terms containing '+' are literals, not operators
    assert qs.parse("c++") == Term(None, "c++")


def test_dsl_fuzzy_and_constant_score():
    node, _ = es_dsl.parse(
        '{"query":{"fuzzy":{"body":{"value":"roam","fuzziness":1,'
        '"boost":2}}}}')
    assert node == Boost(Fuzzy("body", "roam", 1), 2.0)
    node, _ = es_dsl.parse(
        '{"query":{"constant_score":{"filter":{"term":{"lang":"en"}},'
        '"boost":1.5}}}')
    assert node == ConstantScore(Term("lang", "en"), 1.5)


def test_dsl_match_fuzziness_and_phrase_slop():
    node, _ = es_dsl.parse(
        '{"query":{"match":{"body":{"query":"quick brown",'
        '"fuzziness":"AUTO"}}}}')
    assert node == Or((Fuzzy("body", "quick", None),
                       Fuzzy("body", "brown", None)))
    # AUTO:low,high carries the custom ladder bounds
    node, _ = es_dsl.parse(
        '{"query":{"match":{"body":{"query":"quick",'
        '"fuzziness":"AUTO:4,8"}}}}')
    assert node == Fuzzy("body", "quick", None, auto_low=4, auto_high=8)
    node, _ = es_dsl.parse(
        '{"query":{"match_phrase":{"body":{"query":"quick fox",'
        '"slop":1}}}}')
    assert node == Phrase("body", "quick fox", 1)


def test_dsl_term_boost_param():
    node, _ = es_dsl.parse(
        '{"query":{"term":{"lang":{"value":"en","boost":3}}}}')
    assert node == Boost(Term("lang", "en"), 3.0)


# -------------------- DSL query_string field binding (r11)

def test_dsl_query_string_field_params(spark):
    import json

    from cassandra_es_index_spark.search.engine import (
        SearchEngine, TableSpec,
    )
    eng = SearchEngine(spark)
    df = spark.createDataFrame(
        [(1, "spark rocks", "other"), (2, "other", "spark here"),
         (3, "plain", "words")],
        "id int, title string, body string")
    eng.register(df, TableSpec("qsf", ["id"]))

    def run(q):
        out = eng.search("qsf", "#options:load-rows=false#"
                         + json.dumps(q))
        return {r["id"]: r["_score"] for r in out.collect()}

    # default_field binds the bare leaves
    got = run({"query": {"query_string": {
        "query": "spark AND NOT plain", "default_field": "body"}}})
    assert got == {2: 1}
    # fields form: per-field parse under a DisMax with ^boost
    got = run({"query": {"query_string": {
        "query": "spark", "fields": ["title^3", "body"]}}})
    assert got == {1: 3, 2: 1}
    # explicit field: wins over the binding
    got = run({"query": {"query_string": {
        "query": "title:spark OR spark", "fields": ["body"]}}})
    assert got == {1: 1, 2: 1}

    # default_operator: and (r11) — juxtaposed clauses all required
    got = run({"query": {"query_string": {
        "query": "spark here", "default_operator": "and",
        "default_field": "body"}}})
    assert got == {2: 2}            # doc 1's body lacks 'here'
    # pure explicit-OR group stays the boolean disjunction
    got = run({"query": {"query_string": {
        "query": "plain OR words", "default_operator": "and",
        "default_field": "body"}}})
    assert got == {3: 1}            # body has 'words' ('plain' is title)
    # prohibit still works under the AND default
    got = run({"query": {"query_string": {
        "query": "spark -rocks", "default_operator": "AND",
        "default_field": "title"}}})
    assert got == {}                # doc 1 has rocks; doc 2's title no spark
    # parenthesized OR group under an AND juxtaposition
    got = run({"query": {"query_string": {
        "query": "spark (rocks OR here)", "default_operator": "and",
        "default_field": "body"}}})
    assert got == {2: 2}

    from cassandra_es_index_spark.search.es_dsl import DslError
    import pytest as _p
    for bad, msg in [
        ({"query": "x", "analyzer": "simple"}, "unsupported"),
        ({"query": "x y OR z", "default_operator": "and"},
         "parenthesize"),
        ({"query": "x", "default_operator": "xor"},
         "default_operator"),
        ({"query": "x", "default_field": "a", "fields": ["b"]},
         "not both"),
        ({"query": "x", "tie_breaker": 0.5}, "'fields' form"),
        ({"query": "x", "fields": []}, "non-empty"),
    ]:
        with _p.raises(DslError, match=msg):
            eng.search("qsf", json.dumps(
                {"query": {"query_string": bad}}))
