"""span_or / span_first / span_not (round-8, VERDICT "What's missing"
#2) — completing the span family next to span_near/intervals, over the
single-token span subset (ast.SpanOr/SpanFirst/SpanNot):

- span_or: union of span_term positions; score = matching position
  count (Σ tf, the engine's Or convention)
- span_first: positions p with span END p+1 ≤ end — Lucene
  SpanPositionRangeQuery(match, 0, end)
- span_not: include positions with no exclude position in
  [p − pre, p + post] (dist sets both, ES parity)

Both plans share the survival/count Column math
(positional.span_not_count), so scan and token-position-index serving
are bit-exact; the index plans are one token filter + one per-doc
aggregation — never a corpus re-tokenization.
"""

import pytest

from cassandra_es_index_spark.search.engine import SearchEngine, TableSpec
from cassandra_es_index_spark.search.es_dsl import DslError, parse_request

ROWS = [
    ("a", "spark table spark value"),
    ("b", "slow spark table"),
    ("c", "value spark"),
    ("d", "other words here"),
    ("e", None),
]

Q_OR = ('{"query":{"span_or":{"clauses":[{"span_term":{"text":"spark"}},'
        '{"span_term":{"text":"value"}}]}}}')
Q_FIRST = ('{"query":{"span_first":{"match":{"span_term":'
           '{"text":"spark"}},"end":1}}}')
Q_NOT = ('{"query":{"span_not":{"include":{"span_term":{"text":"spark"}},'
         '"exclude":{"span_term":{"text":"slow"}},"pre":1,"post":0}}}')


@pytest.fixture(scope="module")
def sp_engine(spark):
    eng = SearchEngine(spark)
    eng.register(spark.createDataFrame(ROWS, "id string, text string"),
                 TableSpec("sp_docs", ["id"]))
    return eng


def _rows(eng, q):
    out = eng.search("sp_docs", "#options:load-rows=false#" + q,
                     default_field="text")
    return {r["id"]: r["_score"] for r in out.collect()}, out


def test_span_or_counts_positions(sp_engine):
    got, _ = _rows(sp_engine, Q_OR)
    assert got == {"a": 3, "b": 1, "c": 2}


def test_span_first_end_bound(sp_engine):
    got, _ = _rows(sp_engine, Q_FIRST)
    assert got == {"a": 1}          # only a has spark at position 0
    got2, _ = _rows(sp_engine, Q_FIRST.replace('"end":1', '"end":2'))
    assert got2 == {"a": 1, "b": 1, "c": 1}


def test_span_not_pre_post_buffers(sp_engine):
    got, _ = _rows(sp_engine, Q_NOT)
    # b: spark@1 has slow@0 within pre=1 → rejected entirely
    assert got == {"a": 2, "c": 1}
    loose = Q_NOT.replace('"pre":1', '"pre":0')
    got2, _ = _rows(sp_engine, loose)
    # pre=0,post=0: only exact overlap rejects — b's spark@1 survives
    assert got2 == {"a": 2, "b": 1, "c": 1}


def test_span_or_inside_first_and_not(sp_engine):
    q = ('{"query":{"span_first":{"match":{"span_or":{"clauses":['
         '{"span_term":{"text":"spark"}},{"span_term":{"text":"slow"}},'
         '{"span_or":{"clauses":[{"span_term":{"text":"value"}}]}}]}},'
         '"end":1}}}')
    got, _ = _rows(sp_engine, q)    # first token ∈ {spark, slow, value}
    assert got == {"a": 1, "b": 1, "c": 1}


def test_span_family_index_served_bit_exact(sp_engine):
    queries = [Q_OR, Q_FIRST, Q_NOT]
    scans = [_rows(sp_engine, q)[0] for q in queries]
    sp_engine.build_span_index("sp_docs", "text")
    for q, scan in zip(queries, scans):
        got, out = _rows(sp_engine, q)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "regexp_extract_all" not in plan
        assert got == scan


def test_span_family_composes_in_bool(sp_engine):
    q = ('{"query":{"bool":{"must":[{"span_or":{"clauses":['
         '{"span_term":{"text":"spark"}},{"span_term":{"text":"value"}}'
         ']}}],"must_not":[{"span_first":{"match":{"span_term":'
         '{"text":"value"}},"end":1}}]}}}')
    got, _ = _rows(sp_engine, q)
    # c starts with 'value' → excluded; a/b keep their span_or scores
    assert got == {"a": 3, "b": 1}


@pytest.mark.parametrize("bad,msg", [
    ('{"span_or":{"clauses":[]}}', "span_or needs"),
    ('{"span_or":{"clauses":[{"span_near":{}}]}}', "not supported"),
    ('{"span_first":{"match":{"span_term":{"text":"x"}}}}',
     "span_first needs"),
    ('{"span_first":{"match":{"span_term":{"text":"x"}},"end":-1}}',
     "non-negative"),
    ('{"span_not":{"include":{"span_term":{"text":"x"}},'
     '"exclude":{"span_term":{"text":"y"}},"dist":1,"pre":1}}',
     "dist OR pre/post"),
    ('{"span_not":{"include":{"span_term":{"text":"x"}},'
     '"exclude":{"span_term":{"other":"y"}}}}', "share one field"),
    ('{"span_or":{"clauses":[{"span_term":{"text":"x"}},'
     '{"span_term":{"other":"y"}}]}}', "share one field"),
])
def test_span_family_typed_errors(bad, msg):
    with pytest.raises(DslError, match=msg):
        parse_request('{"query":' + bad + "}")


def test_span_not_dist_sets_both(sp_engine):
    q = ('{"query":{"span_not":{"include":{"span_term":'
         '{"text":"table"}},"exclude":{"span_term":{"text":"slow"}},'
         '"dist":2}}}')
    got, _ = _rows(sp_engine, q)
    # b: table@2, slow@0 within dist 2 → rejected; a: table@1 survives
    assert got == {"a": 1}


# --- span_containing / span_within (r9) --------------------------------
# ROWS reminder: a="spark table spark value", b="slow spark table",
# c="value spark", d="other words here", e=None

Q_CONT = ('{"query":{"span_containing":{"big":{"span_near":{"clauses":['
          '{"span_term":{"text":"spark"}},{"span_term":{"text":"value"}}'
          '],"slop":2,"in_order":true}},'
          '"little":{"span_term":{"text":"table"}}}}}')
Q_WITHIN = Q_CONT.replace("span_containing", "span_within")


def test_span_containing_counts_big_spans(sp_engine):
    # a: spark@0,spark@2,value@3 → ordered pairs slop≤2: (0,3) gap 2 ✓,
    # (2,3) gap 0 ✓ → spans [0,3],[2,3]; table@1 ∈ [0,3] only → 1
    got, _ = _rows(sp_engine, Q_CONT)
    assert got == {"a": 1}


def test_span_within_counts_little_positions(sp_engine):
    # within counts table positions inside a big span: a's table@1 → 1
    got, _ = _rows(sp_engine, Q_WITHIN)
    assert got == {"a": 1}


def test_span_containing_single_token_big_degenerate(sp_engine):
    # single-token big contains only a co-positioned little — matching
    # docs are exactly those where a big token IS a little token
    q = ('{"query":{"span_within":{"big":{"span_or":{"clauses":['
         '{"span_term":{"text":"spark"}},{"span_term":{"text":"slow"}}'
         ']}},"little":{"span_term":{"text":"spark"}}}}}')
    got, _ = _rows(sp_engine, q)
    assert got == {"a": 2, "b": 1, "c": 1}


def test_span_containing_index_served_bit_exact(spark):
    # fresh engine: the module fixture may already carry the span index
    # (an earlier test builds it), which would make the "scan" baseline
    # index-served too
    eng = SearchEngine(spark)
    eng.register(spark.createDataFrame(ROWS, "id string, text string"),
                 TableSpec("sp_docs_c", ["id"]))

    def rows(q):
        out = eng.search("sp_docs_c", "#options:load-rows=false#" + q,
                         default_field="text")
        return {r["id"]: r["_score"] for r in out.collect()}, out

    scans = [rows(q)[0] for q in (Q_CONT, Q_WITHIN)]
    eng.build_span_index("sp_docs_c", "text")
    for q, scan in zip((Q_CONT, Q_WITHIN), scans):
        got, out = rows(q)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "regexp_extract_all" not in plan
        assert got == scan


@pytest.mark.parametrize("bad,msg", [
    ('{"span_containing":{"big":{"span_term":{"text":"x"}}}}',
     "span_containing needs"),
    ('{"span_within":{"little":{"span_term":{"text":"x"}}}}',
     "span_within needs"),
    ('{"span_containing":{"big":{"span_term":{"text":"x"}},'
     '"little":{"span_term":{"other":"y"}}}}', "share one field"),
    ('{"span_containing":{"big":{"span_near":{"clauses":['
     '{"span_term":{"text":"x"}},{"span_term":{"text":"y"}}],'
     '"boost":2.0}},"little":{"span_term":{"text":"z"}}}}',
     "does not take boost"),
    ('{"span_within":{"big":{"span_near":{"clauses":['
     '{"span_term":{"text":"x"}}]}},'
     '"little":{"span_term":{"text":"z"}}}}', "two or more"),
    # the span_near clause cap applies inside the big clause too
    ('{"span_within":{"big":{"span_near":{"clauses":[' +
     ",".join('{"span_term":{"text":"t%d"}}' % i for i in range(9)) +
     ']}},"little":{"span_term":{"text":"z"}}}}', "at most 8"),
])
def test_span_containing_typed_errors(bad, msg):
    with pytest.raises(DslError, match=msg):
        parse_request('{"query":' + bad + "}")


# --- N-ary big clause (r11) --------------------------------------------
# the r9 restriction (big span_near = exactly two span_terms) is lifted:
# big takes the same 2-8-clause union-slot shapes as span_near itself;
# qualifying tuples become [min, max] spans (span_near_tuple_spans, the
# same window rule as span_near's tuple count)

Q_BIG3 = ('{"query":{"span_containing":{"big":{"span_near":{"clauses":['
          '{"span_term":{"text":"spark"}},{"span_term":{"text":"table"}},'
          '{"span_term":{"text":"value"}}],"slop":1,"in_order":true}},'
          '"little":{"span_term":{"text":"spark"}}}}}')
Q_BIG3_W = Q_BIG3.replace("span_containing", "span_within")
Q_BIG_OR = ('{"query":{"span_containing":{"big":{"span_near":{"clauses":['
            '{"span_term":{"text":"spark"}},'
            '{"span_or":{"clauses":[{"span_term":{"text":"table"}},'
            '{"span_term":{"text":"value"}}]}}],'
            '"slop":2,"in_order":true}},'
            '"little":{"span_term":{"text":"value"}}}}}')


def test_span_containing_nary_big(sp_engine):
    # a: slots spark{0,2} table{1} value{3}; ordered tuples with
    # max-min+1-3 <= 1: (0,1,3) only -> big span [0,3]; spark@0,2
    # inside -> containing counts the 1 big span
    got, _ = _rows(sp_engine, Q_BIG3)
    assert got == {"a": 1}
    # within counts spark positions inside a big span: 0 and 2 -> 2
    got, _ = _rows(sp_engine, Q_BIG3_W)
    assert got == {"a": 2}


def test_span_containing_union_slot_big(sp_engine):
    # big = spark ... (table|value): a's pairs (0,1) (0,3) (2,3) ->
    # spans [0,1] [0,3] [2,3]; value@3 in [0,3] and [2,3] -> 2
    got, _ = _rows(sp_engine, Q_BIG_OR)
    assert got == {"a": 2}


def test_span_containing_span_multi_big_slot(sp_engine):
    # span_multi prefix slot inside the big clause (r11 expansion
    # path): spar* adjacent-precedes table -> a [0,1], b [1,2]; the
    # little spark position inside each -> 1
    q = ('{"query":{"span_within":{"big":{"span_near":{"clauses":['
         '{"span_multi":{"match":{"prefix":{"text":"spar"}}}},'
         '{"span_term":{"text":"table"}}],"slop":0,"in_order":true}},'
         '"little":{"span_term":{"text":"spark"}}}}}')
    got, _ = _rows(sp_engine, q)
    assert got == {"a": 1, "b": 1}


def test_span_containing_nary_index_served_bit_exact(spark):
    eng = SearchEngine(spark)
    eng.register(spark.createDataFrame(ROWS, "id string, text string"),
                 TableSpec("sp_docs_n", ["id"]))

    def rows(q):
        out = eng.search("sp_docs_n", "#options:load-rows=false#" + q,
                         default_field="text")
        return {r["id"]: r["_score"] for r in out.collect()}, out

    qs = (Q_BIG3, Q_BIG3_W, Q_BIG_OR)
    scans = [rows(q)[0] for q in qs]
    eng.build_span_index("sp_docs_n", "text")
    for q, scan in zip(qs, scans):
        got, out = rows(q)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "regexp_extract_all" not in plan
        assert got == scan


# --------------------------------------------- r10: N-ary span_near

NEAR_ROWS = [
    (1, "quick brown fox jumps"),
    (2, "quick fox brown"),
    (3, "quick x brown y fox"),
    (4, "brown quick fox"),
    (5, "quick quick brown fox"),
    (6, "nothing here"),
]


@pytest.fixture(scope="module")
def near_engine(spark):
    eng = SearchEngine(spark)
    eng.register(spark.createDataFrame(NEAR_ROWS, "id int, text string"),
                 TableSpec("near_docs", ["id"]))
    return eng


def _near(eng, q, table="near_docs"):
    out = eng.search(table, "#options:load-rows=false#" + q)
    return {r["id"]: r["_score"] for r in out.collect()}


def _q3(slop, in_order):
    import json as _json
    return _json.dumps({"query": {"span_near": {"clauses": [
        {"span_term": {"text": "quick"}},
        {"span_term": {"text": "brown"}},
        {"span_term": {"text": "fox"}}],
        "slop": slop, "in_order": in_order}}})


def test_span_near_three_clauses_ordered(near_engine):
    # hand positions: 1 → q0 b1 f2 (width 0); 5 → q0 q1 b2 f3: tuples
    # (1,2,3) width 0 and (0,2,3) width 1
    assert _near(near_engine, _q3(0, True)) == {1: 1, 5: 1}
    assert _near(near_engine, _q3(2, True)) == {1: 1, 3: 1, 5: 2}


def test_span_near_three_clauses_unordered(near_engine):
    # any arrangement within a 3-token window: docs 1, 2, 4 tight; 5
    # via (1,2,3); 3 needs slop 2
    assert _near(near_engine, _q3(0, False)) == {1: 1, 2: 1, 4: 1, 5: 1}


def test_span_near_span_or_slot(near_engine):
    import json as _json
    q = _json.dumps({"query": {"span_near": {"clauses": [
        {"span_or": {"clauses": [{"span_term": {"text": "quick"}},
                                 {"span_term": {"text": "brown"}}]}},
        {"span_term": {"text": "fox"}}], "slop": 0, "in_order": True}}})
    assert _near(near_engine, q) == {1: 1, 2: 1, 4: 1, 5: 1}


def test_span_near_span_multi_slot(near_engine):
    # prefix qu* in the first slot (dictionary-expanded TermPattern)
    import json as _json
    q = _json.dumps({"query": {"span_near": {"clauses": [
        {"span_multi": {"match": {"prefix": {"text": "qu"}}}},
        {"span_term": {"text": "brown"}},
        {"span_term": {"text": "fox"}}], "slop": 2, "in_order": True}}})
    assert _near(near_engine, q) == {1: 1, 3: 1, 5: 2}


def test_span_near_index_served_parity(near_engine, spark):
    e2 = SearchEngine(spark)
    e2.register(spark.createDataFrame(NEAR_ROWS, "id int, text string"),
                TableSpec("near_docs2", ["id"]))
    e2.build_span_index("near_docs2", "text", materialize=True)
    import json as _json
    qm = _json.dumps({"query": {"span_near": {"clauses": [
        {"span_multi": {"match": {"prefix": {"text": "qu"}}}},
        {"span_term": {"text": "brown"}},
        {"span_term": {"text": "fox"}}], "slop": 2, "in_order": True}}})
    for q in (_q3(0, True), _q3(2, True), _q3(0, False), qm):
        scan = _near(near_engine, q)
        served = _near(e2, q, table="near_docs2")
        assert scan == served, q


def test_span_near_two_clause_form_unchanged(near_engine):
    # the r6 two-clause shape keeps its semantics (and its join-served
    # plan — first/second stay populated on the parsed node)
    from cassandra_es_index_spark.search.ast import SpanNear
    req = parse_request('{"query":{"span_near":{"clauses":['
                        '{"span_term":{"text":"quick"}},'
                        '{"span_term":{"text":"brown"}}],"slop":0}}}')
    assert isinstance(req.node, SpanNear)
    assert (req.node.first, req.node.second) == ("quick", "brown")
    assert req.node.clauses == (("quick",), ("brown",))


@pytest.mark.parametrize("bad, msg", [
    ('{"span_near":{"clauses":[{"span_term":{"text":"x"}}]}}',
     "two or more"),
    ('{"span_near":{"clauses":[{"span_term":{"text":"x"}},'
     '{"span_term":{"other":"y"}}]}}', "share one field"),
    ('{"span_near":{"clauses":[{"span_term":{"text":"x"}},'
     '{"span_near":{"clauses":[{"span_term":{"text":"y"}},'
     '{"span_term":{"text":"z"}}]}}]}}', "not supported here"),
    ('{"span_near":{"clauses":[{"span_term":{"text":"x"}},'
     '{"span_term":{"text":"y"}}],"slop":-1}}', "non-negative"),
    ('{"span_near":{"clauses":[{"span_term":{"text":"x"}},'
     '{"span_term":{"text":"y"}}],"collect_payloads":true}}',
     "unsupported parameters"),
    ('{"span_near":{"clauses":[' +
     ",".join('{"span_term":{"text":"t%d"}}' % i for i in range(9)) +
     ']}}', "at most 8"),
])
def test_span_near_typed_errors(bad, msg):
    with pytest.raises(DslError, match=msg):
        parse_request('{"query":' + bad + "}")


def test_standalone_span_term(sp_engine):
    # r12: a bare span_term query is valid ES — one token's positions,
    # scored Σ tf like a term query, span-family plan
    import json
    q = json.dumps({"query": {"span_term": {"text": "spark"}}})
    out = sp_engine.search("sp_docs", "#options:load-rows=false#" + q)
    term = sp_engine.search(
        "sp_docs", '#options:load-rows=false#'
        '{"query":{"term":{"text":"spark"}}}')
    assert sorted(map(tuple, out.collect())) \
        == sorted(map(tuple, term.collect()))
    # object form with boost; unknown params typed-reject
    qb = json.dumps({"query": {"span_term": {"text": {
        "value": "spark", "boost": 2}}}})
    outb = {r[0]: r["_score"] for r in
            sp_engine.search("sp_docs",
                             "#options:load-rows=false#" + qb).collect()}
    base = {r[0]: r["_score"] for r in out.collect()}
    assert outb == {k: 2 * v for k, v in base.items()}
    from cassandra_es_index_spark.search.es_dsl import DslError
    import pytest as _pt
    with _pt.raises(DslError, match="unsupported parameters"):
        sp_engine.search("sp_docs", json.dumps({"query": {"span_term": {
            "text": {"value": "spark", "zzz": 1}}}}))


# ------------------------------------------------ span_field_masking (r12)

def _masking_engine(spark):
    from cassandra_es_index_spark.catalog import TableSpec
    from cassandra_es_index_spark.search import SearchEngine
    eng = SearchEngine(spark)
    rows = [(1, "quick brown fox", "lazy brown dog"),
            (2, "quick red fox", "quick lazy dog"),
            (3, "slow brown fox", "brown quick dog")]
    df = spark.createDataFrame(rows,
                               "id bigint, title string, body string")
    eng.register(df, TableSpec("mask", ["id"]))
    return eng


def test_span_field_masking_cross_field_positions(spark):
    import json
    eng = _masking_engine(spark)
    # title:quick @0 + masked body:brown — doc1 has body brown @1:
    # tuple (0,1), width 0 ≤ slop 0, in order. doc2 has no body brown;
    # doc3 has no title quick.
    q = json.dumps({"query": {"span_near": {"clauses": [
        {"span_term": {"title": "quick"}},
        {"span_field_masking": {
            "query": {"span_term": {"body": "brown"}},
            "field": "title"}}],
        "slop": 0, "in_order": True}}, "size": 10})
    rows = eng.search("mask", "#options:load-rows=false#" + q).collect()
    assert [(r["id"], r["_score"]) for r in rows] == [(1, 1)]
    # unordered, wider slop: doc3 body "brown quick dog" has brown @0 —
    # masked tuple with title quick? doc3 title has no quick. Still 1.
    q2 = json.dumps({"query": {"span_near": {"clauses": [
        {"span_term": {"title": "fox"}},
        {"span_field_masking": {
            "query": {"span_term": {"body": "dog"}},
            "field": "title"}}],
        "slop": 5, "in_order": False}}, "size": 10})
    rows2 = eng.search("mask", "#options:load-rows=false#" + q2).collect()
    # fox @2 on every title; dog @2 on every body → tuple (2,2) is NOT
    # pairwise-distinct under in_order false → no matches
    assert rows2 == []


def test_span_field_masking_typed_errors(spark):
    import json

    import pytest

    from cassandra_es_index_spark.search import es_dsl
    eng = _masking_engine(spark)

    def run(q):
        eng.search("mask", json.dumps(q))

    with pytest.raises(es_dsl.DslError, match="share one field"):
        run({"query": {"span_near": {"clauses": [
            {"span_term": {"title": "quick"}},
            {"span_term": {"body": "brown"}}], "slop": 0}}})
    with pytest.raises(es_dsl.DslError, match="needs .'query'"):
        run({"query": {"span_near": {"clauses": [
            {"span_term": {"title": "quick"}},
            {"span_field_masking": {"field": "title"}}], "slop": 0}}})
    with pytest.raises(es_dsl.DslError, match="unsupported parameters"):
        run({"query": {"span_near": {"clauses": [
            {"span_term": {"title": "quick"}},
            {"span_field_masking": {
                "query": {"span_term": {"body": "x"}},
                "field": "title", "rewrite": "y"}}], "slop": 0}}})
    with pytest.raises(es_dsl.DslError, match="span_multi"):
        run({"query": {"span_near": {"clauses": [
            {"span_term": {"title": "quick"}},
            {"span_field_masking": {
                "query": {"span_multi": {"match": {
                    "prefix": {"body": "bro"}}}},
                "field": "title"}}], "slop": 0}}})


def test_span_field_masking_takes_scan_plan(spark):
    # the single-field span index can't serve a mixed-field tuple
    # count — a masked span_near must bail to the scan plan even with
    # a built span index
    import json
    eng = _masking_engine(spark)
    eng.build_span_index("mask", "title")
    q = json.dumps({"query": {"span_near": {"clauses": [
        {"span_term": {"title": "quick"}},
        {"span_field_masking": {
            "query": {"span_term": {"body": "brown"}},
            "field": "title"}}],
        "slop": 0, "in_order": True}}, "size": 10})
    hits = eng.search("mask", "#options:load-rows=false#" + q)
    assert [(r["id"], r["_score"]) for r in hits.collect()] == [(1, 1)]
    # same-field span_near still serves from the index (sanity)
    q3 = json.dumps({"query": {"span_near": {"clauses": [
        {"span_term": {"title": "quick"}},
        {"span_term": {"title": "brown"}}],
        "slop": 0, "in_order": True}}, "size": 10})
    assert eng.search(
        "mask", "#options:load-rows=false#" + q3).count() == 1
