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
                      '"fields":["text","title"],'
                      '"type":"most_fields"}}}')
    best = _rows(eng, '{"query":{"multi_match":{"query":"a",'
                      '"fields":["text","title"],'
                      '"type":"best_fields"}}}')
    assert most[2] == 2 and best[2] == 1
    assert most[1] == best[1] == 1


def test_multi_match_default_type_is_best_fields(eng):
    # r11: the default type flipped to ES's best_fields (the r9-r10
    # most_fields default was a documented deviation that silently
    # reordered multi-field top-k for porting users)
    dflt = _rows(eng, '{"query":{"multi_match":{"query":"a",'
                      '"fields":["text","title"]}}}')
    best = _rows(eng, '{"query":{"multi_match":{"query":"a",'
                      '"fields":["text","title"],'
                      '"type":"best_fields"}}}')
    assert dflt == best and dflt[2] == 1


def test_multi_match_cross_fields_token_major(eng):
    # cross_fields (r11): token-major — each token must appear in >=1
    # field under operator=and; score = Σ tokens Σ fields tf
    got = _rows(eng, '{"query":{"multi_match":{"query":"a b",'
                     '"fields":["text","title"],'
                     '"type":"cross_fields","operator":"and"}}}')
    # doc 2: 'a' in text AND title (tf 2), 'b' in title only (tf 1) —
    # field-major operator=and would also match here, but doc 3
    # ('b' text-only, no 'a' anywhere) shows the token-major gate
    assert got == {1: 2, 2: 3, 4: 2, 5: 3}
    got_or = _rows(eng, '{"query":{"multi_match":{"query":"a b",'
                        '"fields":["text","title"],'
                        '"type":"cross_fields"}}}')
    assert got_or == {1: 2, 2: 3, 3: 1, 4: 2, 5: 3}


def test_zero_terms_query(eng):
    # ES zero_terms_query (r11): zero analyzed tokens → MatchNoDocs by
    # default, match_all under 'all' (the stopword-analyzer escape
    # hatch); a non-empty query is unaffected by the parameter
    base = '{"query":{"match":{"text":{"query":"%s"%s}}}}'
    assert _rows(eng, base % ("  ", "")) == {}
    got = _rows(eng, base % ("  ", ',"zero_terms_query":"all"'))
    assert sorted(got) == [1, 2, 3, 4, 5]
    assert _rows(eng, base % ("a", ',"zero_terms_query":"all"')) \
        == _rows(eng, base % ("a", ""))
    phr = ('{"query":{"match_phrase":{"text":{"query":"   ",'
           '"zero_terms_query":"all"}}}}')
    assert sorted(_rows(eng, phr)) == [1, 2, 3, 4, 5]
    mm = ('{"query":{"multi_match":{"query":"  ","fields":'
          '["text","title"],"zero_terms_query":"all"}}}')
    assert sorted(_rows(eng, mm)) == [1, 2, 3, 4, 5]
    assert _rows(eng, mm.replace('"all"', '"none"')) == {}
    with pytest.raises(DslError, match="'none' or 'all'"):
        eng.search("mp", '{"query":{"match":{"text":{"query":"a",'
                         '"zero_terms_query":"maybe"}}}}')


@pytest.mark.parametrize("q, msg", [
    ('{"query":{"match":{"text":{"query":"a b","operator":"and",'
     '"minimum_should_match":2}}}}', "inoperative"),
    ('{"query":{"match":{"text":{"query":"a b","operator":"xor"}}}}',
     "or/and"),
    ('{"query":{"match":{"text":{"query":"a b",'
     '"minimum_should_match":"150%"}}}}', r"\(0, 100\]"),
    ('{"query":{"match":{"text":{"query":"a b",'
     '"minimum_should_match":"2 -1"}}}}', "space-separated"),
    ('{"query":{"match":{"text":{"query":"a b",'
     '"minimum_should_match":"x<90%"}}}}', "bound"),
    ('{"query":{"match":{"text":{"query":"a b",'
     '"minimum_should_match":"3<"}}}}', "'N<value'"),
    ('{"query":{"match":{"text":{"query":"a b",'
     '"minimum_should_match":"two"}}}}', "integer"),
    ('{"query":{"match":{"text":{"query":"a b",'
     '"minimum_should_match":"0%"}}}}', r"\(0, 100\]"),
    ('{"query":{"match":{"text":{"query":"a b","fuzziness":1,'
     '"minimum_should_match":2}}}}', "fuzziness"),
    ('{"query":{"multi_match":{"query":"a","fields":["text"],'
     '"type":"blended"}}}', "most_fields/best_fields/cross_fields"),
    ('{"query":{"multi_match":{"query":"a","fields":["text"],'
     '"type":"cross_fields","fuzziness":1}}}', "fuzziness"),
    ('{"query":{"multi_match":{"query":"a","fields":["text"],'
     '"type":"most_fields","tie_breaker":0.5}}}', "best_fields only"),
    ('{"query":{"multi_match":{"query":"a","fields":["text"],'
     '"type":"best_fields","tie_breaker":1.5}}}', r"\[0, 1\]"),
    ('{"query":{"multi_match":{"query":"a","fields":["text"],'
     '"analyzer":"simple"}}}', "unsupported parameters"),
])
def test_typed_errors(eng, q, msg):
    with pytest.raises(DslError, match=msg):
        eng.search("mp", q).collect()


# ------------------------------------------------ bool minimum_should_match

BOOL_MSM = ('{"query":{"bool":{"should":[{"term":{"text":"a"}},'
            '{"term":{"text":"b"}},{"term":{"text":"c"}}],'
            '"minimum_should_match":2}}}')


def test_bool_msm_bare_should(eng):
    got = _rows(eng, BOOL_MSM)
    # ≥2 of {a, b, c}: doc 1 "a b" (2 clauses, Σtf 2), doc 4 "a b c"
    # (3 clauses, 3), doc 5 "a a b" (2 clauses, Σtf a×2 + b = 3)
    assert sorted(got) == [1, 4, 5]
    assert got[1] == 2 and got[4] == 3 and got[5] == 3


def test_bool_msm_beside_must(eng):
    q = ('{"query":{"bool":{"must":[{"term":{"text":"a"}}],'
         '"should":[{"term":{"text":"b"}},{"term":{"text":"c"}}],'
         '"minimum_should_match":1}}}')
    got = _rows(eng, q)
    # must a AND ≥1 of {b, c}: 1 (a+b+c=3), 4 (a+b+c=3), 5 (a×2+b=3)
    assert sorted(got) == [1, 4, 5]


def test_bool_msm_index_served_parity(eng, spark):
    e2 = SearchEngine(spark)
    docs = spark.createDataFrame(ROWS, "id int, text string, title string")
    e2.register(docs, TableSpec("mp2", ["id"]))
    e2.build_postings_index("mp2", "text", materialize=True)
    scan = _rows(eng, BOOL_MSM)
    served = {r["id"]: r["_score"] for r in e2.search(
        "mp2", "#options:load-rows=false#" + BOOL_MSM).collect()}
    assert scan == served


def test_bool_boost_scales_scores(eng):
    base = _rows(eng, '{"query":{"bool":{"must":'
                      '[{"term":{"text":"a"}}]}}}')
    boosted = _rows(eng, '{"query":{"bool":{"must":'
                         '[{"term":{"text":"a"}}],"boost":3.0}}}')
    assert {k: v * 3 for k, v in base.items()} == boosted


@pytest.mark.parametrize("q, msg", [
    ('{"query":{"bool":{"must":[{"term":{"text":"a"}}],'
     '"minimum_should_match":1}}}', "needs 'should'"),
    ('{"query":{"bool":{"should":[{"term":{"text":"a"}}],'
     '"adjust_pure_negative":true}}}', "unsupported parameters"),
])
def test_bool_typed_errors(eng, q, msg):
    with pytest.raises(DslError, match=msg):
        eng.search("mp", q).collect()


# ------------------------------------------------ leaf object-form params

@pytest.mark.parametrize("q, msg", [
    ('{"query":{"term":{"text":{"value":"a","zzz":1}}}}',
     "unsupported parameters"),
    ('{"query":{"term":{"text":{"value":"a",'
     '"case_insensitive":false}}}}', "case_insensitive=false"),
    # format GRADUATED r14 (see test_range_format_*) — unknown tokens
    # and non-matching bounds still typed-reject
    ('{"query":{"range":{"id":{"gte":1,"format":"QQQQ"}}}}',
     "unsupported date format token"),
    ('{"query":{"range":{"id":{"gte":"2024","format":"yyyy-MM-dd"}}}}',
     "does not match format"),
    ('{"query":{"range":{"id":{"gte":"now/d","format":"yyyy"}}}}',
     "date-math bounds"),
    # time_zone GRADUATED r14 (see test_range_time_zone_*) — but it
    # asserts date bounds, so a non-date string bound typed-rejects
    ('{"query":{"range":{"text":{"gte":"apple",'
     '"time_zone":"+01:00"}}}}', "unparseable date bound"),
    ('{"query":{"range":{"id":{"gte":"now-7d/d",'
     '"time_zone":"+01:00"}}}}', "date-math bounds"),
    ('{"query":{"range":{"id":{"gte":1,"time_zone":"Mars/Olympus"}}}}',
     "unknown time_zone"),
    ('{"query":{"range":{"id":{"gte":1,"relation":"within"}}}}',
     "intersects"),
    ('{"query":{"regexp":{"text":{"value":"a|b",'
     '"flags":"INTERSECTION"}}}}', "Java regex"),
    ('{"query":{"fuzzy":{"text":{"value":"ab",'
     '"transpositions":"yes"}}}}', "must be a boolean"),
    ('{"query":{"fuzzy":{"text":{"value":"ab","prefix_length":-1}}}}',
     "non-negative"),
    ('{"query":{"fuzzy":{"text":{"value":"ab","max_expansions":10}}}}',
     "max_expansions"),
    # fuzzy modifiers on match are inoperative without fuzziness —
    # rejected, not silently dropped
    ('{"query":{"match":{"text":{"query":"a",'
     '"fuzzy_transpositions":true}}}}', "inoperative without"),
    ('{"query":{"match":{"text":{"query":"a","prefix_length":1}}}}',
     "inoperative without"),
    ('{"query":{"match_phrase":{"text":{"query":"a b",'
     '"analyzer":"simple"}}}}', "unsupported parameters"),
    ('{"query":{"match_phrase":{"text":{"query":"a b",'
     '"zero_terms_query":"any"}}}}', "zero_terms_query"),
])
def test_leaf_param_typed_errors(eng, q, msg):
    with pytest.raises(DslError, match=msg):
        eng.search("mp", q).collect()


def test_leaf_accepted_params_still_work(eng):
    # case_insensitive=true, rewrite, and the wildcard alias are
    # accepted (no-ops under the engine's analyzed model)
    assert _rows(eng, '{"query":{"term":{"text":{"value":"A",'
                      '"case_insensitive":true}}}}')
    assert _rows(eng, '{"query":{"wildcard":{"text":{"wildcard":"a*",'
                      '"rewrite":"top_terms_10"}}}}')
    assert _rows(eng, '{"query":{"regexp":{"text":{"value":"a|b",'
                      '"flags":"ALL","max_determinized_states":'
                      '10000}}}}')


@pytest.mark.parametrize("q", [
    '{"query":{"match_all":{}},"sorts":[{"id":"asc"}]}',   # typo'd sort
    '{"query":{"match_all":{}},"profile":true}',
    '{"query":{"match_all":{}},"timeout":"2s"}',
    '{"query":{"match_all":{}},"pit":{"id":"x"}}',         # use search_pit
])
def test_unknown_top_level_sections_typed(eng, q):
    with pytest.raises(DslError, match="unsupported request sections"):
        eng.search("mp", q).collect()


def test_fields_retrieval_maps_to_projection(eng):
    q = ('{"query":{"term":{"text":"a"}},"fields":["title"]}')
    out = eng.search("mp", "#options:load-source=true#" + q)
    cols = out.columns
    assert "title" in cols and "text" not in cols


@pytest.mark.parametrize("q, msg", [
    ('{"query":{"match_all":{}},"fields":[{"field":"title",'
     '"format":"epoch_millis"}]}', "formatting is not supported"),
    ('{"query":{"match_all":{}},"fields":["title"],"_source":["text"]}',
     "one projection surface"),
])
def test_fields_typed_errors(eng, q, msg):
    with pytest.raises(DslError, match=msg):
        eng.search("mp", q).collect()


def test_docvalue_fields_maps_to_projection(eng):
    # r12: the third retrieval idiom — same one-projection mapping
    q = ('{"query":{"term":{"text":"a"}},"docvalue_fields":["title"]}')
    out = eng.search("mp", "#options:load-source=true#" + q)
    assert "title" in out.columns and "text" not in out.columns
    for bad, msg in [
        ('{"query":{"match_all":{}},"docvalue_fields":[{"field":"t",'
         '"format":"epoch_millis"}]}', "formatting is not supported"),
        ('{"query":{"match_all":{}},"docvalue_fields":["title"],'
         '"fields":["title"]}', "one projection surface"),
        ('{"query":{"match_all":{}},"docvalue_fields":[]}',
         "non-empty"),
    ]:
        with pytest.raises(DslError, match=msg):
            eng.search("mp", bad).collect()


# ------------------------------- r10: widened minimum_should_match grammar

def test_msm_integer_string_forms(eng):
    """Plain integer STRINGS — the form real ES queries use most —
    resolve exactly like their int twins (VERDICT r9 'missing' #3)."""
    for msm in ('2', '"2"'):
        got = _rows(eng, '{"query":{"match":{"text":{"query":"a b c",'
                         '"minimum_should_match":' + msm + '}}}}')
        assert sorted(got) == [1, 4, 5]


def test_msm_negative_forms(eng):
    # "-1" over {a,b,c} = 3-1 = 2 matching terms required
    neg = _rows(eng, '{"query":{"match":{"text":{"query":"a b c",'
                     '"minimum_should_match":"-1"}}}}')
    assert sorted(neg) == [1, 4, 5]
    # int -1 behaves identically
    negint = _rows(eng, '{"query":{"match":{"text":{"query":"a b c",'
                        '"minimum_should_match":-1}}}}')
    assert negint == neg
    # "-2" = 3-2 = 1 → plain disjunction
    loose = _rows(eng, '{"query":{"match":{"text":{"query":"a b c",'
                       '"minimum_should_match":"-2"}}}}')
    assert sorted(loose) == [1, 2, 3, 4, 5]


def test_msm_negative_percent(eng):
    # "-34%" over 3 terms: 34% of 3 truncates to 1 unmatched allowed
    # → floor 2 (Solr calculateMinShouldMatch arithmetic)
    got = _rows(eng, '{"query":{"match":{"text":{"query":"a b c",'
                     '"minimum_should_match":"-34%"}}}}')
    assert sorted(got) == [1, 4, 5]


def test_msm_zero_is_plain_disjunction(eng):
    # resolved floor ≤ 0 on a pure disjunction gates at ≥1 (Lucene:
    # a pure-should boolean still needs one matching clause)
    got = _rows(eng, '{"query":{"match":{"text":{"query":"a b",'
                     '"minimum_should_match":0}}}}')
    assert sorted(got) == [1, 2, 3, 4, 5]


def test_bool_msm_negative_beside_must_goes_optional(eng):
    # should={b,c}, msm="-2" resolves to 0 beside a must → shoulds are
    # fully optional (ES): every 'a' doc matches, shoulds only score
    q = ('{"query":{"bool":{"must":[{"term":{"text":"a"}}],'
         '"should":[{"term":{"text":"b"}},{"term":{"text":"c"}}],'
         '"minimum_should_match":"-2"}}}')
    got = _rows(eng, q)
    assert sorted(got) == [1, 2, 4, 5]
    assert got[2] == 1          # a only — no should boost
    assert got[4] == 3          # a + b + c
    # alone, the same resolved-0 floor still gates at ≥1 (Lucene)
    alone = _rows(eng, '{"query":{"bool":{"should":[{"term":{"text":"b"}},'
                       '{"term":{"text":"c"}}],'
                       '"minimum_should_match":"-2"}}}')
    assert sorted(alone) == [1, 3, 4, 5]


def test_bool_msm_integer_string(eng):
    got = _rows(eng, '{"query":{"bool":{"should":[{"term":{"text":"a"}},'
                     '{"term":{"text":"b"}},{"term":{"text":"c"}}],'
                     '"minimum_should_match":"2"}}}')
    assert sorted(got) == [1, 4, 5]


# ------------------------------ msm conditional grammar (r11, Solr spec)

def test_msm_conditional_single():
    from cassandra_es_index_spark.search.es_dsl import _msm_count
    # "3<90%": n <= 3 → all required; n > 3 → 90% (integer trunc)
    assert _msm_count("3<90%", 2, "t") == 2
    assert _msm_count("3<90%", 3, "t") == 3
    assert _msm_count("3<90%", 4, "t") == 3     # trunc(3.6)
    assert _msm_count("3<90%", 10, "t") == 9


def test_msm_conditional_list_hand_cases():
    from cassandra_es_index_spark.search.es_dsl import _msm_count
    # Solr calculateMinShouldMatch control flow: conditions in order;
    # n <= bound stops with the running result, else result = value
    spec = "2<-25% 9<-3"
    assert _msm_count(spec, 2, "t") == 2        # ≤ 2 → all required
    assert _msm_count(spec, 3, "t") == 3        # 3-(3·25)//100 = 3
    assert _msm_count(spec, 8, "t") == 6        # 8-2
    assert _msm_count(spec, 9, "t") == 7        # 9-2; 9 ≤ 9 stops
    assert _msm_count(spec, 10, "t") == 7       # 10-2=8 then 10-3=7
    # spaces around '<' normalize like Lucene's spaceAroundLessThan
    assert _msm_count("2 < -25%  9 < -3", 10, "t") == 7


def test_msm_conditional_end_to_end(eng):
    # n=3 tokens > bound 2 → 67% → 2 required: same set as msm=2
    got = _rows(eng, '{"query":{"match":{"text":{"query":"a b c",'
                     '"minimum_should_match":"2<67%"}}}}')
    assert sorted(got) == [1, 4, 5]
    # n=3 ≤ bound 3 → all three required: only doc 4 carries a, b AND c
    got = _rows(eng, '{"query":{"match":{"text":{"query":"a b c",'
                     '"minimum_should_match":"3<67%"}}}}')
    assert sorted(got) == [4]


# ------------------------- multi_match full type set (r11, ES parity)
# fixture reminder: 1=("a b","x") 2=("a","a b") 3=("b","y")
# 4=("a b c","z") 5=("a a b","w")

def test_multi_match_phrase_type(eng):
    # match_phrase per field under a DisMax: "a b" adjacent in order —
    # text carries it for 1/4/5, title for 2
    got = _rows(eng, '{"query":{"multi_match":{"query":"a b",'
                     '"fields":["text","title"],"type":"phrase"}}}')
    assert got == {1: 1, 2: 1, 4: 1, 5: 1}
    # slop 1 lets "a ? b" through: doc 4 unchanged, none added here
    # (no "a x b" rows) — but the parameter routes (no typed error)
    got = _rows(eng, '{"query":{"multi_match":{"query":"a c",'
                     '"fields":["text"],"type":"phrase","slop":1}}}')
    assert got == {4: 1}                 # "a b c": one gap allowed


def test_multi_match_phrase_prefix_type(eng):
    # last word prefix-expands: "a b" prefix b → docs with a then b*
    got = _rows(eng, '{"query":{"multi_match":{"query":"a b",'
                     '"fields":["text","title"],'
                     '"type":"phrase_prefix"}}}')
    assert got == {1: 1, 2: 1, 4: 1, 5: 1}


def test_multi_match_bool_prefix_type(eng):
    # match_bool_prefix per field, most_fields-like Σ: terms "a" +
    # prefix "b*"; doc 2 scores text(a)=1 + title(a)=1 + title(b)=1
    got = _rows(eng, '{"query":{"multi_match":{"query":"a b",'
                     '"fields":["text","title"],'
                     '"type":"bool_prefix"}}}')
    assert got[2] == 3 and got[5] == 3   # 5: a×2 + b×1 in text
    assert sorted(got) == [1, 2, 3, 4, 5]


def test_multi_match_msm_per_field_covering(eng):
    # msm=2 of (a, b, c) per field: text must carry ≥2 distinct terms
    got = _rows(eng, '{"query":{"multi_match":{"query":"a b c",'
                     '"fields":["text"],'
                     '"minimum_should_match":2}}}')
    assert sorted(got) == [1, 4, 5]
    # cross_fields + msm: ≥2 of the token groups (any field) —
    # doc 3 has b (text) only → out; doc 2 has a (both) + b (title) → in
    got = _rows(eng, '{"query":{"multi_match":{"query":"a b c",'
                     '"fields":["text","title"],'
                     '"type":"cross_fields",'
                     '"minimum_should_match":2}}}')
    assert sorted(got) == [1, 2, 4, 5]


@pytest.mark.parametrize("q, msg", [
    ('{"query":{"multi_match":{"query":"a b","fields":["text"],'
     '"type":"phrase","operator":"and"}}}', "does not apply"),
    ('{"query":{"multi_match":{"query":"a b","fields":["text"],'
     '"type":"phrase_prefix","minimum_should_match":2}}}',
     "does not apply"),
    ('{"query":{"multi_match":{"query":"a b","fields":["text"],'
     '"slop":1}}}', "phrase/"),
    ('{"query":{"multi_match":{"query":"a b","fields":["text"],'
     '"type":"phrase","max_expansions":10}}}', "phrase_prefix only"),
    ('{"query":{"multi_match":{"query":"a b","fields":["text"],'
     '"type":"bool_prefix","minimum_should_match":2}}}',
     "bool_prefix does not"),
    ('{"query":{"multi_match":{"query":"a b","fields":["text"],'
     '"operator":"and","minimum_should_match":2}}}', "inoperative"),
    ('{"query":{"multi_match":{"query":"a b","fields":["text"],'
     '"fuzziness":1,"minimum_should_match":2}}}', "fuzziness"),
])
def test_multi_match_type_typed_errors(eng, q, msg):
    with pytest.raises(DslError, match=msg):
        eng.search("mp", q).collect()


def test_request_surface_param_allowlists(eng):
    """r11: highlight/sort/collapse/rescore/terms_set/missing-agg now
    typed-reject unknown parameters (previously silently dropped);
    terms_set boost EXECUTES."""
    import json
    for q, msg in [
        ({"query": {"match_all": {}},
          "highlight": {"fields": {"text": {"type": "fvh"}}}}, "fvh|unsupported"),
        ({"query": {"match_all": {}},
          "sort": [{"id": {"order": "asc", "unmapped_type": "long"}}]},
         "unmapped_type"),
        ({"query": {"match_all": {}},
          "collapse": {"field": "title",
                       "max_concurrent_group_searches": 4}},
         "unsupported"),
        ({"query": {"match_all": {}},
          "rescore": {"query": {"rescore_query": {"match_all": {}},
                                "zzz": 1}}}, "unsupported"),
        ({"query": {"terms_set": {"text": {
            "terms": ["a"], "minimum_should_match_field": "id",
            "zzz": 1}}}}, "unsupported"),
    ]:
        with pytest.raises(DslError, match=msg):
            eng.search("mp", json.dumps(q))
    # terms_set boost scales the matched-tf score (was dropped pre-r11)
    base = _rows(eng, json.dumps({"query": {"terms_set": {"text": {
        "terms": ["a", "b"], "minimum_should_match_script":
        {"source": "1"}}}}}))
    boosted = _rows(eng, json.dumps({"query": {"terms_set": {"text": {
        "terms": ["a", "b"], "minimum_should_match_script":
        {"source": "1"}, "boost": 3}}}}))
    assert boosted == {k: v * 3 for k, v in base.items()}


def test_ids_exists_boost_executes(eng):
    """r11: ids/exists accepted `boost` but silently dropped it —
    scores stayed 1. They now scale, and unknown params typed-reject."""
    import json
    base = _rows(eng, '{"query":{"exists":{"field":"text"}}}')
    b3 = _rows(eng, '{"query":{"exists":{"field":"text","boost":3}}}')
    assert b3 == {k: v * 3 for k, v in base.items()} and base
    i1 = _rows(eng, '{"query":{"ids":{"values":["1","2"]}}}')
    i3 = _rows(eng, '{"query":{"ids":{"values":["1","2"],"boost":3}}}')
    assert i3 == {k: v * 3 for k, v in i1.items()} and set(i1) == {1, 2}
    for q, msg in [
        ('{"query":{"ids":{"values":["1"],"zzz":1}}}', "unsupported"),
        ('{"query":{"exists":{"field":"text","zzz":1}}}', "unsupported"),
    ]:
        with pytest.raises(DslError, match=msg):
            eng.search("mp", q)


@pytest.mark.parametrize("q", [
    '{"query":{"span_first":{"match":{"span_term":{"text":"a"}},'
    '"end":2,"zzz":1}}}',
    '{"query":{"span_or":{"clauses":[{"span_term":{"text":"a"}}],'
    '"zzz":1}}}',
    '{"query":{"span_not":{"include":{"span_term":{"text":"a"}},'
    '"exclude":{"span_term":{"text":"b"}},"zzz":1}}}',
    '{"query":{"constant_score":{"filter":{"term":{"text":"a"}},'
    '"zzz":1}}}',
    '{"query":{"dis_max":{"queries":[{"term":{"text":"a"}}],"zzz":1}}}',
    '{"query":{"boosting":{"positive":{"term":{"text":"a"}},'
    '"negative":{"term":{"text":"b"}},"zzz":1}}}',
    '{"query":{"pinned":{"ids":["1"],"organic":{"term":{"text":"a"}},'
    '"zzz":1}}}',
])
def test_compound_kind_param_allowlists(eng, q):
    # r11: compound kinds typed-reject unknown keys (previously
    # silently dropped)
    with pytest.raises(DslError, match="unsupported parameters"):
        eng.search("mp", q)


def test_boosting_outer_boost_executes(eng):
    # boosting's own `boost` now scales the combined score (r11)
    import json
    base = _rows(eng, json.dumps({"query": {"boosting": {
        "positive": {"term": {"text": "a"}},
        "negative": {"term": {"text": "c"}},
        "negative_boost": 0.5}}}))
    b2 = _rows(eng, json.dumps({"query": {"boosting": {
        "positive": {"term": {"text": "a"}},
        "negative": {"term": {"text": "c"}},
        "negative_boost": 0.5, "boost": 2}}}))
    # boost applies BEFORE the root long cast (like every Boost node):
    # doc 4's demoted 0.5 truncated to 0 unboosted but 0.5×2 = 1 — the
    # same pre-cast arithmetic ES's float scores would show
    assert base == {1: 1, 2: 1, 4: 0, 5: 2}
    assert b2 == {1: 2, 2: 2, 4: 1, 5: 4}
