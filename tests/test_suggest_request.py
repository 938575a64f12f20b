"""ES request-body ``suggest`` section (round-9) — the
``{"suggest": {name: {...}}}`` surface the reference forwards to ES
verbatim (ref ElasticIndex.java:663-667), routed to the engine's
dictionary-served suggesters.

Contracts under test:
- one unified (suggest, text, option, score, freq) schema across
  term/phrase/completion entries, unioned per named suggester
- term form: per-token options in ONE vocabulary pass; suggest_mode
  missing (default, OOV tokens only) / popular (candidates more
  frequent than the input) / always; ES candidate ordering (distance
  asc, freq desc, token asc); max_edits 1..2 (ES contract)
- completion form: prefix completions, frequency-ranked
- phrase form: whole-phrase correction riding suggest_phrase
- search()/search_aggs() typed-reject a body carrying suggest (no
  silent drop), mirroring the aggs-in-search contract
"""

import pytest

from cassandra_es_index_spark.search.engine import SearchEngine, TableSpec
from cassandra_es_index_spark.search.es_dsl import DslError


@pytest.fixture(scope="module")
def eng(spark):
    e = SearchEngine(spark)
    # vocabulary: spark(x4), sparse(x2), speak(x1), table(x3), tab(x1)
    df = spark.createDataFrame(
        [("a", "spark spark table"), ("b", "spark sparse table"),
         ("c", "spark sparse speak"), ("d", "table tab")],
        "id string, text string")
    e.register(df, TableSpec("sg", ["id"]))
    return e


def _rows(df):
    return [(r["suggest"], r["text"], r["option"], r["score"], r["freq"])
            for r in df.orderBy("suggest", "text", "option").collect()]


def test_term_missing_mode_oov_only(eng):
    out = _rows(eng.suggest_request(
        "sg", '{"suggest":{"fix":{"text":"sparc table",'
              '"term":{"field":"text","size":2}}}}'))
    # "table" is in-dictionary → no options (missing mode);
    # "sparc": spark d=1 freq4, sparse d=2 freq3... candidates ranked
    # distance asc then freq desc then token asc, top 2
    assert [o[:3] for o in out] == [("fix", "sparc", "spark"),
                                    ("fix", "sparc", "sparse")]
    # score = 1 - d/max(len): spark d=1 len5 → 0.8
    assert out[0][3] == pytest.approx(0.8)
    assert out[0][4] == 4  # corpus freq of "spark"


def test_term_always_mode_includes_known_tokens(eng):
    out = _rows(eng.suggest_request(
        "sg", '{"suggest":{"al":{"text":"tab",'
              '"term":{"field":"text","suggest_mode":"always",'
              '"size":1}}}}'))
    # "tab" is known (freq 1); always-mode still offers its neighbor
    assert [o[:3] for o in out] == [("al", "tab", "table")]


def test_term_popular_mode_requires_higher_freq(eng):
    out = _rows(eng.suggest_request(
        "sg", '{"suggest":{"pop":{"text":"sparse",'
              '"term":{"field":"text","suggest_mode":"popular",'
              '"size":5}}}}'))
    # only spark (freq 4 > sparse's 2) qualifies; speak (freq 1) no
    assert [o[:3] for o in out] == [("pop", "sparse", "spark")]


def test_completion_and_phrase_union_one_schema(eng):
    out = _rows(eng.suggest_request(
        "sg", '{"suggest":{'
              '"c":{"prefix":"sp","completion":{"field":"text",'
              '"size":2}},'
              '"p":{"text":"sparc tble","phrase":{"field":"text"}}}}'))
    comp = [o for o in out if o[0] == "c"]
    phr = [o for o in out if o[0] == "p"]
    # frequency-ranked completions of "sp"
    assert [(o[2], o[4]) for o in comp] == [("spark", 4), ("sparse", 2)]
    assert [o[2] for o in phr] == ["spark table"]
    assert phr[0][3] == pytest.approx(1.0 / 3.0)  # 2 corrections
    assert phr[0][4] is None


def test_suggest_typed_errors(eng):
    with pytest.raises(DslError, match="exactly one of"):
        eng.suggest_request(
            "sg", '{"suggest":{"x":{"text":"a","term":{},"phrase":{}}}}')
    with pytest.raises(DslError, match="max_edits"):
        eng.suggest_request(
            "sg", '{"suggest":{"x":{"text":"a",'
                  '"term":{"field":"text","max_edits":3}}}}')
    with pytest.raises(DslError, match="suggest_mode"):
        eng.suggest_request(
            "sg", '{"suggest":{"x":{"text":"a",'
                  '"term":{"field":"text","suggest_mode":"sometimes"}}}}')
    with pytest.raises(DslError, match="needs a 'prefix'"):
        eng.suggest_request(
            "sg", '{"suggest":{"x":{"completion":{"field":"text"}}}}')
    with pytest.raises(DslError, match="non-empty"):
        eng.suggest_request("sg", '{"suggest":{}}')


def test_search_and_aggs_reject_suggest_section(eng):
    body = ('{"query":{"match_all":{}},'
            '"suggest":{"x":{"text":"a","term":{"field":"text"}}}}')
    with pytest.raises(DslError, match="suggest_request"):
        eng.search("sg", body, default_field="text")
    abody = body[:-1] + ',"aggs":{"n":{"value_count":{"field":"id"}}}}'
    with pytest.raises(DslError, match="suggest_request"):
        eng.search_aggs("sg", abody, default_field="text")


def test_suggester_option_allowlists(spark):
    """r11: unknown suggester options typed-reject at both levels —
    previously silently dropped."""
    import pytest as _p

    from cassandra_es_index_spark.search.es_dsl import DslError
    eng = SearchEngine(spark)
    eng.register(spark.createDataFrame([(1, "alpha beta")],
                                       "id int, body string"),
                 TableSpec("sgp", ["id"]))
    for body, msg in [
        ({"suggest": {"s": {"text": "alpa",
                            "term": {"field": "body", "zzz": 1}}}},
         "unsupported options"),
        ({"suggest": {"s": {"text": "alpa", "analyzer": "simple",
                            "term": {"field": "body"}}}},
         "unsupported keys"),
        ({"suggest": {"s": {"text": "alpha beta",
                            "phrase": {"field": "body",
                                       "collate": {}}}}},
         "unsupported options"),
    ]:
        with _p.raises(DslError, match=msg):
            eng.suggest_request("sgp", body)
